"""Probe 5: where does the 0.24 s/scan pipelined torso rate go?

Decomposes the SERVING path (bench.py pipelined_rate): host projection,
upload, fused 2D program device time, packed-seg download, and the
end-to-end pipelined singles loop — then measures a micro-batched variant
(one vmapped program over B scans) to quantify the cross-scan batching win
before building it into the engine/server.

Usage: python tools/perf_probe5.py [--reps 8] [--batch 6]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')

import os

# these probes decompose the PLAIN mask wire; the compacted wire
# (round 4, default on) returns (buf, occ) tuples from the raw
# programs and has its own probes (perf_probe19/20)
os.environ.setdefault('TS2D_COMPACT', '0')

from tools.perf_probe import sync, timeit, unet_flops  # noqa: E402

PEAK_BF16 = 197e12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--reps', type=int, default=8)
    ap.add_argument('--batch', type=int, default=6)
    args = ap.parse_args()

    import jax
    from bench import (REALISTIC_SHAPE, build_engine, host_project,
                       make_realistic_volume)

    print('devices:', jax.devices(), file=sys.stderr)
    eng = build_engine()
    vol = make_realistic_volume()
    sp = (1.5, 1.5)

    # 1. host projection
    ts = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        proj = host_project(vol)
        ts.append(time.perf_counter() - t0)
    t_proj = min(ts)
    print(f'host projection: {t_proj*1e3:8.2f} ms  ({proj.nbytes/1e6:.2f} MB out)')

    # 2. crop + program lookup (host)
    from totalsegmentator2d_tpu.inference.engine import _nonzero_bbox
    (y0, y1), (x0, x1) = _nonzero_bbox(proj)
    cropped = np.ascontiguousarray(proj[y0:y1, x0:x1])
    fn2d, meta = eng._program(cropped.shape[:2], sp)
    print(f'cropped projection: {cropped.shape} ({cropped.nbytes/1e6:.2f} MB), '
          f'{meta["n_tiles"]} tiles x {meta["n_mirror"]} mirrors')

    # 3. upload
    t_up = timeit(lambda a: jax.device_put(a), args.reps, cropped)[0]
    print(f'upload: {t_up*1e3:8.2f} ms ({cropped.nbytes/1e6:.2f} MB -> '
          f'{cropped.nbytes/t_up/1e6:.0f} MB/s)')

    # 4. device program (input resident)
    xd = jax.device_put(cropped)
    best, med = timeit(fn2d, args.reps, eng.params, xd)
    G, F = eng.n_groups, eng.n_folds
    fl1 = unet_flops(eng.specs[0].arch, *eng.spec.preprocess.patch_size)
    tot = G * F * meta['n_mirror'] * meta['n_tiles'] * fl1
    print(f'2D program: best {best*1e3:8.2f} ms  med {med*1e3:8.2f} ms '
          f' MFU {tot/best/PEAK_BF16*100:5.1f}%')

    # 5. download of the packed seg
    out = fn2d(eng.params, xd)
    sync(out)
    ts = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        seg = np.asarray(jax.device_get(out))
        ts.append(time.perf_counter() - t0)
    t_down = min(ts)
    print(f'download: {t_down*1e3:8.2f} ms ({seg.nbytes/1e6:.2f} MB packed -> '
          f'{seg.nbytes/t_down/1e6:.0f} MB/s)')

    # 6. host unpack
    from totalsegmentator2d_tpu.inference.ensemble_engine import unpack_bits
    ts = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        unpack_bits(seg, eng.total_labels)
        ts.append(time.perf_counter() - t0)
    print(f'host unpack: {min(ts)*1e3:8.2f} ms')

    # 7. pipelined singles (the bench loop)
    from bench import pipelined_rate
    rate = min(pipelined_rate(eng, vol, sp, n=args.batch, rounds=3))
    print(f'pipelined singles (n={args.batch}): {rate*1e3:8.2f} ms/scan')

    # 8. micro-batched: ONE vmapped program over B identical-shape scans
    B = args.batch
    import jax.numpy as jnp

    def batched(params, xb):
        return jax.vmap(lambda a: fn2d.__wrapped__(params, a))(xb)

    fb = jax.jit(batched)
    xb = jax.device_put(np.stack([cropped] * B))
    best_b, med_b = timeit(fb, args.reps, eng.params, xb)
    print(f'batched program B={B}: best {best_b*1e3:8.2f} ms '
          f'({best_b/B*1e3:.2f} ms/scan)  med {med_b*1e3:8.2f} ms '
          f' MFU {B*tot/best_b/PEAK_BF16*100:5.1f}%')

    # 9. micro-batched end-to-end (projection still serial on host)
    outb = fb(eng.params, xb)
    sync(outb)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        projs = [host_project(vol) for _ in range(B)]
        xbh = np.stack([np.ascontiguousarray(p[y0:y1, x0:x1]) for p in projs])
        segb = np.asarray(jax.device_get(fb(eng.params, jax.device_put(xbh))))
        unpack_bits(segb, eng.total_labels)
        ts.append((time.perf_counter() - t0) / B)
    print(f'batched end-to-end: {min(ts)*1e3:8.2f} ms/scan')


if __name__ == '__main__':
    main()
