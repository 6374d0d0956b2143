"""Decompose the torso-scan cost on the real TPU.

Times, in one process (compiles amortized):
  1. a single U-Net forward at the bench architecture, several batch sizes
  2. the G*F lax.map ensemble net as used inside the tile scan
  3. the full fused 2D ensemble program at the torso projection shape
  4. the full fused volume program (projection included)
and prints an implied-MFU estimate per stage (v5e bf16 peak ~197 TFLOP/s).

Usage: python tools/perf_probe.py [--reps 10]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')

import os

# this probe decomposes the PLAIN mask wire; the compacted wire
# (round 4, default on) returns (buf, occ) tuples from the raw
# programs and has its own probe (perf_probe20)
os.environ.setdefault('TS2D_COMPACT', '0')

from probelib import PEAK_BF16, sync, timeit, unet_flops  # noqa: E402,F401


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--reps', type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bench import GROUP_LABELS, PATCH, REALISTIC_SHAPE, build_engine, \
        make_realistic_volume
    from totalsegmentator2d_tpu.models.unet import forward

    print('devices:', jax.devices(), file=sys.stderr)
    eng = build_engine()
    spec = eng.specs[0]
    fl1 = unet_flops(spec.arch, *PATCH)
    print(f'single-forward conv FLOPs at {PATCH}: {fl1/1e9:.1f} G',
          file=sys.stderr)

    # params of group 0, fold 0
    p0 = jax.tree_util.tree_map(lambda a: a[0, 0], eng.params)
    rng = np.random.default_rng(0)

    # 1. plain forward at several batch sizes
    for m in (1, 4, 8, 16, 32):
        x = jax.device_put(rng.standard_normal(
            (m, PATCH[0], PATCH[1], 2)).astype(np.float32))
        f = jax.jit(lambda p, x: forward(p, x, spec.arch,
                                         compute_dtype=jnp.bfloat16))
        t0 = time.perf_counter()
        best, med = timeit(f, args.reps, p0, x)
        print(f'fwd M={m:3d}: best {best*1e3:8.2f} ms  med {med*1e3:8.2f} ms '
              f' MFU {m*fl1/best/PEAK_BF16*100:5.1f}%  (compile+first '
              f'{time.perf_counter()-t0-best*args.reps:.1f}s)')

    # 1b. fp32 for comparison at M=4
    x4 = jax.device_put(rng.standard_normal(
        (4, PATCH[0], PATCH[1], 2)).astype(np.float32))
    p0f = jax.tree_util.tree_map(lambda a: a.astype(jnp.float32), p0)
    f32 = jax.jit(lambda p, x: forward(p, x, spec.arch))
    best, med = timeit(f32, args.reps, p0f, x4)
    print(f'fwd M=4 fp32: best {best*1e3:8.2f} ms  med {med*1e3:8.2f} ms '
          f' MFU(vs bf16 peak) {4*fl1/best/PEAK_BF16*100:5.1f}%')

    # 2. the ensemble net: lax.map over G*F stacked params, M=4
    G, F = eng.n_groups, eng.n_folds

    def net(params, x):
        flat = jax.tree_util.tree_map(
            lambda a: a.reshape((G * F,) + a.shape[2:]), params)
        outs = jax.lax.map(
            lambda p: forward(p, x, spec.arch, compute_dtype=jnp.bfloat16),
            flat)
        return outs

    fnet = jax.jit(net)
    best, med = timeit(fnet, args.reps, eng.params, x4)
    print(f'net G*F={G*F} M=4 (lax.map): best {best*1e3:8.2f} ms '
          f' med {med*1e3:8.2f} ms  MFU {G*F*4*fl1/best/PEAK_BF16*100:5.1f}%')

    # 2b. unrolled python loop over G*F (lets XLA interleave)
    def net_unrolled(params, x):
        outs = []
        for g in range(G):
            for f_ in range(F):
                p = jax.tree_util.tree_map(lambda a: a[g, f_], params)
                outs.append(forward(p, x, spec.arch,
                                    compute_dtype=jnp.bfloat16))
        return jnp.stack(outs)

    fnet_u = jax.jit(net_unrolled)
    best, med = timeit(fnet_u, args.reps, eng.params, x4)
    print(f'net G*F={G*F} M=4 (unrolled): best {best*1e3:8.2f} ms '
          f' med {med*1e3:8.2f} ms  MFU {G*F*4*fl1/best/PEAK_BF16*100:5.1f}%')

    # 2c. tile-batched: M=16 (4 tiles x 4 TTA) through the lax.map net
    x16 = jax.device_put(rng.standard_normal(
        (16, PATCH[0], PATCH[1], 2)).astype(np.float32))
    best, med = timeit(fnet, args.reps, eng.params, x16)
    print(f'net G*F={G*F} M=16 (lax.map): best {best*1e3:8.2f} ms '
          f' med {med*1e3:8.2f} ms  MFU {G*F*16*fl1/best/PEAK_BF16*100:5.1f}%')

    # 3. full 2D program at the torso projection shape
    proj_shape = (REALISTIC_SHAPE[0], REALISTIC_SHAPE[2])
    fn2d, meta = eng._program(proj_shape, (1.5, 1.5))
    n_tiles = meta['n_tiles']
    arr2d = jax.device_put(rng.standard_normal(
        proj_shape + (2,)).astype(np.float32))
    best, med = timeit(fn2d, args.reps, eng.params, arr2d)
    tot = G * F * 4 * n_tiles * fl1
    print(f'2D program {proj_shape} ({n_tiles} tiles): best {best*1e3:8.2f} ms'
          f'  med {med*1e3:8.2f} ms  MFU {tot/best/PEAK_BF16*100:5.1f}%')

    # 4. full volume program, device-resident input (no transfer)
    vol = make_realistic_volume()
    volj = jax.device_put(vol)
    key = ('probe-vol',)
    fnvol, _ = eng._build_volume(vol.shape, (1.5, 1.5), ('max', 'mean'))
    best, med = timeit(fnvol, args.reps, eng.params, volj)
    print(f'volume program (device-resident): best {best*1e3:8.2f} ms '
          f' med {med*1e3:8.2f} ms  MFU {tot/best/PEAK_BF16*100:5.1f}%')

    # 5. end-to-end including transfers, like bench.py blocking path
    t_up = timeit(lambda v: jax.device_put(v), args.reps, vol)[0]
    seg, proj = fnvol(eng.params, jax.device_put(vol))
    jax.block_until_ready((seg, proj))
    t0 = time.perf_counter()
    segs = [np.asarray(jax.device_get(seg)) for _ in range(args.reps)]
    t_down = (time.perf_counter() - t0) / args.reps
    print(f'transfers: upload {t_up*1e3:.1f} ms, seg download '
          f'{t_down*1e3:.1f} ms ({seg.size/1e6:.2f} MB packed)')


if __name__ == '__main__':
    main()
