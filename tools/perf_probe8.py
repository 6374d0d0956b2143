"""Probe 8: decoder concat-split A/B inside the real batched program.

conv(concat(h, skip), W) == conv(h, W[:c]) + conv(skip, W[c:]) — the split
form skips materializing the concatenated buffer. A/Bs the actual B=8
micro-batched torso program with the variant on/off and reports both time
and packed-mask agreement. (A bare-net probe at the program's effective
conv batch of 128 OOMs on the padded f32 logits it would have to return;
the program consumes them fused, so only the in-program A/B is meaningful.)

VERDICT (measured 2026-08-16, v5e): REJECTED — 343.3 vs 340.0 ms at B=8
(noise; XLA already schedules the concat well) and the bf16 add
reassociation flips ~1.3% of borderline mask pixels. The variant was
removed from models/unet.py; this probe is kept as the record (the
TS2D_SPLITCAT branch it exercised no longer exists, so the A/B now
measures the same program twice).

Also: net5 M=16 measured 102 ms ~= the 97 ms B=1 program — the conv path is
the entire program cost; tile accumulation overhead is negligible.

Usage: python tools/perf_probe8.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, '/root/repo')

# these probes decompose the PLAIN mask wire; the compacted wire
# (round 4, default on) returns (buf, occ) tuples from the raw
# programs and has its own probes (perf_probe19/20)
os.environ.setdefault('TS2D_COMPACT', '0')

from tools.perf_probe import timeit  # noqa: E402


def main():
    import jax
    from bench import build_engine, host_project, make_realistic_volume

    print('devices:', jax.devices(), file=sys.stderr)
    vol = make_realistic_volume()
    proj = host_project(vol)
    cropped = np.ascontiguousarray(proj)
    sp = (1.5, 1.5)

    results = {}
    x8 = jax.device_put(np.stack([cropped] * 8))
    for flag in ('0', '1'):
        os.environ['TS2D_SPLITCAT'] = flag
        eng = build_engine()
        fn8, _ = eng._batched_program(8, cropped.shape[:2], sp, False)
        b8, m8 = timeit(fn8, 6, eng.params, x8)
        out = np.asarray(jax.device_get(fn8(eng.params, x8)))
        results[flag] = out
        print(f'splitcat={flag}: B=8 {b8*1e3:8.2f} ms '
              f'({b8/8*1e3:.2f} ms/scan, med {m8/8*1e3:.2f})', flush=True)
    del os.environ['TS2D_SPLITCAT']
    agree = (results['0'] == results['1']).mean()
    print(f'packed-mask agreement split vs concat: {agree:.6f}')


if __name__ == '__main__':
    main()
