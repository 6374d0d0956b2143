"""Probe 9: does a bigger micro-batch (16) beat 8 under sustained load?

Steady-state queue length = arrival rate x service time; with ~24 ms
arrivals and ~45 ms/scan service the queue fills past 8, so a max_batch=16
program could lift MFU further. A/Bs the B=16 program's per-scan device
time against B=8 and the sustained pipelined rate (n=24) for engines with
max_batch 8 vs 16.

VERDICT (measured 2026-08-16, v5e): B=16 at the torso shape does NOT fit —
the program needs 18.28 GB HBM vs the chip's 16 GB (the vmapped tile scan
holds conv batch 256 activations; the B=8 program's conv batch 128 is the
memory-optimal point with forward_batch_cap=64). Halving the chunk cap
would fit B=16 but puts the conv batch back at 128 — same MFU, only upload
amortization gained. max_batch=8 stands.

Usage: python tools/perf_probe9.py
"""

import sys

import numpy as np

sys.path.insert(0, '/root/repo')

import os

# these probes decompose the PLAIN mask wire; the compacted wire
# (round 4, default on) returns (buf, occ) tuples from the raw
# programs and has its own probes (perf_probe19/20)
os.environ.setdefault('TS2D_COMPACT', '0')

from tools.perf_probe import timeit  # noqa: E402


def main():
    import jax
    from bench import build_engine, host_project, make_realistic_volume, \
        pipelined_rate

    print('devices:', jax.devices(), file=sys.stderr)
    vol = make_realistic_volume()
    sp = (1.5, 1.5)
    proj = host_project(vol)
    cropped = np.ascontiguousarray(proj)

    eng8 = build_engine()  # auto_batch=8
    fn8, _ = eng8._batched_program(8, cropped.shape[:2], sp, False)
    x8 = jax.device_put(np.stack([cropped] * 8))
    b8, _ = timeit(fn8, 6, eng8.params, x8)
    fn16, _ = eng8._batched_program(16, cropped.shape[:2], sp, False)
    x16 = jax.device_put(np.stack([cropped] * 16))
    b16, _ = timeit(fn16, 6, eng8.params, x16)
    print(f'program B=8: {b8/8*1e3:6.2f} ms/scan   '
          f'B=16: {b16/16*1e3:6.2f} ms/scan', flush=True)

    r8 = min(pipelined_rate(eng8, vol, sp, n=24, rounds=3))
    print(f'pipelined n=24 max_batch=8 : {r8*1e3:8.2f} ms/scan', flush=True)

    # same engine, bigger batcher cap (the B=16 program is already in the
    # engine's cache from the standalone timing above)
    eng8._batcher.max_batch = 16
    r16 = min(pipelined_rate(eng8, vol, sp, n=24, rounds=3))
    print(f'pipelined n=24 max_batch=16: {r16*1e3:8.2f} ms/scan')
    eng8._batcher.max_batch = 8
    r8b = min(pipelined_rate(eng8, vol, sp, n=24, rounds=3))
    print(f'pipelined n=24 max_batch=8 (repeat): {r8b*1e3:8.2f} ms/scan')


if __name__ == '__main__':
    main()
