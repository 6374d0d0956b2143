"""Probe 7: linger policy A/B in one process (same tunnel conditions).

Usage: python tools/perf_probe7.py
"""

import sys

import numpy as np  # noqa: F401

sys.path.insert(0, '/root/repo')

import os

# these probes decompose the PLAIN mask wire; the compacted wire
# (round 4, default on) returns (buf, occ) tuples from the raw
# programs and has its own probes (perf_probe19/20)
os.environ.setdefault('TS2D_COMPACT', '0')


def main():
    import jax
    from bench import build_engine, make_realistic_volume, pipelined_rate

    print('devices:', jax.devices(), file=sys.stderr)
    eng = build_engine()
    vol = make_realistic_volume()
    sp = (1.5, 1.5)

    # compile both program shapes first (B=1 and B=8)
    from bench import predict_scan
    predict_scan(eng, vol, sp)
    pipelined_rate(eng, vol, sp, n=8, rounds=1, linger_ms=200.0)

    for linger in (0.0, 40.0, 80.0, 150.0):
        r = min(pipelined_rate(eng, vol, sp, n=16, rounds=3,
                               linger_ms=linger))
        print(f'pipelined n=16 linger={linger:5.0f} ms: {r*1e3:8.2f} ms/scan')
    # interleave a repeat of the first setting to expose tunnel drift
    r = min(pipelined_rate(eng, vol, sp, n=16, rounds=3, linger_ms=0.0))
    print(f'pipelined n=16 linger=    0 ms (repeat): {r*1e3:8.2f} ms/scan')


if __name__ == '__main__':
    main()
