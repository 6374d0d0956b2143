"""Probe 6: micro-batched serving — transfers and stream shape.

In ONE process (same tunnel conditions): real upload/download bandwidth at
single-scan and batch-of-8 sizes, batched program device time, and the
pipelined serving rate across stream lengths / host thread counts — to
explain why the sustained n=16 stream measured slower than n=6 rounds.

Usage: python tools/perf_probe6.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')

import os

# these probes decompose the PLAIN mask wire; the compacted wire
# (round 4, default on) returns (buf, occ) tuples from the raw
# programs and has its own probes (perf_probe19/20)
os.environ.setdefault('TS2D_COMPACT', '0')

from tools.perf_probe import sync, timeit  # noqa: E402


def main():
    import jax
    from bench import build_engine, host_project, make_realistic_volume, \
        pipelined_rate

    print('devices:', jax.devices(), file=sys.stderr)
    eng = build_engine()
    vol = make_realistic_volume()
    sp = (1.5, 1.5)
    proj = host_project(vol)
    cropped = np.ascontiguousarray(proj)

    # programs
    fn1, _ = eng._program(cropped.shape[:2], sp)
    fn8, _ = eng._batched_program(8, cropped.shape[:2], sp, False)
    x8 = np.stack([cropped] * 8)

    # uploads (fresh arrays each rep to defeat any caching)
    for name, arr in (('1-scan', cropped), ('8-scan', x8)):
        ts = []
        for _ in range(6):
            a = arr.copy()
            t0 = time.perf_counter()
            d = jax.device_put(a)
            sync((d,))
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        print(f'upload {name}: {t*1e3:8.2f} ms ({arr.nbytes/1e6:.2f} MB -> '
              f'{arr.nbytes/t/1e6:.0f} MB/s)')

    # device times
    x8d = jax.device_put(x8)
    x1d = jax.device_put(cropped)
    b1, _ = timeit(fn1, 6, eng.params, x1d)
    b8, _ = timeit(fn8, 6, eng.params, x8d)
    print(f'program B=1: {b1*1e3:8.2f} ms   B=8: {b8*1e3:8.2f} ms '
          f'({b8/8*1e3:.2f} ms/scan)')

    # downloads: force completion first (sync), then time the full fetch
    for name, fn, args in (('1-scan', fn1, (eng.params, x1d)),
                           ('8-scan', fn8, (eng.params, x8d))):
        out = fn(*args)
        sync((out,))
        ts = []
        for _ in range(6):
            t0 = time.perf_counter()
            host = np.asarray(jax.device_get(out))
            ts.append(time.perf_counter() - t0)
            del host
        t = min(ts)
        nb = int(np.prod(out.shape))
        print(f'download {name}: {t*1e3:8.2f} ms ({nb/1e6:.2f} MB -> '
              f'{nb/t/1e6:.0f} MB/s)')

    # stream shapes
    for n, threads in ((6, 1), (6, 4), (16, 1), (16, 4), (32, 4)):
        r = min(pipelined_rate(eng, vol, sp, n=n, rounds=3,
                               threads=threads))
        print(f'pipelined n={n:3d} threads={threads}: {r*1e3:8.2f} ms/scan')


if __name__ == '__main__':
    main()
