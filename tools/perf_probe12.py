"""Probe 12 — is the pipelined serving rate TUNNEL-WIRE-bound?

The batch-8 device program runs at ~43 ms/scan (probe6) yet the sustained
pipelined rate measures 104-163 ms/scan. Wire model: each scan moves
~0.78 MB up (cropped 2ch float32 projection) + ~1.47 MB down (bit-packed
117-ch masks) = 2.25 MB; at the tunnel's measured 14-40 MB/s that alone is
56-160 ms/scan — possibly THE bound, not the device.

Measures, in one process:
  1. unidirectional upload / download bandwidth at batch sizes 1 and 8,
     plus CONCURRENT bidirectional transfers (full- vs half-duplex tunnel)
  2. pipelined baseline (bench's pipelined_rate)
  3. pipelined with a scalar-only drain (no mask download) — isolates the
     download share without recompiling anything
  4. pipelined with pre-projected inputs (no host projection) — isolates
     the host share

Usage: python tools/perf_probe12.py
"""

import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, '/root/repo')

import os

# these probes decompose the PLAIN mask wire; the compacted wire
# (round 4, default on) returns (buf, occ) tuples from the raw
# programs and has its own probes (perf_probe19/20)
os.environ.setdefault('TS2D_COMPACT', '0')

from tools.perf_probe import sync, timeit  # noqa: E402


def pipelined_scalar_drain(eng, vol, sp, n=24, rounds=3):
    """bench.pipelined_rate, but the drain syncs ONE scalar per batch
    result instead of downloading the packed masks — upload + dispatch +
    device time stay identical, the bulk download is removed."""
    from bench import host_project
    rates = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        handles = [eng.predict_array_async(host_project(vol), sp)
                   for _ in range(n)]
        seen = set()
        for kind, fut in handles:
            assert kind == 'future'
            batch_result, idx, bbox, full = fut.result()
            if id(batch_result) not in seen:
                seen.add(id(batch_result))
                sync((batch_result._dev,))
        rates.append((time.perf_counter() - t0) / n)
    return float(np.min(rates))


def pipelined_preprojected(eng, proj, sp, n=24, rounds=3):
    """bench.pipelined_rate with the host projection hoisted out."""
    rates = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        handles = [eng.predict_array_async(proj, sp) for _ in range(n)]
        outs = [eng.finish_array(h) for h in handles]
        rates.append((time.perf_counter() - t0) / n)
        del outs
    return float(np.min(rates))


def main():
    import jax
    from bench import (build_engine, host_project, make_realistic_volume,
                       pipelined_rate)

    print('devices:', jax.devices(), file=sys.stderr)
    eng = build_engine()
    vol = make_realistic_volume()
    sp = (1.5, 1.5)
    proj = host_project(vol)
    cropped = np.ascontiguousarray(proj)

    # compile + warm both programs through the serving path
    eng.predict_array(proj, sp)

    fn8, _ = eng._batched_program(8, cropped.shape[:2], sp, False)
    x8 = np.stack([cropped] * 8)

    # 1a. unidirectional transfers
    for name, arr in (('1-scan', cropped), ('8-scan', x8)):
        ts = []
        for _ in range(5):
            a = arr.copy()
            t0 = time.perf_counter()
            sync((jax.device_put(a),))
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        print(f'upload   {name}: {t*1e3:8.2f} ms ({arr.nbytes/1e6:.2f} MB '
              f'-> {arr.nbytes/t/1e6:.0f} MB/s)')
    out8 = fn8(eng.params, jax.device_put(x8))
    sync((out8,))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        host = np.asarray(jax.device_get(out8))
        ts.append(time.perf_counter() - t0)
        del host
    t = min(ts)
    nb = int(np.prod(out8.shape))
    print(f'download 8-scan packed: {t*1e3:8.2f} ms ({nb/1e6:.2f} MB -> '
          f'{nb/t/1e6:.0f} MB/s)')

    # 1b. concurrent bidirectional: upload 8-stack while downloading the
    # finished batch output — a half-duplex (or serialized) tunnel shows
    # combined time ~= sum of the two
    def up():
        a = x8.copy()
        t0 = time.perf_counter()
        sync((jax.device_put(a),))
        return time.perf_counter() - t0

    def down():
        t0 = time.perf_counter()
        np.asarray(jax.device_get(out8))
        return time.perf_counter() - t0

    ts_both = []
    for _ in range(5):
        t0 = time.perf_counter()
        with ThreadPoolExecutor(2) as pool:
            fu, fd = pool.submit(up), pool.submit(down)
            tu, td = fu.result(), fd.result()
        ts_both.append((time.perf_counter() - t0, tu, td))
    tb, tu, td = min(ts_both)
    print(f'concurrent up+down: {tb*1e3:8.2f} ms (up {tu*1e3:.0f}, down '
          f'{td*1e3:.0f}; serial sum would be ~{(tu+td)*1e3:.0f})')

    # 2-4. pipelined variants
    base = min(pipelined_rate(eng, vol, sp))
    print(f'pipelined baseline:        {base*1e3:8.2f} ms/scan')
    nodl = pipelined_scalar_drain(eng, vol, sp)
    print(f'pipelined scalar drain:    {nodl*1e3:8.2f} ms/scan '
          f'(download share ~{(base-nodl)*1e3:.0f} ms/scan)')
    nohp = pipelined_preprojected(eng, proj, sp)
    print(f'pipelined pre-projected:   {nohp*1e3:8.2f} ms/scan '
          f'(host-projection share ~{(base-nohp)*1e3:.0f} ms/scan)')

    # device floor for reference
    x8d = jax.device_put(x8)
    b8, _ = timeit(fn8, 5, eng.params, x8d)
    print(f'device B=8 program:        {b8/8*1e3:8.2f} ms/scan')


if __name__ == '__main__':
    main()
