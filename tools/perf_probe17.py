"""Probe 17 — do UPLOAD streams parallelize like download streams do?

probe16 showed the tunnel's device_get moves ~16 MB/s per stream but
~38 MB/s across 2+ concurrent streams, and the batcher now split-fetches
batched masks. Uploads (device_put of the stacked batch input) measured
19-41 MB/s in probe12; if parallel puts aggregate the same way, the
dispatcher could put per-scan rows concurrently and jnp.stack on device.

Timing subtlety: device_put is async — to time the transfer, sync on a
scalar reduction of the uploaded array (tools/perf_probe.sync pattern).
Fresh host buffers each line (no transfer cache to worry about on the
upload side, but stay symmetric with probe16's discipline).

Usage: python tools/perf_probe17.py
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

from tools.perf_probe import sync  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    print('devices:', jax.devices(), file=sys.stderr)
    rng = np.random.default_rng(0)

    # torso upload scale: ~0.78 MB/scan f32 (int16 wire halves it)
    S = 196_000  # f32 words -> 0.784 MB
    K = 8

    reduce1 = jax.jit(lambda x: jnp.sum(x))
    reduceK = jax.jit(lambda xs: jnp.sum(jnp.stack(xs)))

    def fresh_host(n):
        return [rng.standard_normal(S, dtype=np.float32) for _ in range(n)]

    # warm compiles
    sync(reduce1(jax.device_put(np.zeros((K, S), np.float32))))
    sync(reduceK([jax.device_put(np.zeros(S, np.float32))
                  for _ in range(K)]))

    def run_big(tag):
        host = np.stack(fresh_host(K))
        t0 = time.perf_counter()
        d = jax.device_put(host)
        sync(reduce1(d))
        dt = time.perf_counter() - t0
        print(f'{tag:28s} {dt*1e3:8.1f} ms  {host.nbytes/1e6/dt:7.1f} MB/s')

    def run_rows(tag, threads):
        host = fresh_host(K)
        t0 = time.perf_counter()
        if threads == 1:
            rows = [jax.device_put(h) for h in host]
        else:
            with ThreadPoolExecutor(max_workers=threads) as pool:
                rows = list(pool.map(jax.device_put, host))
        sync(reduceK(rows))
        dt = time.perf_counter() - t0
        mb = sum(h.nbytes for h in host) / 1e6
        print(f'{tag:28s} {dt*1e3:8.1f} ms  {mb/dt:7.1f} MB/s')

    for rep in range(3):
        print(f'--- rep {rep} ---')
        run_big('one (K,S) device_put')
        run_rows('K row puts, serial', 1)
        run_rows('K row puts, 2 thr', 2)
        run_rows('K row puts, 4 thr', 4)
        run_rows('K row puts, 8 thr', 8)


if __name__ == '__main__':
    main()
