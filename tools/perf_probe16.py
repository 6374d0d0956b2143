"""Probe 16 — is the result-download wire a SINGLE-STREAM bound?

probe14 established the pipeline floor through the tunnel is the packed-
mask download: ~1.43 MB/scan at 16-20 MB/s aggregate. The watcher fetches
each batch's output with ONE jax.device_get. If that 16-20 MB/s is an
RPC/stream-latency artifact rather than true link bandwidth, several
concurrent fetch streams over DISTINCT device buffers should aggregate
higher — and the batcher could split its whole-batch fetch into per-scan
slice fetches across a small pool.

Pitfall guarded against (the probe12 mistake): jax arrays cache their
host copy after the first device_get, so EVERY timed fetch below targets
a buffer that has never been fetched — fresh buffers per experiment.

Experiments:
  1  serial device_get of K fresh buffers, one at a time -> baseline MB/s
  2  concurrent device_get of K fresh buffers from T in {2,4,8} threads
  3  one big (K,S) fetch vs K concurrent per-row slice fetches of a
     fresh batched array (the actual batcher pattern if splitting wins)

Usage: python tools/perf_probe16.py
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

SEED = [0]


def main():
    import jax
    import jax.numpy as jnp

    print('devices:', jax.devices(), file=sys.stderr)

    # packed-mask scale: torso program output ~1.43 MB/scan
    S = 1_430_000
    K = 8

    @jax.jit
    def make(seed):
        k = jax.random.PRNGKey(seed)
        return jax.random.randint(k, (S,), 0, 255, jnp.uint8)

    def fresh(n):
        """n device buffers that have NEVER been fetched to host."""
        bufs = []
        for _ in range(n):
            SEED[0] += 1
            b = make(SEED[0])
            b.block_until_ready()
            bufs.append(b)
        return bufs

    @jax.jit
    def make_stack(seed):
        k = jax.random.PRNGKey(seed)
        return jax.random.randint(k, (K, S), 0, 255, jnp.uint8)

    def fresh_stack():
        SEED[0] += 1
        b = make_stack(SEED[0])
        b.block_until_ready()
        return b

    def fetch(b):
        return np.asarray(jax.device_get(b))

    # warm the fetch path once (its own buffer)
    fetch(fresh(1)[0])

    def run(tag, buffers, threads):
        t0 = time.perf_counter()
        if threads == 1:
            for b in buffers:
                fetch(b)
        else:
            with ThreadPoolExecutor(max_workers=threads) as pool:
                list(pool.map(fetch, buffers))
        dt = time.perf_counter() - t0
        mb = sum(b.nbytes for b in buffers) / 1e6
        print(f'{tag:28s} {dt*1e3:8.1f} ms  {mb/dt:7.1f} MB/s')
        return dt

    for rep in range(2):
        print(f'--- rep {rep} (fresh buffers each line) ---')
        run('serial x8', fresh(K), 1)
        run('2 threads x8', fresh(K), 2)
        run('4 threads x8', fresh(K), 4)
        run('8 threads x8', fresh(K), 8)

    for rep in range(2):
        print(f'--- batched rep {rep} (fresh stacks each line) ---')
        big = fresh_stack()
        t0 = time.perf_counter()
        fetch(big)
        dt = time.perf_counter() - t0
        print(f'{"one (K,S) fetch":28s} {dt*1e3:8.1f} ms  '
              f'{big.nbytes/1e6/dt:7.1f} MB/s')
        for thr in (4, 8):
            big = fresh_stack()
            # device-side row slices: new buffers, parent never fetched
            rows = [big[i] for i in range(K)]
            for r in rows:
                r.block_until_ready()
            run(f'K slice fetches, {thr} thr', rows, thr)


if __name__ == '__main__':
    main()
