"""Probe 18 — what serializes the pipeline through the relay?

The bench wall (~102 ms/scan after split-fetch) is close to the SERIAL
sum upload + program + download per batch, even though the dispatcher
enqueues batches back-to-back and watchers fetch from side threads. Map
the contention matrix with a synthetic heavy program (fast to compile,
~300 ms device time, 11.4 MB uint8 output) instead of the ensemble
(whose compile takes minutes through the tunnel):

  a  heavy program alone                       -> t_prog
  b  fetch of a READY 11.4 MB buffer           -> t_down (1 and 4 streams)
  c  heavy then fetch output (ready)           -> expect t_prog + t_down
  d  heavy#1, heavy#2 dispatched back-to-back, then fetch both outputs
     (pending fetch on #1 while #2 executes)   -> overlap test:
       ~2*t_prog + t_down        = downloads overlap execution
       ~2*(t_prog + t_down)      = full serialization
  e  while a PENDING fetch on heavy#1 blocks in one thread, fetch a
     READY buffer from another                 -> does a pending fetch
                                                  starve the wire?
  f  same, but device_put 3 MB during the pending fetch

Usage: python tools/perf_probe18.py
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

SEED = [100]


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    print('devices:', jax.devices(), file=sys.stderr)

    N = 2048
    ITERS = 600
    OUT = 11_400_000  # ~ the torso b8 packed-mask batch

    @jax.jit
    def heavy(x, seed):
        def body(_, a):
            return jnp.tanh(a @ x)
        a = lax.fori_loop(0, ITERS, body, x)
        k = jax.random.PRNGKey(seed)
        noise = jax.random.randint(k, (OUT,), 0, 255, jnp.uint8)
        # make the big output depend on the loop so it can't be hoisted
        return noise ^ a[0, 0].astype(jnp.uint8)

    @jax.jit
    def ready_buf(seed):
        k = jax.random.PRNGKey(seed)
        return jax.random.randint(k, (1_430_000,), 0, 255, jnp.uint8)

    x = jnp.asarray(np.random.default_rng(0).standard_normal((N, N)),
                    jnp.float32) * 0.01

    def seed():
        SEED[0] += 1
        return SEED[0]

    def fetch(b):
        return np.asarray(jax.device_get(b))

    def split_fetch(b, streams=4, rows=8):
        parts = np.array_split(np.arange(b.shape[0]), rows)
        slices = [b[p[0]:p[-1] + 1] for p in parts]
        with ThreadPoolExecutor(streams) as pool:
            return list(pool.map(fetch, slices))

    sync_scalar = lambda b: float(jax.device_get(b.ravel()[0]))

    # warm compiles (incl. the sum used in experiment f)
    sync_scalar(heavy(x, seed()))
    fetch(ready_buf(seed()))
    sync_scalar(jnp.sum(jax.device_put(np.zeros(750_000, np.float32))))

    def t(f):
        t0 = time.perf_counter()
        f()
        return time.perf_counter() - t0

    for rep in range(2):
        print(f'--- rep {rep} ---')
        # a: program alone (sync via tiny dependent scalar)
        out = [None]
        dt = t(lambda: sync_scalar(heavy(x, seed())))
        print(f'a  heavy alone                {dt*1e3:8.1f} ms')
        t_prog = dt

        # b: ready-buffer fetch, 1 stream and split
        b1 = heavy(x, seed()); sync_scalar(b1)  # computed, never fetched
        dt = t(lambda: fetch(b1))
        print(f'b  ready 11.4MB, 1 stream     {dt*1e3:8.1f} ms '
              f'({OUT/1e6/dt:5.1f} MB/s)')
        b2 = heavy(x, seed()); sync_scalar(b2)
        dt = t(lambda: split_fetch(b2))
        print(f'b  ready 11.4MB, split 4x8    {dt*1e3:8.1f} ms '
              f'({OUT/1e6/dt:5.1f} MB/s)')

        # c: heavy then fetch (pending fetch right after dispatch)
        def c():
            o = heavy(x, seed())
            split_fetch(o)
        dt = t(c)
        print(f'c  heavy + pending split      {dt*1e3:8.1f} ms '
              f'(prog+down serial would be ~{(t_prog)*1e3:.0f}+down)')

        # d: two heavies back-to-back, fetch both
        def d():
            o1 = heavy(x, seed())
            o2 = heavy(x, seed())
            split_fetch(o1)
            split_fetch(o2)
        dt = t(d)
        print(f'd  2x heavy + both fetches    {dt*1e3:8.1f} ms '
              f'(overlap ~{2*t_prog*1e3:.0f}+1down; serial ~2x(prog+down))')

        # e: ready fetch while a pending fetch blocks
        o = heavy(x, seed())
        rb = ready_buf(seed()); sync_scalar(rb)
        res = {}
        def pending():
            res['pending'] = t(lambda: split_fetch(o))
        th = None
        import threading
        th = threading.Thread(target=pending)
        th.start()
        time.sleep(0.05)  # pending fetch is now blocked on execution
        dt = t(lambda: fetch(rb))
        th.join()
        print(f'e  ready fetch DURING pending {dt*1e3:8.1f} ms '
              f'(pending took {res["pending"]*1e3:.0f})')

        # f: device_put during a pending fetch
        o = heavy(x, seed())
        host = np.random.default_rng(1).standard_normal(750_000).astype(
            np.float32)  # 3 MB
        def pending2():
            res['pending2'] = t(lambda: split_fetch(o))
        th = threading.Thread(target=pending2)
        th.start()
        time.sleep(0.05)
        dt = t(lambda: sync_scalar(jnp.sum(jax.device_put(host))))
        th.join()
        print(f'f  3MB put+sync DURING pending{dt*1e3:8.1f} ms '
              f'(pending took {res["pending2"]*1e3:.0f})')


if __name__ == '__main__':
    main()
