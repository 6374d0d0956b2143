"""Probe 14 — what does the pipelined WALL actually consist of?

Probe13's arrival-aware batching forms good batches ([8,8,6] + solos) yet
the wall stays ~105 ms/scan where the isolated device floor says ~55
(3x345 b8 + 3x97 solo = 1326 ms for 24 scans). Three suspects:

  A  programs run slower back-to-back than isolated (queue overhead)
  B  downloads serialize with execution after all (the 11.8 MB/batch
     result stream contends with the next program)
  C  device_get of an EARLY program's output is gated on the whole
     queue draining (watcher signal wrong, but wall unaffected)

Experiments (all with device-resident inputs, so no upload term):
  1  dispatch [b8,solo,b8,solo,b8,solo] back-to-back, sync a scalar on
     the LAST output only                     -> pure queue execution time
  2  same, then device_get ALL outputs        -> + download total
  3  same, but device_get the FIRST b8 output immediately after
     dispatching everything; record when it returns vs experiment 1's
     total                                    -> get-gating check
  4  experiment 1 with the watcher-style br.get running concurrently
     per output (the new pipeline's actual pattern)

Usage: python tools/perf_probe14.py
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
    from bench import build_engine, host_project, make_realistic_volume
    from totalsegmentator2d_tpu.inference.ensemble_engine import (
        _wire_pack, wire_detect)

    print('devices:', jax.devices(), file=sys.stderr)
    eng = build_engine()
    vol = make_realistic_volume()
    sp = (1.5, 1.5)
    proj = np.ascontiguousarray(host_project(vol))
    wire = wire_detect(proj)

    fn1, _ = eng._program(proj.shape[:2], sp, wire)
    fn8, _ = eng._batched_program(8, proj.shape[:2], sp, False, wire)
    x1 = jax.device_put(_wire_pack(proj, wire))
    xs = _wire_pack(np.stack([proj] * 8), wire)
    x8 = jax.device_put(xs)
    params = eng.params

    # warm + isolated floors
    sync((fn1(params, x1),))
    sync((fn8(params, x8),))
    for name, fn, x, div in (('solo', fn1, x1, 1), ('b8', fn8, x8, 8)):
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            sync((fn(params, x),))
            ts.append(time.perf_counter() - t0)
        print(f'isolated {name}: {min(ts)*1e3:7.1f} ms '
              f'({min(ts)/div*1e3:.1f} ms/scan)')

    def dispatch_all():
        outs = []
        for i in range(3):
            outs.append(fn8(params, x8))
            outs.append(fn1(params, x1))
        return outs

    # 1: queue execution only (scalar sync on last)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = dispatch_all()
        sync((outs[-1],))
        ts.append(time.perf_counter() - t0)
        del outs
    t1 = min(ts)
    print(f'\n1 queue exec (sync last):        {t1*1e3:7.1f} ms '
          f'({t1/27*1e3:.1f} ms/scan eq)')

    # 2: + download everything afterwards
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = dispatch_all()
        sync((outs[-1],))
        t_mid = time.perf_counter()
        for o in outs:
            np.asarray(jax.device_get(o))
        ts.append((time.perf_counter() - t0, time.perf_counter() - t_mid))
        del outs
    t2, t2dl = min(ts)
    print(f'2 queue exec + download all:     {t2*1e3:7.1f} ms '
          f'(download tail {t2dl*1e3:.0f} ms)')

    # 3: get FIRST output immediately after dispatching all
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = dispatch_all()
        np.asarray(jax.device_get(outs[0]))
        t_first = time.perf_counter() - t0
        sync((outs[-1],))
        ts.append((t_first, time.perf_counter() - t0))
        del outs
    t3f, t3 = min(ts)
    print(f'3 get(first b8) after dispatch:  first returns {t3f*1e3:7.1f} ms'
          f', full queue {t3*1e3:.0f} ms '
          f'-> {"GATED on queue" if t3f > 0.8*t1 else "returns early"}')

    # 4: watcher-style concurrent gets (the pipeline pattern)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = dispatch_all()
        with ThreadPoolExecutor(6) as pool:
            list(pool.map(lambda o: np.asarray(jax.device_get(o)), outs))
        ts.append(time.perf_counter() - t0)
        del outs
    t4 = min(ts)
    print(f'4 concurrent gets (watcher-ish): {t4*1e3:7.1f} ms '
          f'({t4/27*1e3:.1f} ms/scan eq)')


if __name__ == '__main__':
    main()
