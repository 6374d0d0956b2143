"""Probe 13 — WHERE does the pipelined rate lose to the device floor?

Probe12 bounded the gap to "upload bandwidth + dispatch serialization".
This probe instruments the dispatcher itself: for every batch it records
occupancy B, host stack/pack time, device_put time, program-dispatch
return time, and (from a watcher thread) program completion time. That
separates three hypotheses:

  H1  under-filled batches: padded partial batches cost the FULL batch-8
      program but serve fewer scans
  H2  uploads serialize with device compute (the tunnel runs RPCs
      back-to-back instead of overlapping transfer with execution)
  H3  host-side stack/_wire_pack time matters

Usage: python tools/perf_probe13.py
"""

import sys
import threading
import time

import numpy as np

sys.path.insert(0, '/root/repo')

import os

# these probes decompose the PLAIN mask wire; the compacted wire
# (round 4, default on) returns (buf, occ) tuples from the raw
# programs and has its own probes (perf_probe19/20)
os.environ.setdefault('TS2D_COMPACT', '0')

EVENTS = []
T0 = [0.0]


def instrument(batcher):
    """Wrap DynamicBatcher._dispatch with a timed replica of its body."""
    import jax
    from totalsegmentator2d_tpu.inference.ensemble_engine import _wire_pack

    engine = batcher.engine
    orig = batcher._dispatch

    def timed_dispatch(key, take):
        t_in = time.perf_counter() - T0[0]
        _, spacing, has_mask, wire = key
        B = len(take)
        if B == 1:
            # delegate, but time it as a whole
            t0 = time.perf_counter()
            orig(key, take)
            EVENTS.append(dict(kind='solo', t=t_in, B=1,
                               total=time.perf_counter() - t0))
            return
        take = [it for it in take if it[-1].set_running_or_notify_cancel()]
        if not take:
            return
        B = len(take)
        from totalsegmentator2d_tpu.inference.batching import _BatchResult
        fnb, _ = engine._batched_program(batcher.max_batch,
                                      take[0][0].shape[:2], spacing,
                                      has_mask, wire)
        t0 = time.perf_counter()
        pad = batcher.max_batch - B
        stacked = np.stack([it[0] for it in take] + [take[-1][0]] * pad)
        xb = _wire_pack(stacked, wire) if wire is not None else stacked
        t1 = time.perf_counter()
        dev = jax.device_put(xb)
        t2 = time.perf_counter()
        out = fnb(engine.params, dev)
        t3 = time.perf_counter()
        if B < batcher.max_batch:
            out = out[:B]
        br = _BatchResult(out)
        batcher._track(br)
        for i, (_, _, bbox, full, fut) in enumerate(take):
            fut.set_result((br, i, bbox, full))
        ev = dict(kind='batch', t=t_in, B=B, stack=t1 - t0, put=t2 - t1,
                  disp=t3 - t2, done=None)

        def watch(o=out, e=ev):
            jax.block_until_ready(o)
            e['done'] = time.perf_counter() - T0[0]

        threading.Thread(target=watch, daemon=True).start()
        EVENTS.append(ev)

    batcher._dispatch = timed_dispatch


def main():
    import jax
    from bench import build_engine, host_project, make_realistic_volume

    print('devices:', jax.devices(), file=sys.stderr)
    eng = build_engine()
    vol = make_realistic_volume()
    sp = (1.5, 1.5)

    # warm solo + batched programs on the production (int16 MIP) wire
    eng.predict_array(host_project(vol), sp)
    from totalsegmentator2d_tpu.inference.ensemble_engine import wire_detect
    proj = host_project(vol)
    wire = wire_detect(np.ascontiguousarray(proj))
    eng.warmup(proj.shape[:2], sp, wire=wire)
    print('warm; wire =', wire, file=sys.stderr)

    instrument(eng._batcher)

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    rounds = 3
    for r in range(rounds):
        EVENTS.clear()
        T0[0] = time.perf_counter()
        handles = [eng.predict_array_async(host_project(vol), sp)
                   for _ in range(n)]
        outs = [eng.finish_array(h) for h in handles]
        wall = time.perf_counter() - T0[0]
        del outs
        time.sleep(0.3)  # let watcher threads record 'done'
        print(f'\n== round {r}: {wall / n * 1e3:.1f} ms/scan '
              f'({len(EVENTS)} dispatches for {n} scans)')
        print(f'{"t_in":>7} {"kind":>5} {"B":>2} {"stack":>6} {"put":>6} '
              f'{"disp":>6} {"done":>7} {"gap":>6}')
        prev_done = 0.0
        for e in EVENTS:
            if e['kind'] == 'solo':
                print(f'{e["t"]*1e3:7.1f} {e["kind"]:>5} {e["B"]:2d} '
                      f'{"":>6} {"":>6} {e["total"]*1e3:6.1f}')
                continue
            done = e['done']
            gap = (e['t'] - prev_done) if prev_done else 0.0
            print(f'{e["t"]*1e3:7.1f} {e["kind"]:>5} {e["B"]:2d} '
                  f'{e["stack"]*1e3:6.1f} {e["put"]*1e3:6.1f} '
                  f'{e["disp"]*1e3:6.1f} '
                  f'{(done or 0)*1e3:7.1f} {gap*1e3:6.1f}')
            if done:
                prev_done = done
        bs = [e['B'] for e in EVENTS if e['kind'] == 'batch']
        if bs:
            print(f'batch occupancy: {bs}  (mean {np.mean(bs):.1f} of '
                  f'{eng._batcher.max_batch})')
            print(f'sum put {sum(e["put"] for e in EVENTS if e["kind"]=="batch")*1e3:.0f} ms, '
                  f'sum disp {sum(e["disp"] for e in EVENTS if e["kind"]=="batch")*1e3:.0f} ms, '
                  f'sum stack {sum(e["stack"] for e in EVENTS if e["kind"]=="batch")*1e3:.0f} ms')


if __name__ == '__main__':
    main()
