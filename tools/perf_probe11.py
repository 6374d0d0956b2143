"""Probe 11 — end-to-end effect of the fused block chain (TS2D_FUSED).

Builds the bench's 5-group/117-label ensemble twice — standard XLA blocks
vs the Pallas fused stacks (models/unet.py _conv_stack_fused) — and
measures the REAL fused 2D program at the torso projection shape
(350x280 -> 4 tiles x 4 TTA), solo and micro-batched(8), plus mask
agreement between the two paths on identical input.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')

# these probes decompose the PLAIN mask wire; the compacted wire
# (round 4, default on) returns (buf, occ) tuples from the raw
# programs and has its own probes (perf_probe19/20)
os.environ.setdefault('TS2D_COMPACT', '0')

import jax
import jax.numpy as jnp


def build(fused: bool):
    os.environ['TS2D_FUSED'] = '1' if fused else '0'
    import bench
    return bench.build_engine()


def timed_call(fn, n=6):
    fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    rng = np.random.default_rng(0)
    # torso-like projection (the bench's real working shape after crop)
    arr = np.clip(rng.normal(40.0, 300.0, (350, 280, 2)),
                  -1024, 3071).astype(np.float32)
    sp = (1.5, 1.5)

    results = {}
    segs = {}
    for fused in (False, True):
        eng = build(fused)
        name = 'fused' if fused else 'std'
        seg = eng.predict_array(arr, sp)
        segs[name] = seg

        def solo():
            eng.predict_array(arr, sp)  # finish_array device_gets (syncs)
        t_solo = timed_call(solo)

        B = 8
        fnb, _ = eng._batched_program(B, arr.shape[:2], sp, False)
        xb = jax.device_put(np.stack([arr] * B))

        def batched():
            out = fnb(eng.params, xb)
            np.asarray(jax.device_get(out))
        t_batch = timed_call(batched) / B
        results[name] = (t_solo, t_batch)
        print(f'{name}: solo {t_solo * 1e3:.1f} ms/scan, '
              f'batched(8) {t_batch * 1e3:.1f} ms/scan', flush=True)
        eng.close()

    agree = float((segs['std'] == segs['fused']).mean())
    s0, b0 = results['std']
    s1, b1 = results['fused']
    print(f'mask agreement fused-vs-std: {agree:.6f}')
    print(f'speedup: solo {s0 / s1:.3f}x, batched {b0 / b1:.3f}x')


if __name__ == '__main__':
    main()
