"""Probe 22 — training-step throughput/MFU on the real chip.

The training subsystem (training/train.py: nnU-Net recipe as one jitted
step) had no measured numbers on TPU — every committed figure is
inference-side. This probe times the production step on the bench-scale
group model (6-stage flagship arch, 256x256 patches, 24 labels, deep
supervision) across precision/batch/remat/augment configs and reports
s/step, patches/s, and MFU against the v5e bf16 peak.

Method: batch is device-resident (the host data pipeline runs ahead and
overlaps in production; this measures the device step), one compile
warmup, then N timed steps each synced by fetching the loss scalar
(block_until_ready returns early through the relay — CLAUDE.md).
Training FLOPs are estimated as 3x analytic forward FLOPs (backward
~2x forward), forward counted conv-by-conv like tools/roofline.py with
deep-supervision heads included.

Usage: python tools/train_probe.py [--stats {2pass,1pass}] [--configs a,b]
(alone on the box; ONE JAX process). --stats forces the InstanceNorm
statistics form for the whole run (TS2D_STATS, read at trace time) —
the A/B for making one-pass stats the training default; --configs
filters the matrix by substring (e.g. --configs "bf16 b128").
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')
sys.path.insert(0, '/root/repo/tools')

from probelib import (  # noqa: E402,F401  (re-exported for train_probe5/6)
    IN_CH, K, LABELS, N_STAGES, PATCH,
    PEAK_BF16 as PEAK_FLOPS, flagship_train_flops as forward_flops)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--stats', choices=['2pass', '1pass'])
    ap.add_argument('--configs', default='')
    args = ap.parse_args()
    if args.stats:
        os.environ['TS2D_STATS'] = args.stats

    import jax

    from totalsegmentator2d_tpu.training import TrainConfig, Trainer
    from __graft_entry__ import _flagship_spec

    print('devices:', jax.devices(), file=sys.stderr)
    spec = _flagship_spec(out_channels=LABELS, in_channels=IN_CH,
                          n_stages=N_STAGES)
    rng = np.random.default_rng(0)

    def make_batch(b):
        return {
            'image': rng.standard_normal(
                (b, PATCH, PATCH, IN_CH)).astype(np.float32),
            'target': (rng.random(
                (b, PATCH, PATCH, LABELS)) > 0.98).astype(np.uint8),
        }

    configs = [
        ('fp32 b8', dict(compute_dtype=None), 8),
        ('bf16 b8', dict(compute_dtype='bf16'), 8),
        ('bf16 b16', dict(compute_dtype='bf16'), 16),
        ('bf16 b32', dict(compute_dtype='bf16'), 32),
        ('bf16 b64', dict(compute_dtype='bf16'), 64),
        ('bf16 b128', dict(compute_dtype='bf16'), 128),
        ('bf16+remat b32', dict(compute_dtype='bf16', remat=True), 32),
        ('bf16+remat b64', dict(compute_dtype='bf16', remat=True), 64),
        ('bf16+remat b128', dict(compute_dtype='bf16', remat=True), 128),
        ('bf16+augment b16', dict(compute_dtype='bf16', augment=True), 16),
    ]
    if args.configs:
        wanted = [w.strip() for w in args.configs.split(',')]
        configs = [c for c in configs if any(w in c[0] for w in wanted)]
    results = {}
    for name, kw, b in configs:
        cfg = TrainConfig(lr=1e-2, total_steps=1000, multilabel=True,
                          deep_supervision=True, **kw)
        try:
            tr = Trainer(spec, cfg, seed=0)
            batch = jax.device_put(make_batch(b))
            t0 = time.perf_counter()
            loss = tr.step(batch)
            np.asarray(loss)  # sync: includes compile
            compile_s = time.perf_counter() - t0
            times = []
            for _ in range(6):
                t0 = time.perf_counter()
                loss = tr.step(batch)
                np.asarray(loss)
                times.append(time.perf_counter() - t0)
            del tr, batch
        except Exception as ex:  # OOM at the big batches is a result too
            results[name] = {'error': repr(ex)[:120]}
            print(f'{name}: {results[name]}', flush=True)
            continue
        t = float(np.median(times))
        tf = 3.0 * forward_flops(b)
        results[name] = {
            's_per_step': round(t, 4),
            'patches_per_s': round(b / t, 1),
            'tflops': round(tf / t / 1e12, 1),
            'mfu_pct': round(100.0 * tf / t / PEAK_FLOPS, 1),
            'compile_s': round(compile_s, 1),
            'spread': [round(x, 4) for x in times],
        }
        print(f'{name}: {results[name]}', flush=True)
    json.dump(results, sys.stdout, indent=1)
    print()


if __name__ == '__main__':
    main()
