"""Probe 26 — augmented-training throughput with the WIRED fast warp.

Round-4 measured augmented training at 46 patches/s (19.2 ms/patch of
augmentation vs 1.5 ms/patch for the step itself) because the spatial
resample's point gathers scalarize on TPU. Probe 25 (train_probe4.py)
prototyped the matmul/packed-bit recast; round 5 wired it into
spatial_transform as the TS2D_WARP=matmul default. This probe measures
the SHIPPED paths end-to-end:

 - augment_batch standalone (ms/patch), matmul vs gather backends
 - Trainer.step with augment=True (patches/s, MFU), both backends
 - the un-augmented control (the round-4 675 patches/s figure)

Method as tools/train_probe.py: device-resident batch, one compile
warmup, median of N synced by fetching the loss scalar (block_until_
ready returns early through the relay — CLAUDE.md).

Usage: python tools/train_probe5.py   (alone on the box; ONE JAX process)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')

from train_probe import forward_flops, PEAK_FLOPS, PATCH, LABELS, IN_CH, N_STAGES  # noqa: E402,F401


def main():
    import jax
    import jax.numpy as jnp

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

    results = {}

    # -- standalone augment_batch, both backends --------------------------
    from totalsegmentator2d_tpu.training.augment import augment_batch
    for mode in ('matmul', 'gather'):
        os.environ['TS2D_WARP'] = mode
        b = 64
        batch = jax.device_put(make_batch(b))
        # fresh lambda per mode: jax.jit's trace cache is global per
        # function OBJECT — jit(augment_batch) twice would silently reuse
        # the first mode's executable
        fn = jax.jit(lambda k, bb: augment_batch(k, bb))
        key = jax.random.PRNGKey(0)
        out = fn(key, batch)
        np.asarray(out['image'][:1, :2, :2, 0])  # sync incl. compile
        times = []
        for i in range(6):
            key = jax.random.PRNGKey(i + 1)
            t0 = time.perf_counter()
            out = fn(key, batch)
            np.asarray(out['image'][:1, :2, :2, 0])
            times.append(time.perf_counter() - t0)
        t = float(np.median(times))
        results[f'augment_batch b{b} {mode}'] = {
            'ms_per_batch': round(t * 1e3, 1),
            'ms_per_patch': round(t * 1e3 / b, 2),
            'spread_ms': [round(x * 1e3, 1) for x in times],
        }
        print(f'augment {mode}: {results[f"augment_batch b{b} {mode}"]}',
              flush=True)
        del fn, out, batch

    # -- full training step with augmentation ----------------------------
    configs = [
        ('bf16 b128 no-aug control', 'matmul', dict(compute_dtype='bf16'),
         128),
        ('bf16+augment b64 matmul', 'matmul',
         dict(compute_dtype='bf16', augment=True), 64),
        ('bf16+augment b64 gather', 'gather',
         dict(compute_dtype='bf16', augment=True), 64),
        ('bf16+augment b128 matmul', 'matmul',
         dict(compute_dtype='bf16', augment=True), 128),
    ]
    for name, mode, kw, b in configs:
        os.environ['TS2D_WARP'] = mode
        cfg = TrainConfig(lr=1e-2, total_steps=1000, multilabel=True,
                          deep_supervision=True, **kw)
        try:
            tr = Trainer(spec, cfg, seed=0)
            batch = jax.device_put(make_batch(b))
            t0 = time.perf_counter()
            loss = tr.step(batch)
            np.asarray(loss)
            compile_s = time.perf_counter() - t0
            times = []
            for _ in range(6):
                t0 = time.perf_counter()
                loss = tr.step(batch)
                np.asarray(loss)
                times.append(time.perf_counter() - t0)
            del tr, batch
        except Exception as ex:
            results[name] = {'error': repr(ex)[:120]}
            print(f'{name}: {results[name]}', flush=True)
            continue
        t = float(np.median(times))
        tf = 3.0 * forward_flops(b)
        results[name] = {
            's_per_step': round(t, 4),
            'patches_per_s': round(b / t, 1),
            'mfu_pct': round(100.0 * tf / t / PEAK_FLOPS, 1),
            'compile_s': round(compile_s, 1),
            'spread': [round(x, 4) for x in times],
        }
        print(f'{name}: {results[name]}', flush=True)
    json.dump(results, sys.stdout, indent=1)
    print()


if __name__ == '__main__':
    main()
