"""Probe 30 — the tile-windowed affine warp (warp_image_affine) on v5e.

Probe 28/29 (train_probe7/8, retired; verdicts in tools/README.md)
settled the quad-packed warp_onehot at 1.1 ms/patch and left warp_image
at 2.4 ms/patch as the largest augmentation term: its one-hot matmuls
run at the FULL image height/width (Ry (P, H), Rx (P, W)) even though
an affine grid's tile of outputs only reads a bounded source window.
warp_image_affine (round-5 session 3) runs the same matmuls at the
window size (WIN=40 at the training shapes vs H=256, ~40x fewer FLOPs)
after a per-tile dynamic-slice. This probe measures, b64-vmapped inside
one jit as shipped:

 - warp_image (full-height) vs warp_image_affine (windowed), o3, affine
 - windowed at tile 8/16/32 (window 24/40/72): the FLOP/slice trade
 - the shipped augment_batch + Trainer end-to-end (windowed dispatch)

Method: probelib.timeit-style — fresh lambda per arm (trace-cache trap,
docs/performance.md), sync by fetching a dependent output slice, median
of N. Usage: python tools/train_probe9.py  (alone on the box).
Arm selection for follow-up sweeps (each arm costs minutes of relay
compile): P9_ARMS=sweep,full,augment,train64,train128 (default all),
P9_TILES=8,16,32 (the windowed-tile sweep).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from train_probe import PATCH, LABELS, IN_CH  # noqa: E402

B = 64
N_REPS = 6


def measure(name, build, batchlike, results):
    import jax
    fn = jax.jit(build())
    key = jax.random.PRNGKey(0)

    def head(out):
        if isinstance(out, dict):
            return out['image']
        return out[0] if isinstance(out, (tuple, list)) else out

    out = fn(key, *batchlike)
    np.asarray(head(out)[:1, :2])  # sync incl. compile
    times = []
    for i in range(N_REPS):
        k = jax.random.PRNGKey(i + 1)
        t0 = time.perf_counter()
        out = fn(k, *batchlike)
        np.asarray(head(out)[:1, :2])
        times.append(time.perf_counter() - t0)
    t = float(np.median(times))
    results[name] = {'ms_per_batch': round(t * 1e3, 2),
                     'ms_per_patch': round(t * 1e3 / B, 3)}
    print(f'{name}: {results[name]}', flush=True)


def main():
    import jax

    from totalsegmentator2d_tpu.training import augment as A

    print('devices:', jax.devices(), file=sys.stderr)
    rng = np.random.default_rng(0)
    img = jax.device_put(rng.standard_normal(
        (B, PATCH, PATCH, IN_CH)).astype(np.float32))
    tgt = jax.device_put((rng.random(
        (B, PATCH, PATCH, LABELS)) > 0.98).astype(np.uint8))
    results = {}

    def vpair(f):
        def g(key, i, t):
            ks = jax.random.split(key, B)
            return jax.vmap(f)(ks, i, t)
        return g

    def warp_arm(warp):
        def f(k, i, t):
            ang = jax.random.uniform(k, (), minval=-3.14, maxval=3.14)
            sc = jax.random.uniform(k, (), minval=0.7, maxval=1.4)
            coords = A.affine_grid(i.shape[:2], ang, sc)
            return warp(i, coords), t
        return f

    arms = set(os.environ.get(
        'P9_ARMS', 'sweep,full,augment,train64,train128').split(','))
    tiles = tuple(int(x) for x in os.environ.get(
        'P9_TILES', '8,16,32').split(','))

    if 'full' in arms:
        measure('warp_image o3 full-height',
                lambda: vpair(warp_arm(
                    lambda i, c: A.warp_image(i, c, order=3))),
                (img, tgt), results)
    if 'sweep' in arms:
        for tile in tiles:
            measure(f'warp_image_affine o3 tile{tile} '
                    f'win{A._win_size(tile, 3, 1.4)}',
                    lambda tile=tile: vpair(warp_arm(
                        lambda i, c: A.warp_image_affine(
                            i, c, order=3, smax=1.4, tile=tile))),
                    (img, tgt), results)

    # the shipped recipe end-to-end (windowed dispatch is the default)
    os.environ['TS2D_WARP'] = 'matmul'
    if 'augment' in arms:
        measure('full augment_batch (windowed default)',
                lambda: (lambda k, i, t: A.augment_batch(
                    k, {'image': i, 'target': t})),
                (img, tgt), results)

    # Trainer end-to-end with augmentation, b64 + b128
    from totalsegmentator2d_tpu.training import TrainConfig, Trainer
    from train_probe import forward_flops, PEAK_FLOPS, N_STAGES
    from __graft_entry__ import _flagship_spec
    spec = _flagship_spec(out_channels=LABELS, in_channels=IN_CH,
                          n_stages=N_STAGES)
    for b in (64, 128):
        if f'train{b}' not in arms:
            continue
        cfg = TrainConfig(lr=1e-2, total_steps=1000, multilabel=True,
                          deep_supervision=True, compute_dtype='bf16',
                          augment=True)
        tr = Trainer(spec, cfg, seed=0)
        batch = jax.device_put({
            'image': rng.standard_normal(
                (b, PATCH, PATCH, IN_CH)).astype(np.float32),
            'target': (rng.random(
                (b, PATCH, PATCH, LABELS)) > 0.98).astype(np.uint8)})
        loss = tr.step(batch)
        np.asarray(loss)
        times = []
        for _ in range(N_REPS):
            t0 = time.perf_counter()
            loss = tr.step(batch)
            np.asarray(loss)
            times.append(time.perf_counter() - t0)
        t = float(np.median(times))
        tf = 3.0 * forward_flops(b)
        results[f'train step aug b{b} windowed'] = {
            's_per_step': round(t, 4),
            'patches_per_s': round(b / t, 1),
            'mfu_pct': round(100.0 * tf / t / PEAK_FLOPS, 1),
        }
        print(f"train b{b}: {results[f'train step aug b{b} windowed']}",
              flush=True)
        del tr, batch

    json.dump(results, sys.stdout, indent=1)
    print()


if __name__ == '__main__':
    main()
