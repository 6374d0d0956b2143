"""Probe 27 — per-transform breakdown of the SHIPPED augment_batch.

Probe 26 (train_probe5.py) measured the wired fast warp end-to-end:
augmented training moved 46 -> 139 patches/s (b64), but that is still
~5x below the un-augmented 739, with augment_batch at 5.3 ms/patch.
This probe bills the 5.3 ms to individual transforms, each measured in
the shipped composition style (vmapped over b64 inside one jit), to
find the next target.

Every jit wraps a FRESH lambda: jax.jit's trace cache is global per
function object, so jitting the same module-level function twice
silently reuses the first trace (the bug that invalidated probe 26's
gather rows and Trainer's per-instance TS2D_WARP).

Usage: python tools/train_probe6.py   (alone on the box; ONE JAX process)
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
    """build() -> a jittable fn(key, *batchlike); median of N_REPS synced
    by fetching a slice of the first output."""
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
    import jax.numpy as jnp
    from totalsegmentator2d_tpu.training import augment as A

    print('devices:', jax.devices(), file=sys.stderr)
    rng = np.random.default_rng(0)
    img = jax.device_put(rng.standard_normal(
        (B, PATCH, PATCH, IN_CH)).astype(np.float32))
    tgt = jax.device_put((rng.random(
        (B, PATCH, PATCH, LABELS)) > 0.98).astype(np.uint8))
    results = {}

    def vpair(f):
        """vmap a per-sample (key, image, target) transform over b64."""
        def g(key, i, t):
            ks = jax.random.split(key, B)
            return jax.vmap(f)(ks, i, t)
        return g

    def vimg(f):
        def g(key, i):
            ks = jax.random.split(key, B)
            return jax.vmap(f)(ks, i)
        return g

    # the full shipped recipe, both warp backends (now correctly retraced)
    for mode in ('matmul', 'gather'):
        os.environ['TS2D_WARP'] = mode
        measure(f'full augment_batch {mode}',
                lambda: (lambda k, i, t: A.augment_batch(
                    k, {'image': i, 'target': t})),
                (img, tgt), results)

    # spatial alone at the recipe's p=0.2 (cond -> select under vmap:
    # every sample pays the warp) and at p=1.0
    for mode in ('matmul', 'gather'):
        os.environ['TS2D_WARP'] = mode
        measure(f'spatial p0.2 {mode}',
                lambda: vpair(lambda k, i, t: A.spatial_transform(k, i, t)),
                (img, tgt), results)
    os.environ['TS2D_WARP'] = 'matmul'

    # spatial decomposed: image warp only / target warp only / grid only
    def img_only(k, i, t):
        ang = jax.random.uniform(k, (), minval=-3.14, maxval=3.14)
        coords = A.affine_grid(i.shape[:2], ang, 1.1)
        return A.warp_image(i, coords, order=3), t

    def tgt_only(k, i, t):
        ang = jax.random.uniform(k, (), minval=-3.14, maxval=3.14)
        coords = A.affine_grid(i.shape[:2], ang, 1.1)
        return i, A.warp_onehot(t, coords)

    def grid_only(k, i, t):
        ang = jax.random.uniform(k, (), minval=-3.14, maxval=3.14)
        coords = A.affine_grid(i.shape[:2], ang, 1.1)
        return i + coords[0][..., None], t

    measure('warp_image o3 (grid+prefilter+matmul)', lambda: vpair(img_only),
            (img, tgt), results)
    measure('warp_onehot (grid+packed gather)', lambda: vpair(tgt_only),
            (img, tgt), results)
    measure('affine_grid only', lambda: vpair(grid_only), (img, tgt), results)

    # each intensity transform in the recipe, shipped probabilities
    singles = [
        ('noise p0.1', lambda k, i: A.add_gaussian_noise(k, i)),
        ('blur p0.2', lambda k, i: A.blur_transform(k, i)),
        ('brightness p0.15', lambda k, i: A.brightness_transform(k, i)),
        ('contrast p0.15', lambda k, i: A.contrast_transform(k, i)),
        ('lowres p0.25', lambda k, i: A.lowres_transform(k, i)),
        ('gamma-inv p0.1', lambda k, i: A.gamma_transform(
            k, i, p=0.1, invert=True)),
        ('gamma p0.3', lambda k, i: A.gamma_transform(k, i)),
    ]
    for name, f in singles:
        measure(name, lambda f=f: vimg(f), (img,), results)
    measure('mirror p0.5', lambda: vpair(
        lambda k, i, t: A.mirror_transform(k, i, t)), (img, tgt), results)

    json.dump(results, sys.stdout, indent=1)
    print()


if __name__ == '__main__':
    main()
