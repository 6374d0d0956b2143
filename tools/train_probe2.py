"""Probe 23 — where does the on-device augmentation chain spend its time?

Probe 22 measured the full nnU-Net augmentation recipe at ~19 ms/patch on
the v5e — 8-13x the train step's own per-patch cost — so the chain, not
the optimizer step, bounds augmented-training throughput. This probe
times each transform standalone (vmapped at batch 64, the production
256x256x2 image + 24-label one-hot target) to find the dominant term.

Hypothesis: lowres_transform — under vmap, lax.switch executes ALL 6
zoom branches for every channel of every sample, and each cubic branch
runs a bspline_prefilter IIR scan.

Usage: python tools/train_probe2.py   (alone on the box)
"""

import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')

B, H, W, C, L = 64, 256, 256, 2, 24


def main():
    import jax
    import jax.numpy as jnp

    from totalsegmentator2d_tpu.training import augment as A

    print('devices:', jax.devices(), file=sys.stderr)
    rng = np.random.default_rng(0)
    img = jax.device_put(rng.standard_normal((B, H, W, C)).astype(np.float32))
    tgt = jax.device_put((rng.random((B, H, W, L)) > 0.98).astype(np.uint8))
    keys = jax.random.split(jax.random.PRNGKey(0), B)

    def timed(name, fn, *args):
        f = jax.jit(fn)
        out = f(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf[:1, :4])  # sync (block_until_ready lies, CLAUDE.md)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = f(*args)
            leaf = jax.tree_util.tree_leaves(out)[0]
            np.asarray(leaf[:1, :4])
            ts.append(time.perf_counter() - t0)
        t = float(np.median(ts)) * 1e3
        print(f'{name:28s} {t:8.1f} ms/batch  {t / B:6.3f} ms/patch',
              flush=True)

    timed('full augment_batch',
          lambda k, i, t: A.augment_batch(k[0], {'image': i, 'target': t}),
          keys, img, tgt)
    timed('spatial (rot+zoom)',
          lambda k, i, t: jax.vmap(A.spatial_transform)(k, i, t), keys, img,
          tgt)
    timed('noise', lambda k, i: jax.vmap(A.add_gaussian_noise)(k, i), keys,
          img)
    timed('blur', lambda k, i: jax.vmap(A.blur_transform)(k, i), keys, img)
    timed('brightness', lambda k, i: jax.vmap(A.brightness_transform)(k, i),
          keys, img)
    timed('contrast', lambda k, i: jax.vmap(A.contrast_transform)(k, i),
          keys, img)
    timed('lowres', lambda k, i: jax.vmap(A.lowres_transform)(k, i), keys,
          img)
    timed('gamma x2',
          lambda k, i: jax.vmap(lambda kk, ii: A.gamma_transform(
              kk, A.gamma_transform(kk, ii, invert=True)))(k, i), keys, img)
    timed('mirror', lambda k, i, t: jax.vmap(A.mirror_transform)(k, i, t),
          keys, img, tgt)


if __name__ == '__main__':
    main()
