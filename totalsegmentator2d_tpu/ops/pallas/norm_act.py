"""Pallas TPU kernel: fused InstanceNorm + LeakyReLU.

The U-Net's ConvDropoutNormReLU block normalizes each (sample, channel)
plane over its spatial extent and applies a leaky ReLU. XLA implements this
as reduce + broadcast-elementwise over HBM; this kernel keeps one (H, W)
tile of channels resident in VMEM and does both passes (statistics +
normalize-activate) without returning to HBM.

Grid: one program per batch sample; channels ride the 128-lane minor
dimension. Falls back to plain jnp (models/unet._instance_norm) on
non-TPU backends or when shapes don't fit VMEM.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _kernel(x_ref, scale_ref, bias_ref, o_ref, *, eps: float, slope: float):
    x = x_ref[...]                      # (1, H, W, C) block, fp32
    hw = x.shape[1] * x.shape[2]
    mean = jnp.sum(x, axis=(1, 2), keepdims=True) / hw
    centered = x - mean
    var = jnp.sum(centered * centered, axis=(1, 2), keepdims=True) / hw
    y = centered * jax.lax.rsqrt(var + eps)
    y = y * scale_ref[...] + bias_ref[...]
    o_ref[...] = jnp.where(y >= 0, y, y * slope)


def instance_norm_act(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                      eps: float = 1e-5, slope: float = 0.01,
                      vmem_limit_mb: int = 10) -> Optional[jnp.ndarray]:
    """Fused InstanceNorm2d(affine) + LeakyReLU for NHWC fp32 inputs.

    Returns None when the kernel does not apply (wrong platform/dtype or a
    plane too large for VMEM) — callers fall back to the jnp path.
    """
    if jax.default_backend() == 'cpu':
        return None
    if x.ndim != 4 or x.dtype != jnp.float32:
        return None
    n, h, w, c = x.shape
    # input + output blocks must fit VMEM comfortably
    if 2 * h * w * c * 4 > vmem_limit_mb * 1024 * 1024:
        return None

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kern = functools.partial(_kernel, eps=float(eps), slope=float(slope))
    return pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(x, scale, bias)
