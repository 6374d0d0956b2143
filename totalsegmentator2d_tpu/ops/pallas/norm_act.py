"""Pallas TPU kernel: fused InstanceNorm + LeakyReLU.

The U-Net's ConvDropoutNormReLU block normalizes each (sample, channel)
plane over its spatial extent and applies a leaky ReLU. XLA implements this
as reduce + broadcast-elementwise over HBM (~3 passes over the activation);
this kernel keeps one sample's (H, W, C) plane resident in VMEM and does
statistics + normalize-activate in a single HBM read + write.

Measured context (tools/perf_probe2.py, v5e): InstanceNorm accounts for
roughly half of a bf16 U-Net forward's device time at batch 16 — this is
the one Pallas candidate with real headroom.

Supports fp32 and bf16 NHWC inputs; statistics always accumulate in fp32
(a spatial variance in bf16 is garbage). Grid: one program per batch
sample. Falls back to plain jnp (models/unet._instance_norm) on non-TPU
backends or when a plane does not fit VMEM.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def _kernel(x_ref, scale_ref, bias_ref, o_ref, *, eps: float, slope: float):
    x = x_ref[...].astype(jnp.float32)      # (1, H, W, C) block
    hw = x.shape[1] * x.shape[2]
    mean = jnp.sum(x, axis=(1, 2), keepdims=True) / hw
    centered = x - mean
    var = jnp.sum(centered * centered, axis=(1, 2), keepdims=True) / hw
    y = centered * jax.lax.rsqrt(var + eps)
    y = y * scale_ref[...].astype(jnp.float32) + bias_ref[...].astype(jnp.float32)
    y = jnp.where(y >= 0, y, y * slope)
    o_ref[...] = y.astype(o_ref.dtype)


def instance_norm_act(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                      eps: float = 1e-5, slope: float = 0.01,
                      vmem_limit_mb: int = 12) -> Optional[jnp.ndarray]:
    """Fused InstanceNorm2d(affine) + LeakyReLU for NHWC fp32/bf16 inputs.

    Returns None when the kernel does not apply (wrong platform/dtype or a
    plane too large for VMEM) — callers fall back to the jnp path.
    """
    if jax.default_backend() == 'cpu':
        return None
    if x.ndim != 4 or x.dtype not in (jnp.float32, jnp.bfloat16):
        return None
    n, h, w, c = x.shape
    itemsize = 2 if x.dtype == jnp.bfloat16 else 4
    # input + output blocks + fp32 temporaries must fit VMEM comfortably
    if (2 * itemsize + 4) * h * w * c > vmem_limit_mb * 1024 * 1024:
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
        cost_estimate=pl.CostEstimate(
            flops=6 * n * h * w * c,
            bytes_accessed=2 * n * h * w * c * itemsize,
            transcendentals=n * c),
    )(x, scale, bias)
