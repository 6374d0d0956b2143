"""Fused InstanceNorm->LeakyReLU->conv3x3(+stats) Pallas kernel.

The U-Net block chain (conv -> IN -> act) is memory-bound on TPU: under
XLA's schedule each block costs ~5 HBM passes over the activation — conv
write, stats read, normalize+act read+write, next-conv read
(docs/performance.md). This kernel collapses the middle of the chain:

    y = conv3x3( leaky_relu( x * scale + shift ), w ) + b
    stats = per-(n, c_out) [sum(y), sum(y^2)]

reading the RAW previous conv output ``x`` once and writing ``y`` once.
``scale``/``shift`` fold the previous block's InstanceNorm statistics and
affine into one per-(n, c) multiply-add (host-side algebra:
scale = gamma * rsqrt(var + eps), shift = beta - mean * scale). The stats
output feeds the NEXT fused call, so a K-block stack runs:

    conv0 (XLA, one-pass stats) -> fused x(K-1) -> final normalize+act

eliminating the standalone stats + normalize passes of the inner blocks.

The 3x3 conv is computed as 3 MXU dots per row-block — one per kernel row,
each contracting (rows*W, 3*C) @ (3*C, C_out) with the three column shifts
concatenated on the channel axis — with single-row halo blocks above and
below (zeroed at the image border, matching SAME zero padding).

Measured verdict (TPU v5e, tools/perf_probe10/11.py, 2025-08-17): isolated
stacks win (1.8x at 128^2xC64 blocks, 1.5x at solo-scan batch), but inside
the real tile-scan/lax.map/vmap ensemble program the XLA<->Mosaic layout
conversions around each pallas_call cost more than the removed stats
passes — end-to-end 0.93x solo / 0.69x batched. Kept for the record and
for future whole-network-Pallas work; gated OFF by default (TS2D_FUSED=1
to enable). Full numbers: docs/performance.md.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _pick_rows(H: int, C: int, W: int) -> int:
    """Rows per grid block: bf16 sublane tile is 16; shrink for wide
    channel counts so the f32/bf16 working set stays well inside VMEM."""
    th = 16
    while th > 8 and (th + 2) * W * 3 * C * 2 > 4 * 1024 * 1024:
        th //= 2
    while H % th and th > 1:
        th //= 2
    return max(th, 1)


def _kernel(xc, xu, xd, sc, sh, w_ref, b_ref, y_ref, st_ref, *,
            TH: int, W: int, C: int, Cout: int, slope: float,
            apply_normact: bool = True):
    import jax.experimental.pallas as pl

    n = pl.program_id(0)
    h = pl.program_id(1)
    n_h = pl.num_programs(1)
    s = sc[n][None, None, :]
    t = sh[n][None, None, :]

    def normact(v):
        if not apply_normact:  # plain conv+stats (a stack's first block)
            return v.astype(jnp.bfloat16)
        z = v.astype(jnp.float32) * s + t
        return jnp.where(z >= 0, z, z * slope).astype(jnp.bfloat16)

    cur = normact(xc[0])                       # (TH, W, C)
    up = normact(xu[0])                        # (1, W, C) halo rows
    dn = normact(xd[0])
    up = jnp.where(h == 0, jnp.zeros_like(up), up)
    dn = jnp.where(h == n_h - 1, jnp.zeros_like(dn), dn)
    rows = jnp.concatenate([up, cur, dn], axis=0)      # (TH+2, W, C)
    zcol = jnp.zeros((TH + 2, 1, C), rows.dtype)
    left = jnp.concatenate([zcol, rows[:, :-1]], axis=1)
    right = jnp.concatenate([rows[:, 1:], zcol], axis=1)
    big = jnp.concatenate([left, rows, right], axis=-1)  # (TH+2, W, 3C)

    acc = jnp.zeros((TH * W, Cout), jnp.float32)
    for ky in range(3):
        a = big[ky:ky + TH].reshape(TH * W, 3 * C)
        acc = acc + jnp.dot(a, w_ref[ky], preferred_element_type=jnp.float32)
    out = acc + b_ref[0].astype(jnp.float32)
    y_ref[0] = out.reshape(TH, W, Cout).astype(y_ref.dtype)

    partial = jnp.stack([jnp.sum(out, axis=0), jnp.sum(out * out, axis=0)])

    @pl.when(h == 0)
    def _():
        st_ref[0] = partial

    @pl.when(h > 0)
    def _():
        st_ref[0] = st_ref[0] + partial


@functools.partial(jax.jit,
                   static_argnames=('slope', 'interpret', 'apply_normact'))
def fused_norm_act_conv(x: jnp.ndarray, scale: jnp.ndarray,
                        shift: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                        slope: float = 0.01, interpret: bool = False,
                        apply_normact: bool = True
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """y = conv3x3(leaky_relu(x * scale + shift)) + b, with per-(n, cout)
    output statistics.

    :param x: (N, H, W, C) raw previous conv output (bf16 or f32)
    :param scale/shift: (N, C) fp32 folded InstanceNorm (see module doc)
    :param w: (3, 3, C, Cout); b: (Cout,)
    :returns: (y (N, H, W, Cout) bf16, stats (N, 2, Cout) fp32 where
        stats[:, 0] = sum(y), stats[:, 1] = sum(y^2) over H*W)
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, H, W, C = x.shape
    Cout = w.shape[-1]
    TH = _pick_rows(H, max(C, Cout), W)
    grid = (N, H // TH)

    # (ky, kx, C, Cout) -> (3, 3C, Cout): merging (kx, C) keeps kx-major
    # order, matching the kernel's channel-concat [left, center, right]
    w_r = w.reshape(3, 3 * C, Cout).astype(jnp.bfloat16)
    x = x.astype(jnp.bfloat16)

    kernel = functools.partial(_kernel, TH=TH, W=W, C=C, Cout=Cout,
                               slope=slope, apply_normact=apply_normact)
    y, st = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TH, W, C), lambda n, h: (n, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W, C),
                         lambda n, h: (n, jnp.maximum(h * TH - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W, C),
                         lambda n, h: (n, jnp.minimum(h * TH + TH, H - 1),
                                       0, 0),
                         memory_space=pltpu.VMEM),
            # full (N, C) arrays: per-row blocks would violate the (8, 128)
            # tile rule for small C; they are tiny, keep them whole in VMEM
            pl.BlockSpec((N, C), lambda n, h: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, C), lambda n, h: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3 * C, Cout), lambda n, h: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cout), lambda n, h: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TH, W, Cout), lambda n, h: (n, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, Cout), lambda n, h: (n, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, H, W, Cout), jnp.bfloat16),
            jax.ShapeDtypeStruct((N, 2, Cout), jnp.float32),
        ],
        interpret=interpret,
    )(x, x, x, scale, shift, w_r, b.reshape(1, Cout))
    return y, st


def fold_stats(stats: jnp.ndarray, hw: int, gamma: Optional[jnp.ndarray],
               beta: Optional[jnp.ndarray], eps: float
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Turn accumulated [sum, sumsq] into the next call's (scale, shift):
    scale = gamma * rsqrt(var + eps), shift = beta - mean * scale."""
    mean = stats[:, 0] / hw
    var = jnp.maximum(stats[:, 1] / hw - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + eps)
    g = inv if gamma is None else inv * gamma[None]
    s = -mean * g if beta is None else beta[None] - mean * g
    return g, s


def reference(x, scale, shift, w, b, slope=0.01):
    """Plain-XLA reference for correctness tests."""
    z = x.astype(jnp.float32) * scale[:, None, None, :] + shift[:, None, None, :]
    z = jnp.where(z >= 0, z, z * slope).astype(jnp.bfloat16)
    y = jax.lax.conv_general_dilated(
        z, w.astype(jnp.bfloat16), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=jnp.float32) + b
    st = jnp.stack([jnp.sum(y, axis=(1, 2)),
                    jnp.sum(y * y, axis=(1, 2))], axis=1)
    return y.astype(jnp.bfloat16), st
