"""Pallas TPU kernel: cubic B-spline prefilter (first-order IIR).

The resampler's prefilter solves the causal/anticausal recursions
    s[i] = x[i] + z * s[i-1]        (z = sqrt(3) - 2)
    c[i] = z * (c[i+1] - s[i])
The jnp fallback evaluates them with associative scans: O(n log n) work and
log n full-array HBM round trips. This kernel keeps a block of lines
resident in VMEM and runs the recursion once, sequentially along the filter
axis but vectorized over an (8, 128) tile of independent lines per step.

Layout: the filter axis becomes the leading (sequential) dimension; all
other dimensions flatten into lines padded to multiples of 8*128 so every
step is one full VPU tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_POLE3 = np.sqrt(3.0) - 2.0
_SUB, _LANE = 8, 128


def _mirror_index(i: int, n: int) -> int:
    if n == 1:
        return 0
    period = 2 * n - 2
    k = i % period
    return k if k < n else period - k


def _kernel(x_ref, o_ref, *, n: int, horizon: int):
    z = _POLE3
    gain = (1.0 - z) * (1.0 - 1.0 / z)

    # causal init: c0 = gain * sum_k z^k x[mirror(k)] (truncated series)
    c0 = x_ref[0, 0] * gain
    zk = 1.0
    for k in range(1, horizon + 1):
        zk *= z
        c0 = c0 + x_ref[_mirror_index(k, n), 0] * (gain * zk)
    o_ref[0, 0] = c0

    def causal(i, carry):
        v = x_ref[i, 0] * gain + carry * z
        o_ref[i, 0] = v
        return v

    last = jax.lax.fori_loop(1, n, causal, c0)

    # anticausal init + backward pass
    prev = o_ref[n - 2, 0]
    cn = (prev * z + last) * (z / (z * z - 1.0))
    o_ref[n - 1, 0] = cn

    def anticausal(j, carry):
        i = n - 2 - j
        v = (carry - o_ref[i, 0]) * z
        o_ref[i, 0] = v
        return v

    jax.lax.fori_loop(0, n - 1, anticausal, cn)


def bspline_prefilter_pallas(arr: jnp.ndarray, axis: int,
                             tol: float = 1e-10, interpret: bool = False):
    """Cubic B-spline prefilter along ``axis``. Returns None when the kernel
    does not apply (non-TPU backend, fp mismatch, or tiny axes) — callers
    fall back to the associative-scan implementation. ``interpret=True``
    runs the Pallas interpreter (CPU-testable)."""
    if jax.default_backend() == 'cpu' and not interpret:
        return None
    # a TPU may be attached while the caller pinned placement to the host
    # (jax.default_device(cpu), e.g. tools/parity.py's semantic checks):
    # the Mosaic kernel cannot lower there either
    dd = getattr(jax.config, 'jax_default_device', None)
    if dd is not None and getattr(dd, 'platform', None) == 'cpu' \
            and not interpret:
        return None
    if arr.dtype != jnp.float32:
        return None
    n = arr.shape[axis]
    if n < 4:
        return None

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    moved = jnp.moveaxis(arr, axis, 0)
    lead_shape = moved.shape[1:]
    lines = int(np.prod(lead_shape)) if lead_shape else 1
    block = _SUB * _LANE
    pad = (-lines) % block
    flat = moved.reshape(n, lines)
    if pad:
        flat = jnp.pad(flat, ((0, 0), (0, pad)))
    nblk = (lines + pad) // block
    tiled = flat.reshape(n, nblk, _SUB, _LANE)

    horizon = min(int(np.ceil(np.log(tol) / np.log(abs(_POLE3)))), 2 * n - 2)
    kern = functools.partial(_kernel, n=n, horizon=horizon)

    out = pl.pallas_call(
        kern,
        grid=(nblk,),
        in_specs=[pl.BlockSpec((n, 1, _SUB, _LANE), lambda j: (0, j, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((n, 1, _SUB, _LANE), lambda j: (0, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(tiled.shape, tiled.dtype),
        interpret=interpret,
    )(tiled)

    out = out.reshape(n, lines + pad)[:, :lines].reshape((n,) + lead_shape)
    return jnp.moveaxis(out, 0, axis)
