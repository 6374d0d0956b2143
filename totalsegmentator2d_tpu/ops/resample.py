"""Spacing/shape resampling as MXU matmuls.

Replaces ITK's ``ResampleImageFilter`` (+ BSpline/NearestNeighbor
interpolators, reference image.py:293-380) and the nnU-Net preprocessing
resize. TPU-first design:

 - Interpolation along each axis is expressed as a **dense weight matrix**
   ``W (n_out, n_in)`` applied by matmul — separable axes become a chain of
   matmuls that XLA maps straight onto the MXU, instead of the
   gather-per-voxel pattern a CPU implementation would use.
 - Cubic interpolation is true B-spline interpolation (ITK sitkBSpline /
   scipy order=3 semantics): a **prefilter** IIR pass converts samples to
   B-spline coefficients. The causal/anticausal recursions are first-order
   linear recurrences, evaluated in O(log n) depth with
   ``jax.lax.associative_scan`` rather than a sequential loop.

Weight matrices are built on the host per (n_in, n_out, mapping) — they are
shape-static under jit, so they fold into the compiled executable.

Two coordinate conventions are provided:
 - 'itk'       : the reference's resample() — output grid defined by a
                 reference image (origin/spacing), identity transform.
 - 'halfpixel' : skimage/scipy zoom convention used by nnU-Net's
                 preprocessing resize: in = (i + 0.5) * scale - 0.5.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..io.image import MedicalImage, is_label_image
from ..utils.logging import warn

# cubic B-spline pole (scipy ni_splines.c, order 3)
_POLE3 = np.sqrt(3.0) - 2.0


# ---------------------------------------------------------------------------
# B-spline prefilter (samples -> coefficients)
# ---------------------------------------------------------------------------

def _first_order_scan(x: jnp.ndarray, z: float) -> jnp.ndarray:
    """Solve s[i] = x[i] + z * s[i-1] (s[-1]=0 folded into x[0]) along the
    last axis using an associative scan: elements are (decay, value) pairs."""
    decay = jnp.full(x.shape, z, dtype=x.dtype)

    def combine(a, b):
        da, va = a
        db, vb = b
        return da * db, va * db + vb

    _, s = jax.lax.associative_scan(combine, (decay, x), axis=-1)
    return s


def bspline_prefilter_1d(x: jnp.ndarray, tol: float = 1e-10) -> jnp.ndarray:
    """Cubic B-spline prefilter along the last axis (mirror boundary),
    matching scipy.ndimage.spline_filter1d(order=3, mode='mirror')."""
    n = x.shape[-1]
    if n == 1:
        return x
    z = _POLE3
    gain = (1.0 - z) * (1.0 - 1.0 / z)
    c = x * gain

    # causal init: c0 = sum_k z^k * c_mirror(k), truncated at tolerance
    horizon = min(int(np.ceil(np.log(tol) / np.log(abs(z)))), 2 * n - 2)
    idx = np.arange(horizon + 1)
    # mirror indexing without repeated edge: 0,1,...,n-1,n-2,...,1,0,1,...
    period = 2 * n - 2
    mirror = np.abs(((idx + n - 1) % period) - (n - 1))
    zpow = (z ** idx).astype(np.float64)
    init_w = np.zeros(n)
    np.add.at(init_w, mirror, zpow)
    c0 = jnp.tensordot(c, jnp.asarray(init_w, dtype=c.dtype), axes=((-1,), (0,)))

    # causal pass: s[i] = c[i] + z s[i-1], with s[0] = c0
    xs = jnp.concatenate([c0[..., None], c[..., 1:]], axis=-1)
    s = _first_order_scan(xs, z)

    # anticausal init + pass (scan the reversed sequence)
    last = (z / (z * z - 1.0)) * (z * s[..., -2] + s[..., -1])
    rev = jnp.flip(s[..., :-1], axis=-1) * (-z)
    xs2 = jnp.concatenate([last[..., None], rev], axis=-1)
    out_rev = _first_order_scan(xs2, z)
    return jnp.flip(out_rev, axis=-1)


def _pallas_prefilter_enabled() -> bool:
    # ON by default: measured on v5e, the single-pass VMEM IIR kernel saves
    # ~20 ms per resampling program vs the associative scan (which costs
    # O(n log n) work and log n HBM round trips). TS2D_PALLAS=0 disables.
    import os
    return os.environ.get('TS2D_PALLAS', '1') != '0'


def bspline_prefilter(arr: jnp.ndarray, axes: Sequence[int]) -> jnp.ndarray:
    pallas_ok = _pallas_prefilter_enabled()
    for ax in axes:
        if pallas_ok:
            # single-pass VMEM IIR kernel (ops/pallas/prefilter.py); returns
            # None when it doesn't apply on this backend/shape
            from .pallas.prefilter import bspline_prefilter_pallas
            out = bspline_prefilter_pallas(arr, ax)
            if out is not None:
                arr = out
                continue
        arr = jnp.moveaxis(bspline_prefilter_1d(jnp.moveaxis(arr, ax, -1)), -1, ax)
    return arr


# ---------------------------------------------------------------------------
# interpolation weight matrices (host-built, shape-static)
# ---------------------------------------------------------------------------

def _bspline3_kernel(t: np.ndarray) -> np.ndarray:
    at = np.abs(t)
    return np.where(
        at < 1.0, 2.0 / 3.0 - at * at + 0.5 * at ** 3,
        np.where(at < 2.0, ((2.0 - at) ** 3) / 6.0, 0.0))


def _mirror_index(idx: np.ndarray, n: int) -> np.ndarray:
    if n == 1:
        return np.zeros_like(idx)
    period = 2 * n - 2
    return np.abs(((idx % period) + period) % period - (n - 1)) * -1 + (n - 1)


def axis_weights(n_in: int, coords: np.ndarray, order: int,
                 outside: str = 'zero') -> np.ndarray:
    """Dense (n_out, n_in) interpolation matrix for sample positions
    ``coords`` (continuous input indices).

    order: 0 nearest (ITK RoundHalfIntegerUp), 1 linear, 3 cubic B-spline
    (apply to *prefiltered* coefficients).
    outside: 'zero' masks positions outside [-0.5, n_in-0.5) to 0 (ITK
    default-value semantics); 'edge' clamps coordinates (skimage mode=edge).
    """
    coords = np.asarray(coords, dtype=np.float64)
    n_out = coords.shape[0]
    inside = (coords >= -0.5) & (coords <= n_in - 0.5)
    if outside == 'edge':
        coords = np.clip(coords, 0.0, n_in - 1.0)
        inside = np.ones_like(inside)

    W = np.zeros((n_out, n_in), dtype=np.float64)
    if order == 0:
        idx = np.floor(coords + 0.5).astype(int)
        idx = np.clip(idx, 0, n_in - 1)
        W[np.arange(n_out), idx] = 1.0
    elif order == 1:
        base = np.floor(coords).astype(int)
        frac = coords - base
        for off, w in ((0, 1.0 - frac), (1, frac)):
            idx = _mirror_index(base + off, n_in)
            np.add.at(W, (np.arange(n_out), idx), w)
    elif order == 3:
        base = np.floor(coords).astype(int)
        for off in range(-1, 3):
            idx = base + off
            w = _bspline3_kernel(coords - idx)
            idx = _mirror_index(idx, n_in)
            np.add.at(W, (np.arange(n_out), idx), w)
    else:
        raise ValueError(f'Unsupported interpolation order: {order}')
    W *= inside[:, None]
    return W


def apply_separable(arr: jnp.ndarray, weights: Sequence[Optional[jnp.ndarray]],
                    axes: Sequence[int]) -> jnp.ndarray:
    """Apply per-axis weight matrices by matmul. ``weights[k]`` may be None
    (axis untouched)."""
    for W, ax in zip(weights, axes):
        if W is None:
            continue
        moved = jnp.moveaxis(arr, ax, -1)
        # HIGHEST: keep true fp32 accumulation on the MXU — interpolation
        # weights are numerically sensitive and these matmuls are small
        out = jnp.matmul(moved, W.T, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        arr = jnp.moveaxis(out, -1, ax)
    return arr


# ---------------------------------------------------------------------------
# array-level resize
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=('shape', 'order', 'outside', 'axes'))
def _resize_jit(arr: jnp.ndarray, shape: Tuple[int, ...], order: int,
                outside: str, axes: Tuple[int, ...]) -> jnp.ndarray:
    work = arr.astype(jnp.float32)
    if order == 3:
        pre_axes = [ax for k, ax in enumerate(axes) if arr.shape[ax] != shape[k]]
        if pre_axes:
            work = bspline_prefilter(work, pre_axes)
    weights = []
    for k, ax in enumerate(axes):
        n_in, n_out = arr.shape[ax], shape[k]
        if n_in == n_out:
            weights.append(None)
            continue
        scale = n_in / n_out
        coords = (np.arange(n_out) + 0.5) * scale - 0.5
        weights.append(jnp.asarray(axis_weights(n_in, coords, order, outside),
                                   dtype=jnp.float32))
    return apply_separable(work, weights, axes)


def resize_to_shape(arr: np.ndarray, shape: Sequence[int], order: int = 3,
                    outside: str = 'edge',
                    axes: Optional[Sequence[int]] = None) -> np.ndarray:
    """skimage/zoom half-pixel convention resize (nnU-Net preprocessing
    semantics: ``resize(..., order=3, mode='edge', anti_aliasing=False)``)."""
    if axes is None:
        axes = tuple(range(len(shape)))
    # device_put (raw transfer), never jnp.asarray: see CLAUDE.md conventions
    out = _resize_jit(jax.device_put(np.ascontiguousarray(arr)),
                      tuple(int(s) for s in shape), int(order), outside,
                      tuple(axes))
    return np.asarray(out)


# ---------------------------------------------------------------------------
# MedicalImage-level resample (ITK ResampleImageFilter semantics)
# ---------------------------------------------------------------------------

def resample(img: MedicalImage,
             spacing: Union[float, Sequence[float]],
             labels: Optional[bool] = None,
             size: Optional[Sequence[Optional[int]]] = None,
             order: Optional[int] = None,
             center: Optional[Sequence[float]] = None,
             center_position: Optional[Sequence[float]] = None,
             default_value: float = 0.0) -> MedicalImage:
    """Resample to a target spacing, mirroring the reference ``resample()``
    (image.py:293-372): auto output size ``int(0.5 + n*s_old/s_new)``,
    center-preserving origin, BSpline for intensities / NearestNeighbor for
    labels, uint8 forced to NN, identity transform.
    """
    d = img.dim
    spacing_new = [float(spacing)] * d if np.isscalar(spacing) else [float(s) for s in spacing]
    spacing_old = list(img.spacing)
    size_old = list(img.size)

    auto_size = [int(0.5 + size_old[i] * spacing_old[i] / spacing_new[i]) for i in range(d)]
    if size is None:
        size_new = auto_size
    else:
        size_new = [a if s is None else int(s) for s, a in zip(size, auto_size)]

    if center is not None and center_position is not None:
        raise ValueError('Either center or center_position may be specified - not both')
    if center_position is None:
        if center is None:
            center = np.multiply(size_old, 0.5)
        center_position = img.index_to_physical(np.asarray(center, dtype=int))

    # reference-grid origin such that the (integer) center index of the new
    # grid lands on center_position
    ref = MedicalImage(array=np.zeros(size_new[::-1], np.uint8),
                       spacing=tuple(spacing_new), origin=(0.0,) * d,
                       direction=img.direction.copy())
    c_idx = np.multiply(size_new, 0.5).astype(int)
    diff = ref.index_to_physical(c_idx) - np.zeros(d)
    origin_new = np.asarray(center_position, float) - diff

    if labels is None:
        labels = is_label_image(img)
    if order is None:
        order = 0 if labels else 3
    if img.array.dtype == np.uint8 and order != 0 and not labels:
        warn('uint8 images are resampled with nearest neighbor (label convention).')
        order = 0

    changed = (not np.allclose(spacing_new, spacing_old)
               or size_new != size_old
               or not np.allclose(origin_new, img.origin))
    if not changed:
        return img

    # per-axis affine map out index -> in index (identity transform, same
    # direction): in = (o_new - o_old + s_new * i) / s_old along each axis
    # of the direction basis
    delta = np.linalg.inv(img.direction) @ (origin_new - np.asarray(img.origin))
    out = _resample_axes(img.array, img.is_vector, d, size_old, size_new,
                         spacing_old, spacing_new, delta, int(order))

    out_dtype = np.uint8 if labels else img.array.dtype
    if np.issubdtype(out_dtype, np.integer):
        out = np.rint(out)
    arr = out.astype(out_dtype)
    return img.replace(array=arr, spacing=tuple(spacing_new),
                       origin=tuple(float(v) for v in origin_new))


@functools.partial(jax.jit, static_argnames=('pre_axes', 'axes'))
def _resample_exec(arr, weights, pre_axes, axes):
    """Module-level jitted executor so repeated resamples of the same
    shapes hit jax.jit's cache (a per-call closure would re-trace and
    re-compile every invocation)."""
    work = arr.astype(jnp.float32)
    if pre_axes:
        work = bspline_prefilter(work, list(pre_axes))
    return apply_separable(work, list(weights), list(axes))


def _resample_axes(array: np.ndarray, is_vector: bool, d: int,
                   size_old, size_new, spacing_old, spacing_new,
                   delta, order: int) -> np.ndarray:
    weights, axes = [], []
    for j in range(d):
        coords = (delta[j] + spacing_new[j] * np.arange(size_new[j])) / spacing_old[j]
        W = axis_weights(size_old[j], coords, order if size_old[j] > 1 else 0,
                         outside='zero')
        weights.append(jax.device_put(np.asarray(W, dtype=np.float32)))
        axes.append(d - 1 - j)
    pre_axes = tuple(d - 1 - j for j in range(d)
                     if order == 3 and size_old[j] > 1)
    out = _resample_exec(jax.device_put(np.ascontiguousarray(array)),
                         tuple(weights), pre_axes, tuple(axes))
    return np.asarray(out)


def resample_uniform(img: MedicalImage, **kwargs) -> MedicalImage:
    """Resample to isotropic spacing = the finest existing spacing
    (reference image.py:374-380)."""
    return resample(img, min(img.spacing), **kwargs)
