"""Intensity projections (the MIP/AIP front-end of the TS2D pipeline).

Device-side jnp kernels plus MedicalImage wrappers with ITK-compatible
geometry semantics, replacing the ITK projection filters the reference drives
in image.py:46-101. Mode set matches the reference dispatch table:
first / max|mip / min / avg|mean / median / std / depth / multiclass /
slice[:pos] ('xr' is rejected the same way).

Geometry: the projected axis keeps size 1 and absorbs the full physical
extent (out_spacing[axis] = in_spacing[axis] * in_size[axis]) — this is what
ITK's ProjectionImageFilter produces and what the bundled pre-projected
sample (403.5 mm thickness = 269 * 1.5 mm, SURVEY.md §4) confirms. The origin
is reset to the input origin on the projected axis (reference
image.py:97-100).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..io.image import MedicalImage
from ..utils.params import parse_float
from .geometry import axis_name_to_index

#: modes whose jnp kernel is a plain axis reduction
_REDUCTIONS = {
    'max': lambda a, ax: jnp.max(a, axis=ax),
    'mip': lambda a, ax: jnp.max(a, axis=ax),
    'min': lambda a, ax: jnp.min(a, axis=ax),
    'avg': lambda a, ax: jnp.mean(a, axis=ax),
    'mean': lambda a, ax: jnp.mean(a, axis=ax),
    'median': lambda a, ax: jnp.median(a, axis=ax),
    # ITK StandardDeviationProjectionImageFilter uses the unbiased (N-1) form
    'std': lambda a, ax: jnp.std(a, axis=ax, ddof=1),
}


def project_array(arr: jnp.ndarray, mode: str, axis: int) -> jnp.ndarray:
    """Project a jnp array along ``axis`` (kept as size 1). jit-friendly."""
    mode = str(mode).lower().strip()
    if mode in _REDUCTIONS:
        out = _REDUCTIONS[mode](arr.astype(jnp.float32) if mode in
                                ('avg', 'mean', 'median', 'std') else arr, axis)
        return jnp.expand_dims(out, axis)
    if mode in ('first', 'depth'):
        return _project_first(arr, axis)
    if mode == 'xr':
        raise NotImplementedError(
            'Synthetic XR projection from 3D images is not supported.')
    raise ValueError(f'Unsupported projection mode: {mode}')


def project_array_np(arr: np.ndarray, mode: str, axis: int) -> np.ndarray:
    """Host (numpy) mirror of :func:`project_array`. Projections are one
    memory-bound pass over the volume; on remote-attached accelerators the
    volume upload costs far more than the host reduction (~50 ms for a
    49 MB torso CT), so the serving path projects on the host and uploads
    only the small 2D result."""
    mode = str(mode).lower().strip()
    if mode in ('max', 'mip'):
        return np.expand_dims(np.max(arr, axis=axis), axis)
    if mode == 'min':
        return np.expand_dims(np.min(arr, axis=axis), axis)
    if mode in ('avg', 'mean'):
        if arr.ndim == 3 and axis == 1:
            # int16 CTs: the native fused kernel's int64-sum mean is both
            # EXACT and faster than numpy's pairwise float32 (6.7 vs
            # 9.6 ms on a torso volume) — and keeps the per-mode path
            # numerically identical to the fused multi-mode path
            from ..io.native import project_max_mean
            res = project_max_mean(np.ascontiguousarray(arr))
            if res is not None:
                return np.expand_dims(res[1], 1)
        return np.expand_dims(
            np.mean(arr, axis=axis, dtype=np.float32).astype(np.float32), axis)
    if mode == 'median':
        return np.expand_dims(
            np.median(arr.astype(np.float32), axis=axis), axis).astype(np.float32)
    if mode == 'std':
        return np.expand_dims(
            np.std(arr.astype(np.float32), axis=axis, ddof=1), axis).astype(np.float32)
    if mode in ('first', 'depth'):
        idx = np.argmax(arr != 0, axis=axis, keepdims=True)
        return np.take_along_axis(arr, idx, axis=axis)
    if mode == 'xr':
        raise NotImplementedError(
            'Synthetic XR projection from 3D images is not supported.')
    raise ValueError(f'Unsupported projection mode: {mode}')


def project_arrays_np(arr: np.ndarray, modes: Sequence[str],
                      axis: int) -> List[np.ndarray]:
    """Several projection modes of one volume, fused into ONE pass over the
    array where possible. The serving path needs both ts2d channels (MIP +
    AIP); the native kernel (csrc ts2dio_project_max_mean_*) computes them
    together, halving the memory traffic of per-mode numpy reductions
    (~15 -> ~7 ms on a 49 MB torso CT). Fused outputs are float32 (the
    engine consumes float32 regardless); per-mode numpy fallback keeps
    project_array_np's dtype semantics. Mean differs from numpy's pairwise
    float32 sum by ~1e-6 relative (double accumulation)."""
    modes_l = [str(m).lower().strip() for m in modes]
    if (axis == 1 and arr.ndim == 3 and len(modes_l) > 1
            and set(modes_l) <= {'max', 'mip', 'avg', 'mean'}):
        from ..io.native import project_max_mean
        res = project_max_mean(np.ascontiguousarray(arr))
        if res is not None:
            mx, mn = res
            by = {'max': mx, 'mip': mx, 'avg': mn, 'mean': mn}
            return [np.expand_dims(by[m], 1) for m in modes_l]
    return [project_array_np(arr, m, axis) for m in modes_l]


def project_multi(img: MedicalImage, modes: Sequence[str],
                  axis: Union[int, str] = -1) -> List[MedicalImage]:
    """`project` for several modes at once (fused single pass when the
    native kernel applies), float32 outputs — the fused-ensemble dispatch
    path's projection primitive. Modes outside the plain reduction set
    (parameterized `slice:`/`multiclass:`, median, std, ...) go through the
    full `project` dispatch per mode, so every channel mode `project`
    supports works here too."""
    modes_l = [str(m).lower().strip() for m in modes]
    if not set(modes_l) <= {'max', 'mip', 'min', 'avg', 'mean'}:
        return [project(img, mode=m, axis=axis).astype(np.float32)
                for m in modes_l]
    itk_axis = axis_name_to_index(axis) if isinstance(axis, str) else \
        list(range(img.dim))[axis]
    np_axis = img.dim - 1 - itk_axis
    outs = project_arrays_np(img.array, modes_l, np_axis)
    return [_projected_image(img, np.asarray(o, np.float32), itk_axis)
            for o in outs]


def _project_first(arr: jnp.ndarray, axis: int) -> jnp.ndarray:
    """First non-zero value along the axis (reference image.py:141-153)."""
    nonzero = arr != 0
    idx = jnp.argmax(nonzero, axis=axis, keepdims=True)
    return jnp.take_along_axis(arr, idx, axis=axis)


def project(img: MedicalImage, mode: str = 'max',
            axis: Union[int, str] = -1, backend: str = 'host') -> MedicalImage:
    """Project a MedicalImage along an axis, handling geometry like the
    reference's ``project()`` (image.py:46-101).

    :param backend: 'host' (numpy, default — see project_array_np on why)
        or 'device' (upload + jnp reduction; useful when the volume is
        consumed on-device anyway)
    """
    itk_axis = axis_name_to_index(axis) if isinstance(axis, str) else \
        list(range(img.dim))[axis]
    mode = str(mode).lower().strip()
    mode, *param = f'{mode}:'.split(':')[:-1]

    if mode == 'xr':
        raise NotImplementedError(
            'Synthetic XR projection from 3D images is not supported.')
    if mode == 'slice':
        return extract_slice_factor(img, pos=_slice_pos(param[0]), axis=itk_axis)
    if mode == 'multiclass':
        return _project_multiclass(img, num=int(param[0]) if param else None,
                                   axis=itk_axis)

    np_axis = img.dim - 1 - itk_axis  # channel tail (if any) is after spatial
    if backend == 'host':
        out = project_array_np(img.array, mode, np_axis)
    else:
        dev = jax.device_put(np.ascontiguousarray(img.array))
        out = np.asarray(project_array(dev, mode, np_axis))
    return _projected_image(img, out, itk_axis)


def make_projected_image(img: MedicalImage, arr: np.ndarray, itk_axis: int,
                         is_vector: Optional[bool] = None) -> MedicalImage:
    """Wrap an already-projected array (size-1 along ``itk_axis``) with the
    geometry ``project`` would produce — used when the projection itself ran
    inside a fused device program."""
    return _projected_image(img, arr, itk_axis, is_vector)


def _projected_image(img: MedicalImage, arr: np.ndarray, itk_axis: int,
                     is_vector: Optional[bool] = None) -> MedicalImage:
    spacing = list(img.spacing)
    spacing[itk_axis] = spacing[itk_axis] * img.size[itk_axis]
    return img.replace(array=arr, spacing=tuple(spacing),
                       is_vector=img.is_vector if is_vector is None else is_vector)


def _slice_pos(pos: str) -> float:
    factor = parse_float(pos, err=None)
    if factor is None:
        factor = {'first': 0.0, 'middle': 0.5, 'last': 1.0}.get(pos)
    if factor is None:
        raise ValueError(f'Invalid slice position: {pos}')
    return factor


def extract_slice_index(img: MedicalImage, index: int, axis: int = -1) -> MedicalImage:
    """Extract one slice, keeping the axis at size 1 (reference image.py:103-128)."""
    dim = img.dim
    axis = list(range(dim))[axis]
    n = img.size[axis]
    if not (0 <= index < n):
        raise ValueError(f'Slice index outside the available range: [0, {n - 1}]')
    np_axis = dim - 1 - axis
    arr = np.take(img.array, [index], axis=np_axis)
    origin = np.asarray(img.origin, float)
    step = np.zeros(dim)
    step[axis] = index
    origin = img.index_to_physical(step)
    return img.replace(array=arr, origin=tuple(origin))


def extract_slice_factor(img: MedicalImage, pos: float, axis: int = -1) -> MedicalImage:
    n = img.size[list(range(img.dim))[axis]]
    index = int(np.clip(np.round(n * pos), 0, n - 1))
    return extract_slice_index(img, index=index, axis=axis)


def _project_multiclass(img: MedicalImage, num: Optional[int], axis: int) -> MedicalImage:
    """One-hot binary projection of a label volume: channel k marks where
    label k+1 occurs anywhere along the axis (reference image.py:164-193)."""
    np_axis = img.dim - 1 - axis
    if img.ncomponents == 1:
        if num is None:
            raise ValueError('multiclass projection needs a channel count, '
                             "use mode 'multiclass:<num>'")
        arr = jax.device_put(np.ascontiguousarray(img.array))
        labels = jnp.arange(1, num + 1)
        onehot = (arr[..., None] == labels).any(axis=np_axis, keepdims=True)
        out = np.asarray(onehot.astype(jnp.uint8))
        return _projected_image(img, out, axis, is_vector=True)
    # already multichannel: max-project each channel
    dev = jax.device_put(np.ascontiguousarray(img.array))
    out = np.asarray(jnp.max(dev, axis=np_axis, keepdims=True))
    return _projected_image(img, out, axis)


def flatten_vector_max(img: MedicalImage, index: bool = False) -> MedicalImage:
    """Collapse a vector image to a single channel: per-voxel max over
    components, or (``index=True``) the 1-based index of the *last* non-zero
    component, 0 where all components are zero (reference image.py:266-290)."""
    if img.ncomponents <= 1:
        return img
    arr = jax.device_put(np.ascontiguousarray(img.array))
    if index:
        nz = arr != 0
        # last non-zero component, 1-based; 0 when none
        comp = jnp.arange(1, arr.shape[-1] + 1)
        out = jnp.max(jnp.where(nz, comp, 0), axis=-1)
        out = np.asarray(out)
    else:
        out = np.asarray(jnp.max(arr, axis=-1))
    return img.replace(array=out.astype(img.array.dtype if not index else np.int64),
                       is_vector=False)
