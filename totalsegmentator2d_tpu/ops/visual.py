"""2D visualization rendering (PNG export path).

Equivalent of the reference's ``create_visual`` (image.py:383-453): reduce to
2D via projection, then either label->RGB with a palette recovered from the
Segment metadata, or intensity windowing to uint8. The colorization /
windowing math runs as jnp ops.
"""

from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..io.image import MedicalImage, is_label_image
from ..utils.colors import to_palette
from ..utils.logging import warn
from .annotations import get_annotation_labels
from .geometry import axis_name_to_index, reduce_dimensions, reorient
from .normalize import auto_window, intensity_window
from .projection import flatten_vector_max, project
from .resample import resample_uniform


def label_to_rgb(arr: np.ndarray, palette: list) -> np.ndarray:
    """Map integer labels to RGB via a dense palette (index 0 = background).
    Labels beyond the palette wrap around (ITK LabelToRGB recycles colors);
    with no palette at all, the deterministic default palette is used (the
    reference's sitk.LabelToRGB falls back to ITK's built-in colormap)."""
    pal = np.asarray(palette, dtype=np.uint8)
    if len(pal) <= 1:
        from ..utils.colors import default_palette
        max_label = int(np.max(arr)) if arr.size else 0
        pal = np.asarray([[255, 255, 255]] + default_palette(max(max_label, 1)),
                         dtype=np.uint8)
    labels = jax.device_put(np.ascontiguousarray(arr)).astype(jnp.int32)
    ncol = pal.shape[0] - 1
    idx = jnp.where(labels <= 0, 0,
                    (labels - 1) % jnp.maximum(ncol, 1) + 1 if ncol > 0 else 0)
    rgb = jnp.take(jnp.asarray(pal), idx, axis=0)
    return np.asarray(rgb)


def create_visual(img: MedicalImage, mode: str = 'max',
                  axis: Union[int, str] = -1,
                  window=None, labels: Optional[bool] = None,
                  palette=None) -> MedicalImage:
    """Render an n-D image to a 2D RGB/uint8 visual (reference
    image.py:383-453)."""
    try:
        if labels is None:
            labels = bool(palette) or is_label_image(img)
    except Exception:
        labels = False

    if labels and not palette:
        try:
            palette = {}
            for name, info in get_annotation_labels(img).items():
                if info.get('value') is not None and info.get('color') is not None:
                    palette[int(info['value'])] = info['color']
        except Exception as ex:
            warn(f'Failed to extract palette from image metadata: {ex}')
            palette = None

    img = reorient(img)
    _axis = axis_name_to_index(axis) if isinstance(axis, str) else (axis if axis is not None else -1)
    while True:
        img = reduce_dimensions(img, min_dims=2)
        if img.dim <= 2:
            break
        _axis = -1 if abs(_axis) > img.dim else _axis
        img = project(img, mode=mode, axis=_axis)

    if labels:
        pal = to_palette(palette) if palette is not None else []
        if img.ncomponents > 1:
            img = flatten_vector_max(img, index=True)
            img = img.replace(array=np.clip(img.array, 0, 255).astype(np.uint8))
        img = resample_uniform(img, labels=True)
        rgb = label_to_rgb(img.array, pal)
        return img.replace(array=rgb, is_vector=True, meta={})

    img = resample_uniform(img, labels=False)
    win = window if (window is not None and not isinstance(window, str)) else \
        auto_window(img.array, window)
    lower, upper = win
    if lower is None:
        lower = float(np.min(img.array))
    if upper is None:
        upper = float(np.max(img.array))
    arr = img.array
    if img.ncomponents > 1:
        arr = np.linalg.norm(arr.astype(np.float32), axis=-1)  # VectorMagnitude
    out = np.asarray(intensity_window(
        jax.device_put(np.ascontiguousarray(arr)), lower, upper)).astype(np.uint8)
    return img.replace(array=out, is_vector=False, meta={})
