"""Sliding-window tile grids (nnU-Net semantics, static shapes).

The reference delegates tiling to nnU-Net's
``predict_sliding_window_return_logits`` (prediction_worker.py:209, step size
configured at nnu.py:153-154). Here the grid is computed on the host per
compiled shape — positions become constants inside the jitted program, so
the device loop is a static ``lax.scan`` with dynamic-slice/update-slice.
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import numpy as np


def compute_steps_1d(image_size: int, patch_size: int, step_frac: float) -> List[int]:
    """Evenly spread tile start positions covering [0, image_size - patch]
    with stride <= patch * step_frac (nnU-Net compute_steps_for_sliding_window)."""
    assert image_size >= patch_size
    if image_size == patch_size:
        return [0]
    target = patch_size * step_frac
    num = int(math.ceil((image_size - patch_size) / target)) + 1
    actual = (image_size - patch_size) / max(num - 1, 1)
    return [int(round(actual * i)) for i in range(num)]


def tile_positions(image_shape: Sequence[int], patch_size: Sequence[int],
                   step_frac: float = 0.5) -> np.ndarray:
    """All (y, x) tile origins as an (T, 2) int array."""
    steps = [compute_steps_1d(int(n), int(p), step_frac)
             for n, p in zip(image_shape, patch_size)]
    grid = [(y, x) for y in steps[0] for x in steps[1]]
    return np.asarray(grid, dtype=np.int32)


def padded_shape(shape: Sequence[int], patch_size: Sequence[int]) -> Tuple[int, ...]:
    """Pad the resampled image up to at least the patch size (nnU-Net pads
    symmetrically with zeros before sliding-window prediction)."""
    return tuple(max(int(n), int(p)) for n, p in zip(shape, patch_size))


def pad_amounts(shape: Sequence[int], target: Sequence[int]) -> List[Tuple[int, int]]:
    """Symmetric (before, after) pad widths per axis, nnU-Net `pad_nd_image`
    convention: before = total // 2."""
    out = []
    for n, t in zip(shape, target):
        total = int(t) - int(n)
        out.append((total // 2, total - total // 2))
    return out
