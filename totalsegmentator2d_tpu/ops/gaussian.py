"""Gaussian importance map for sliding-window blending.

nnU-Net weights every predicted tile with a Gaussian centered on the patch so
overlapping tiles blend smoothly (the reference delegates this to
``predict_logits_from_preprocessed_data``, prediction_worker.py:209). The map
is separable, so it is computed analytically per axis: sigma = patch/8,
normalized to max 1, floored at the smallest positive value so no tile pixel
has zero weight.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np


@functools.lru_cache(maxsize=64)
def gaussian_map(patch_size: Tuple[int, ...], sigma_scale: float = 0.125,
                 dtype=np.float32) -> np.ndarray:
    axes = []
    for n in patch_size:
        sigma = max(n * sigma_scale, 1e-8)
        center = (n - 1) / 2.0
        x = np.arange(n, dtype=np.float64)
        axes.append(np.exp(-0.5 * ((x - center) / sigma) ** 2))
    g = functools.reduce(np.multiply.outer, axes)
    g = g / g.max()
    g = np.maximum(g, g[g > 0].min())
    return g.astype(dtype)
