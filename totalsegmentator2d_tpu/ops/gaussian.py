"""Gaussian importance map for sliding-window blending.

nnU-Net weights every predicted tile with a Gaussian centered on the patch so
overlapping tiles blend smoothly (the reference delegates this to
``predict_logits_from_preprocessed_data``, prediction_worker.py:209). nnU-Net
builds it by Gaussian-filtering a delta placed at ``n // 2`` (NOT the
geometric center ``(n - 1) / 2``) with sigma = patch/8, mode='constant' —
i.e. the separable sampled kernel truncated at radius ``int(4*sigma + 0.5)``
— then normalizes to max 1 and floors exact zeros at the smallest positive
value so no tile pixel has zero weight. Reproduced exactly here (verified
against the scipy construction in tools/parity.py check 'gaussian-window').
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
        radius = int(4.0 * sigma + 0.5)
        x = np.arange(n, dtype=np.float64) - (n // 2)
        vals = np.exp(-0.5 * (x / sigma) ** 2)
        vals[np.abs(x) > radius] = 0.0
        axes.append(vals)
    g = functools.reduce(np.multiply.outer, axes)
    g = g / g.max()
    if np.any(g > 0):
        g[g == 0] = g[g > 0].min()
    return g.astype(dtype)
