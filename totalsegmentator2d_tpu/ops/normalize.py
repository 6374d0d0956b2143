"""Intensity normalization & windowing.

nnU-Net-style per-channel normalization schemes (driven by plans.json, the
same schema the reference's external preprocessor consumes — reference
prediction_worker.py:194-200) plus the visual windowing helpers
(reference image.py:438-481).

All kernels are pure jnp functions safe to fuse under jit.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


def ct_normalize(x: jnp.ndarray, mean: float, std: float,
                 lower: float, upper: float) -> jnp.ndarray:
    """nnU-Net CTNormalization: clip to the dataset's foreground intensity
    percentile bounds, then z-score with dataset statistics."""
    x = jnp.clip(x.astype(jnp.float32), lower, upper)
    return (x - mean) / jnp.maximum(std, 1e-8)


def zscore_normalize(x: jnp.ndarray, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """nnU-Net ZScoreNormalization. With a mask (use_mask_for_norm), the
    statistics come from masked voxels and ONLY those voxels are normalized
    — out-of-mask voxels keep their original value (zeros after the crop),
    exactly like nnU-Net's ``image[mask] = (image[mask] - mean) / std``."""
    x = x.astype(jnp.float32)
    if mask is None:
        mean = jnp.mean(x)
        std = jnp.std(x)
        return (x - mean) / jnp.maximum(std, 1e-8)
    m = mask.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(m), 1.0)
    mean = jnp.sum(x * m) / denom
    var = jnp.sum(jnp.square(x - mean) * m) / denom
    std = jnp.sqrt(var)
    return jnp.where(mask, (x - mean) / jnp.maximum(std, 1e-8), x)


def normalize_channels(work: jnp.ndarray, pre,
                       nz_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Per-channel plans-driven normalization of an (..., C) image.
    ``nz_mask``: the nonzero-crop mask used when a channel's
    use_mask_for_norm is set (callers compute it host-side with
    binary_fill_holes to match nnU-Net's create_nonzero_mask)."""
    C = work.shape[-1]
    chans = []
    for c in range(C):
        scheme = (pre.normalization_schemes[c]
                  if c < len(pre.normalization_schemes) else 'zscore')
        props = (pre.intensity_properties[c]
                 if c < len(pre.intensity_properties) else None)
        use_mask = (c < len(pre.use_mask_for_norm)
                    and pre.use_mask_for_norm[c])
        if use_mask and 'zscore' in scheme.lower() and nz_mask is not None:
            chans.append(zscore_normalize(work[..., c], mask=nz_mask))
        else:
            chans.append(apply_scheme(work[..., c], scheme, props))
    return jnp.stack(chans, axis=-1)


def nonzero_norm_mask(arr) -> 'jnp.ndarray':
    """Host-side nnU-Net create_nonzero_mask: any-channel nonzero, holes
    filled (scipy binary_fill_holes)."""
    import numpy as np
    from scipy.ndimage import binary_fill_holes
    a = np.asarray(arr)
    mask = np.any(a != 0, axis=-1) if a.ndim == 3 else (a != 0)
    return binary_fill_holes(mask)


def rescale_01_normalize(x: jnp.ndarray) -> jnp.ndarray:
    """nnU-Net Rescale01Normalization (used by some X-ray configs)."""
    x = x.astype(jnp.float32)
    lo, hi = jnp.min(x), jnp.max(x)
    return (x - lo) / jnp.maximum(hi - lo, 1e-8)


def apply_scheme(x: jnp.ndarray, scheme: str, props: Optional[dict]) -> jnp.ndarray:
    """Dispatch by nnU-Net normalization scheme class name."""
    s = (scheme or '').lower()
    if 'ct' in s:
        p = props or {}
        return ct_normalize(
            x,
            mean=float(p.get('mean', 0.0)),
            std=float(p.get('std', 1.0)),
            lower=float(p.get('percentile_00_5', -1024.0)),
            upper=float(p.get('percentile_99_5', 3071.0)))
    if 'rescale' in s:
        return rescale_01_normalize(x)
    if 'nonorm' in s or 'no_norm' in s:
        return x.astype(jnp.float32)
    # default: z-score (nnU-Net 'ZScoreNormalization')
    return zscore_normalize(x)


def intensity_window(x: jnp.ndarray, lower: float, upper: float,
                     out_min: float = 0.0, out_max: float = 255.0) -> jnp.ndarray:
    """sitk.IntensityWindowing equivalent: linear map [lower, upper] ->
    [out_min, out_max], clipped."""
    x = x.astype(jnp.float32)
    scale = (out_max - out_min) / jnp.maximum(upper - lower, 1e-12)
    return jnp.clip((x - lower) * scale + out_min, out_min, out_max)


def auto_window(arr: np.ndarray, method: Optional[str] = None) -> Tuple[float, float]:
    """Auto intensity window: 'minmax' or percentile 'pcN' / 'pcA-B'
    (reference image.py:458-481)."""
    method = (method or 'minmax').lower()
    if method == 'minmax':
        return float(np.min(arr)), float(np.max(arr))
    if method.startswith('pc'):
        spec = method[2:]
        try:
            if '-' in spec:
                pc = tuple(float(a) for a in spec.split('-'))
            else:
                v = float(spec)
                pc = (v, 100.0 - v)
        except ValueError as ex:
            raise ValueError(f'Failed to parse percentile window: {method}') from ex
        if len(pc) != 2:
            raise ValueError(f'Percentile window needs exactly two values: {method}')
        lo, hi = np.percentile(arr, pc)
        return float(lo), float(hi)
    raise ValueError(f'Unknown windowing method: {method}')
