"""The inference engine: one fused device program per input shape.

TPU-native replacement for the whole nnU-Net predict path the reference runs
out-of-process (preprocess -> logits -> export, reference
prediction_worker.py:177-242). Everything between host numpy-in and host
numpy-out is a single jitted XLA program:

    normalize (plans schemes)
    -> resample to plan spacing  (B-spline prefilter + MXU weight matmuls)
    -> pad to tile grid
    -> tile×TTA-batched multi-fold U-Net forwards (chunked lax.scan)
       -> Gaussian-weighted overlap-add
    -> inverse-resample logits to the input grid (order 1)
    -> sigmoid>0.5 multilabel one-hot  (or softmax argmax)

Programs are cached per (input shape, dtype); the fold axis is a stacked
params pytree iterated with lax.map inside the program (vmap would lower the
convs to slow grouped convolutions). Mirror TTA and the sliding-window tiles
are batched together into each forward (batch = Tc * 2^len(mirror_axes),
see tiling.accumulate_tiles) — per-forward fixed cost dominates at small
batches on TPU.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.plans import ModelSpec
from ..models.unet import forward
from ..ops.gaussian import gaussian_map
from ..ops.normalize import nonzero_norm_mask, normalize_channels
from ..ops.resample import apply_separable, axis_weights, bspline_prefilter
from ..utils.jaxcache import enable_compilation_cache
from ..utils.logging import log
from .tiling import accumulate_tiles, pad_amounts, padded_shape, tile_positions


def _mirror_combos(axes: Sequence[int]) -> List[Tuple[int, ...]]:
    """All subsets of the allowed mirror axes (identity first).
    Axes are spatial: 0 = y, 1 = x."""
    combos: List[Tuple[int, ...]] = [()]
    for ax in axes:
        combos += [c + (ax,) for c in combos]
    return combos


def compute_new_shape(shape: Sequence[int], old_spacing: Sequence[float],
                      new_spacing: Sequence[float]) -> Tuple[int, ...]:
    """nnU-Net target shape: round(shape * old / new)."""
    return tuple(int(round(n * o / s))
                 for n, o, s in zip(shape, old_spacing, new_spacing))


class InferenceEngine:
    """Runs one model configuration (all folds) on preprocessed-2D inputs.

    Parameters
    ----------
    spec : ModelSpec parsed from plans.json/dataset.json
    fold_params : list of per-fold params pytrees (stacked internally)
    tile_step_size : sliding-window step as a fraction of the patch
        (reference default 0.5, `nnu.predict.stepsize`, nnu.py:143)
    use_mirroring : mirror test-time augmentation (reference
        `nnu.predict.augment`, nnu.py:155-156)
    """

    def __init__(self, spec: ModelSpec, fold_params: List[dict],
                 tile_step_size: float = 0.5, use_mirroring: bool = True,
                 dtype=jnp.float32, compute_dtype=None,
                 forward_batch_cap: int = 64):
        if not fold_params:
            raise ValueError('At least one fold is required')
        self.spec = spec
        self.n_folds = len(fold_params)
        self.tile_step_size = float(tile_step_size)
        self.use_mirroring = bool(use_mirroring)
        self.dtype = dtype
        self.compute_dtype = compute_dtype  # bf16 conv operands when set
        self.forward_batch_cap = int(forward_batch_cap)
        enable_compilation_cache()
        self.params = jax.tree_util.tree_map(
            lambda *xs: jnp.stack([jnp.asarray(x, dtype) for x in xs]), *fold_params)
        self._cache: Dict[Tuple, any] = {}
        # serving can call predict from concurrent request threads on the
        # per-model fallback path too: guard the program cache so one shape
        # compiles once (a duplicated compile costs minutes on remote TPUs)
        import threading
        self._cache_lock = threading.RLock()

    # -- program construction ------------------------------------------------

    def _build(self, in_shape: Tuple[int, int], in_spacing: Tuple[float, float]):
        """Compile the fused program for one (H, W) input shape. Spacing is
        in array order (y, x), matching plans.json."""
        spec = self.spec
        pre = spec.preprocess
        C = spec.arch.in_channels
        L = spec.arch.out_channels
        patch = tuple(pre.patch_size)

        rs_shape = compute_new_shape(in_shape, in_spacing, pre.spacing)
        pad_shape = padded_shape(rs_shape, patch)
        pads = pad_amounts(rs_shape, pad_shape)
        tiles = tile_positions(pad_shape, patch, self.tile_step_size)
        mirrors = _mirror_combos(spec.allowed_mirroring_axes
                                 if self.use_mirroring else ())
        gauss = jnp.asarray(gaussian_map(patch), self.dtype)[..., None]

        # host-built, shape-static interpolation matrices
        def _w(n_in, n_out, order):
            if n_in == n_out:
                return None
            coords = (np.arange(n_out) + 0.5) * (n_in / n_out) - 0.5
            return jnp.asarray(axis_weights(n_in, coords, order, outside='edge'),
                               self.dtype)

        w_down = [_w(in_shape[k], rs_shape[k], 3) for k in range(2)]
        w_up = [_w(rs_shape[k], in_shape[k], 1) for k in range(2)]
        tiles_j = jnp.asarray(tiles)

        n_mirror = len(mirrors)

        unet = functools.partial(forward, spec=spec.arch,
                                 compute_dtype=self.compute_dtype)

        def net_multifold(x):
            """(B, ph, pw, C) -> fold-averaged (B, ph, pw, L). lax.map over
            folds, not vmap: vmapped convs over stacked weights lower to
            grouped convolutions that run at a few percent of MXU peak."""
            outs = jax.lax.map(lambda p: unet(p, x), self.params)
            return jnp.mean(outs, axis=0)

        needs_mask = any(pre.use_mask_for_norm)

        def program(arr, nz_mask=None):
            # arr: (H, W, C) float32, already cropped on host; fold-stacked
            # weights are closed over (they live on device across calls).
            # nz_mask: host-computed create_nonzero_mask (holes filled) for
            # plans with use_mask_for_norm
            work = arr.astype(self.dtype)
            # 1. normalize per channel (plans schemes)
            work = normalize_channels(work, pre, nz_mask)
            # 2. resample to plan spacing (cubic)
            if any(w is not None for w in w_down):
                pref = bspline_prefilter(work, [k for k in range(2)
                                                if w_down[k] is not None])
                work = apply_separable(pref, w_down, axes=(0, 1))
            # 3. pad to tile grid
            work = jnp.pad(work, pads + [(0, 0)])
            # 4. sliding window + TTA + fold ensemble + gaussian accumulate,
            #    with all tiles' TTA mirrors batched into large forwards
            acc0 = jnp.zeros(pad_shape + (L,), self.dtype)
            wacc0 = jnp.zeros(pad_shape + (1,), self.dtype)
            acc, wacc = accumulate_tiles(
                work, tiles_j, jnp.ones((len(tiles), 1), self.dtype),
                net_multifold, acc0, wacc0, patch=patch, mirrors=mirrors,
                gauss=gauss, chunk_cap=self.forward_batch_cap)
            logits = acc / jnp.maximum(wacc, 1e-8)
            # 5. unpad to resampled shape
            logits = jax.lax.slice(
                logits, (pads[0][0], pads[1][0], 0),
                (pads[0][0] + rs_shape[0], pads[1][0] + rs_shape[1], L))
            # 6. inverse-resample logits to the input grid (order 1, like
            #    nnU-Net's resampling_fn_probabilities)
            if any(w is not None for w in w_up):
                logits = apply_separable(logits, w_up, axes=(0, 1))
            # 7. decision rule
            if spec.multilabel:
                seg = (jax.nn.sigmoid(logits) > 0.5).astype(jnp.uint8)
            else:
                seg = jnp.argmax(logits, axis=-1).astype(jnp.uint8)
            return seg, logits

        jitted = jax.jit(program)
        meta = {'rs_shape': rs_shape, 'pad_shape': pad_shape,
                'n_tiles': len(tiles), 'n_mirror': n_mirror,
                'needs_mask': needs_mask}
        return jitted, meta

    def _program(self, in_shape, in_spacing):
        key = (tuple(in_shape), tuple(round(float(s), 6) for s in in_spacing))
        with self._cache_lock:
            hit = self._cache.get(key)
            if hit is None:
                hit = self._build(tuple(in_shape), tuple(in_spacing))
                self._cache[key] = hit
                log(f'compiled inference program for shape={key[0]} '
                    f'spacing={key[1]} ({hit[1]["n_tiles"]} tiles, '
                    f'{hit[1]["n_mirror"]} mirrors, {self.n_folds} folds)',
                    once=False)
        return hit

    # -- host API --------------------------------------------------------

    def predict_array(self, arr: np.ndarray, spacing_yx: Sequence[float],
                      return_logits: bool = False):
        """Predict a (H, W, C) float array with array-order (y, x) spacing.
        Returns (H, W) labels or (H, W, L) multilabel one-hot uint8."""
        if arr.ndim == 2:
            arr = arr[..., None]
        if arr.shape[-1] != self.spec.arch.in_channels:
            raise ValueError(
                f'Input has {arr.shape[-1]} channels; the model expects '
                f'{self.spec.arch.in_channels}')
        # crop to nonzero bounding box (nnU-Net crop_to_nonzero)
        bbox = _nonzero_bbox(arr)
        (y0, y1), (x0, x1) = bbox
        cropped = arr[y0:y1, x0:x1]

        fn, meta = self._program(cropped.shape[:2], spacing_yx)
        # device_put (raw transfer), cast happens inside the program
        args = (jax.device_put(np.ascontiguousarray(cropped)),)
        if meta['needs_mask']:
            args += (jax.device_put(nonzero_norm_mask(cropped)),)
        seg_c, logits_c = fn(*args)
        seg_c = np.asarray(jax.device_get(seg_c))

        full_shape = arr.shape[:2] + (seg_c.shape[-1:] if seg_c.ndim == 3 else ())
        if seg_c.shape[:2] != arr.shape[:2]:
            seg = np.zeros(full_shape, np.uint8)
            seg[y0:y1, x0:x1] = seg_c
        else:
            seg = seg_c
        if return_logits:
            return seg, np.asarray(jax.device_get(logits_c)), bbox
        return seg

    def warmup(self, in_shape: Sequence[int],
               in_spacing: Optional[Sequence[float]] = None) -> None:
        """Pre-compile + execute once for a given shape (the engine-level
        equivalent of the reference's 'startup' dummy predict,
        prediction_worker.py:74-96)."""
        if in_spacing is None:
            in_spacing = self.spec.preprocess.spacing
        dummy = np.zeros(tuple(in_shape) + (self.spec.arch.in_channels,),
                         np.float32)
        self.predict_array(dummy, in_spacing)


def _nonzero_bbox(arr: np.ndarray) -> Tuple[Tuple[int, int], Tuple[int, int]]:
    """Bounding box of non-zero voxels over all channels; the full image if
    everything is zero."""
    mask = np.any(arr != 0, axis=-1) if arr.ndim == 3 else (arr != 0)
    ys, xs = np.nonzero(mask)
    if ys.size == 0:
        return (0, arr.shape[0]), (0, arr.shape[1])
    return ((int(ys.min()), int(ys.max()) + 1),
            (int(xs.min()), int(xs.max()) + 1))
