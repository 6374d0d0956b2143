"""Independent offline reimplementation of the reference predict chain.

The reference runs nnU-Net's preprocess -> sliding-window logits -> export
pipeline out of process (reference prediction_worker.py:194-221, tile/TTA
configuration nnu.py:149-166). This module re-builds that chain from its
published semantics using ONLY numpy + scipy + torch — none of the
framework's device code — so the composed framework path
(InferenceEngine/EnsembleEngine) can be validated end-to-end against an
oracle that shares no implementation with it:

    crop_to_nonzero -> per-channel normalization -> order-3 half-pixel
    'edge' resize to plan spacing (scipy) -> symmetric pad -> nnU-Net
    sliding-window steps -> per-tile mirror-TTA torch forwards, fold
    averaged -> scipy-built Gaussian-weighted overlap-add -> unpad ->
    order-1 inverse resize of LOGITS -> sigmoid>0.5 / argmax -> re-embed.

Consumed by tests/test_019_full_chain_parity.py and the ``full-chain``
check in tools/parity.py.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np
import scipy.ndimage as ndi


# ---------------------------------------------------------------------------
# preprocessing (nnU-Net DefaultPreprocessor semantics, numpy/scipy only)
# ---------------------------------------------------------------------------

def nonzero_bbox(arr: np.ndarray) -> Tuple[Tuple[int, int], Tuple[int, int]]:
    mask = np.any(arr != 0, axis=-1)
    ys, xs = np.nonzero(mask)
    if ys.size == 0:
        return (0, arr.shape[0]), (0, arr.shape[1])
    return ((int(ys.min()), int(ys.max()) + 1),
            (int(xs.min()), int(xs.max()) + 1))


def normalize(arr: np.ndarray, pre, mask: Optional[np.ndarray]) -> np.ndarray:
    """Per-channel plans-driven normalization (numpy)."""
    out = np.empty(arr.shape, np.float32)
    for c in range(arr.shape[-1]):
        x = arr[..., c].astype(np.float32)
        scheme = (pre.normalization_schemes[c]
                  if c < len(pre.normalization_schemes) else 'zscore').lower()
        props = (pre.intensity_properties[c]
                 if c < len(pre.intensity_properties) else None) or {}
        use_mask = (c < len(pre.use_mask_for_norm)
                    and pre.use_mask_for_norm[c])
        if 'ct' in scheme:
            x = np.clip(x, float(props.get('percentile_00_5', -1024.0)),
                        float(props.get('percentile_99_5', 3071.0)))
            x = (x - float(props.get('mean', 0.0))) / \
                max(float(props.get('std', 1.0)), 1e-8)
        elif 'rescale' in scheme:
            lo, hi = x.min(), x.max()
            x = (x - lo) / max(hi - lo, 1e-8)
        elif use_mask and mask is not None:
            v = x[mask]
            mean, std = v.mean(), v.std()
            x = x.copy()
            x[mask] = (v - mean) / max(std, 1e-8)
        else:
            x = (x - x.mean()) / max(x.std(), 1e-8)
        out[..., c] = x
    return out


def resize(arr: np.ndarray, new_shape: Tuple[int, int],
           order: int) -> np.ndarray:
    """Half-pixel resize of the two leading axes via scipy map_coordinates
    (the skimage resize(anti_aliasing=False) coordinate convention nnU-Net's
    resampling uses): sampling coordinates outside the grid clamp to the
    edge, interpolation runs on the mirror-extended signal."""
    H, W = arr.shape[:2]
    ny, nx = new_shape
    if (ny, nx) == (H, W):
        return arr.astype(np.float32)
    cy = (np.arange(ny) + 0.5) * (H / ny) - 0.5
    cx = (np.arange(nx) + 0.5) * (W / nx) - 0.5
    cy = np.clip(cy, 0, H - 1)
    cx = np.clip(cx, 0, W - 1)
    grid = np.meshgrid(cy, cx, indexing='ij')
    chans = [ndi.map_coordinates(arr[..., c].astype(np.float64), grid,
                                 order=order, mode='mirror')
             for c in range(arr.shape[-1])]
    return np.stack(chans, axis=-1).astype(np.float32)


# ---------------------------------------------------------------------------
# sliding window machinery (nnU-Net predict_sliding_window semantics)
# ---------------------------------------------------------------------------

def sliding_steps(image_size: int, tile: int, step_frac: float) -> List[int]:
    """nnU-Net compute_steps_for_sliding_window."""
    if image_size == tile:
        return [0]
    target = tile * step_frac
    num = int(np.ceil((image_size - tile) / target)) + 1
    actual = (image_size - tile) / max(num - 1, 1)
    return [int(round(actual * i)) for i in range(num)]


def gaussian_importance(patch: Tuple[int, int]) -> np.ndarray:
    """nnU-Net compute_gaussian: filtered center delta, sigma=patch/8,
    normalized to max 1, zeros raised to the positive minimum."""
    delta = np.zeros(patch, np.float32)
    delta[tuple(p // 2 for p in patch)] = 1.0
    g = ndi.gaussian_filter(delta, sigma=[p / 8 for p in patch],
                            mode='constant')
    g /= g.max()
    g[g == 0] = g[g > 0].min()
    return g.astype(np.float32)


def mirror_combos(axes: Sequence[int]) -> List[Tuple[int, ...]]:
    combos: List[Tuple[int, ...]] = [()]
    for ax in axes:
        combos += [c + (ax,) for c in combos]
    return combos


# ---------------------------------------------------------------------------
# the composed chain
# ---------------------------------------------------------------------------

def predict(arr: np.ndarray, spacing_yx: Sequence[float], spec,
            torch_nets: Sequence, tile_step: float = 0.5,
            use_mirroring: bool = True
            ) -> Tuple[np.ndarray, np.ndarray,
                       Tuple[Tuple[int, int], Tuple[int, int]]]:
    """Run the full reference chain on an (H, W, C) float array.

    :param spec: ModelSpec (plans/dataset driven, models/plans.py)
    :param torch_nets: per-fold torch modules (tests/torch_mirror.py
        TorchPlainConvUNet loaded straight from the checkpoint state dicts)
    :returns: (full-size seg, logits on the cropped input grid, bbox)
    """
    import torch

    pre = spec.preprocess
    patch = tuple(pre.patch_size)

    # 1. crop_to_nonzero + hole-filled normalization mask
    bbox = nonzero_bbox(arr)
    (y0, y1), (x0, x1) = bbox
    cropped = arr[y0:y1, x0:x1]
    mask = None
    if any(pre.use_mask_for_norm):
        mask = ndi.binary_fill_holes(np.any(cropped != 0, axis=-1))

    # 2. normalize, 3. resample to plan spacing (order 3)
    work = normalize(cropped, pre, mask)
    rs_shape = tuple(int(round(n * o / s)) for n, o, s in
                     zip(work.shape[:2], spacing_yx, pre.spacing))
    work = resize(work, rs_shape, order=3)

    # 4. symmetric zero-pad up to the patch (pad_nd_image: before=total//2)
    pad_shape = tuple(max(n, p) for n, p in zip(rs_shape, patch))
    pads = [((t - n) // 2, (t - n) - (t - n) // 2)
            for n, t in zip(rs_shape, pad_shape)]
    work = np.pad(work, pads + [(0, 0)])

    # 5./6./7. sliding window, per-tile mirror TTA + fold average, Gaussian
    # overlap-add
    steps = [sliding_steps(pad_shape[k], patch[k], tile_step)
             for k in range(2)]
    gauss = gaussian_importance(patch)
    mirrors = mirror_combos(spec.allowed_mirroring_axes
                            if use_mirroring else ())
    L = spec.arch.out_channels
    acc = np.zeros(pad_shape + (L,), np.float32)
    wacc = np.zeros(pad_shape, np.float32)
    with torch.no_grad():
        for ty in steps[0]:
            for tx in steps[1]:
                tile = work[ty:ty + patch[0], tx:tx + patch[1]]
                t_in = torch.from_numpy(
                    np.ascontiguousarray(tile.transpose(2, 0, 1))[None])
                tile_logits = np.zeros(patch + (L,), np.float32)
                for net in torch_nets:
                    for m in mirrors:
                        dims = [a + 2 for a in m]  # NCHW: y=2, x=3
                        x_m = torch.flip(t_in, dims) if dims else t_in
                        out = net(x_m)
                        out = torch.flip(out, dims) if dims else out
                        tile_logits += out[0].numpy().transpose(1, 2, 0)
                tile_logits /= len(torch_nets) * len(mirrors)
                acc[ty:ty + patch[0], tx:tx + patch[1]] += \
                    tile_logits * gauss[..., None]
                wacc[ty:ty + patch[0], tx:tx + patch[1]] += gauss
    logits = acc / np.maximum(wacc, 1e-8)[..., None]

    # 8. unpad + inverse-resample LOGITS to the cropped input grid (order 1)
    logits = logits[pads[0][0]:pads[0][0] + rs_shape[0],
                    pads[1][0]:pads[1][0] + rs_shape[1]]
    logits = resize(logits, cropped.shape[:2], order=1)

    # 9. decision + re-embed
    if spec.multilabel:
        seg_c = (1.0 / (1.0 + np.exp(-logits)) > 0.5).astype(np.uint8)
        full = np.zeros(arr.shape[:2] + (L,), np.uint8)
    else:
        seg_c = np.argmax(logits, axis=-1).astype(np.uint8)
        full = np.zeros(arr.shape[:2], np.uint8)
    full[y0:y1, x0:x1] = seg_c
    return full, logits, bbox


# ---------------------------------------------------------------------------
# config matrix shared by the test and tools/parity.py
# ---------------------------------------------------------------------------

def build_config(name: str, channels=('max', 'mean')):
    """Return (spec, torch_nets, jax_fold_params) for a named configuration
    of the synthetic model family."""
    import torch

    from tests.model_fixtures import make_dataset_json, make_plans
    from tests.torch_mirror import TorchPlainConvUNet, make_spec
    from totalsegmentator2d_tpu.models.convert import state_dict_to_params
    from totalsegmentator2d_tpu.models.plans import parse_model_spec

    labels = ('heart', 'aorta')
    multilabel = True
    spacing = (1.5, 1.5)
    n_folds = 1
    patch, n_stages, features = (64, 64), 4, None
    if name == 'bench-arch':
        # the bench-scale architecture (bench.py PATCH/N_STAGES and the
        # ts2d-v2 vertebrae group's 26 labels): 6 stages, 256^2 patch,
        # features 32..512 — the program shape the production path runs
        labels = tuple(f'vert-{i}' for i in range(26))
        patch, n_stages = (256, 256), 6
        features = (32, 64, 128, 256, 512, 512)
    plans = make_plans(patch=patch, spacing=spacing, channels=channels,
                       n_stages=n_stages,
                       features=features or (8, 16, 32, 32))
    cfg2d = plans['configurations']['2d']
    if name == 'softmax':
        multilabel = False
    elif name == 'masked-norm':
        cfg2d['use_mask_for_norm'] = [True] * len(channels)
    elif name == 'ct-norm':
        cfg2d['normalization_schemes'] = (
            ['CTNormalization'] + ['ZScoreNormalization'] * (len(channels) - 1))
        plans['foreground_intensity_properties_per_channel'] = {
            '0': {'mean': 80.0, 'std': 140.0,
                  'percentile_00_5': -120.0, 'percentile_99_5': 400.0}}
    elif name == 'multifold':
        n_folds = 2
    elif name not in ('multilabel', 'resampling', 'bench-arch'):
        raise ValueError(f'unknown config {name}')

    ds = make_dataset_json(labels, channels=channels, multilabel=multilabel)
    spec = parse_model_spec(plans, ds)
    out_ch = len(labels) if multilabel else len(labels) + 1
    tspec = make_spec(in_channels=len(channels), out_channels=out_ch,
                      n_stages=n_stages, features=features)
    nets, fold_params = [], []
    for f in range(n_folds):
        torch.manual_seed(100 + f)
        net = TorchPlainConvUNet(tspec)
        net.eval()
        nets.append(net)
        fold_params.append(state_dict_to_params(
            {k: v.numpy() for k, v in net.state_dict().items()}, spec.arch))
    return spec, nets, fold_params


def config_input(name: str, rng, shape=(90, 80), channels=2) -> Tuple[np.ndarray, Tuple[float, float]]:
    """A synthetic input suited to the named config."""
    spacing = (3.0, 3.0) if name == 'resampling' else (1.5, 1.5)
    if name == 'bench-arch':
        shape = (350, 280)  # the bench's torso coronal projection extent
    arr = np.zeros(shape + (channels,), np.float32)
    # sparse content: exercises crop_to_nonzero on every config
    core = (rng.standard_normal((shape[0] - 30, shape[1] - 25, channels))
            .astype(np.float32))
    arr[18:-12, 15:-10] = core * (120.0 if name == 'ct-norm' else 1.0) + \
        (60.0 if name == 'ct-norm' else 2.0)
    if name == 'masked-norm':
        # punch holes: fill_holes must matter
        arr[30:40, 30:40] = 0.0
    return arr, spacing
