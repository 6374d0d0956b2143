"""On-device data augmentation: the full nnU-Net default 2D recipe.

The reference delegates training (and therefore augmentation) to the
external nnU-Net stack (SURVEY.md §2.2); this module is its TPU-native
replacement. Every transform is jit/vmap-safe — branch-free where cheap
(lax.cond only around the expensive spatial resample), static shapes
throughout — so ONE compiled program covers all random draws and the whole
batch augments on device between training steps.

Implemented transforms, with the nnUNetTrainer default probabilities
(nnunetv2 get_training_transforms):

 1. spatial: rotation U(-180°, 180°) p=0.2, zoom U(0.7, 1.4) p=0.2,
    optional elastic deformation (OFF by default, as in nnU-Net v2) —
    composed into one order-3 B-spline resample (seg: order 1 + 0.5
    threshold), constant-0 outside. The resample dispatches on TS2D_WARP
    (see _use_fast_warp): the default recasts the sampling as one-hot
    MATMULS at tile-local window size for affine grids
    (warp_image_affine) + quad-packed-bit gathers (warp_onehot) so it
    rides the MXU instead of scalarized point gathers; batches of >= 8
    additionally warp a fixed-count random subset instead of paying the
    warp for every sample (TS2D_SPATIAL, see _spatial_mode). Full chain:
    19.4 -> 1.0 ms/patch on v5e (docs/performance.md "the spatial warp"
    + "the windowed affine warp")
 2. gaussian noise p=0.1, variance U(0, 0.1)
 3. gaussian blur p=0.2, sigma U(0.5, 1.0), per-channel p=0.5
 4. multiplicative brightness U(0.75, 1.25) p=0.15
 5. contrast U(0.75, 1.25) p=0.15, range-preserving
 6. simulated low resolution p=0.25, per-channel p=0.5, zoom drawn from
    {0.5 .. 0.9} (nnU-Net draws continuously from U(0.5, 1); discrete
    levels keep the resample shapes static under jit — a documented
    TPU-first adaptation), nearest down / cubic up, skimage edge mode
 7. inverted gamma U(0.7, 1.5) p=0.1, stats-retaining
 8. gamma U(0.7, 1.5) p=0.3, stats-retaining
 9. mirror flips p=0.5 per axis

The interpolation core (``map_coordinates``) matches
scipy.ndimage.map_coordinates for mode='mirror' at every order (0/1/3,
cubic via the shared B-spline prefilter in ops/resample.py); the golden
tests in tests/test_018_augment.py pin each transform against its
scipy/numpy reference.
"""

from __future__ import annotations

import math
import os
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.resample import _resize_jit, bspline_prefilter

#: discrete zoom levels for the low-resolution simulation (see module doc)
LOWRES_ZOOMS = (0.5, 0.6, 0.7, 0.8, 0.9)

#: output-pixel chunk per matmul step of the fast warp (tools/train_probe4.py)
_WARP_CHUNK = 2048


#: spatial_transform's default draw ranges (nnU-Net 2D defaults), shared
#: with the batch-partitioned form so the two paths cannot drift
ROTATION_RANGE = (-math.pi, math.pi)
SCALE_RANGE = (0.7, 1.4)


def _spatial_mode() -> str:
    """Batch spatial-augmentation strategy, read at trace time by
    ``augment_batch``. The default (``TS2D_SPATIAL=partition``) warps a
    random subset of exactly round(B * p_any) samples per batch — under
    vmap, ``lax.cond`` lowers to select, so the per-sample form pays the
    full warp for every sample even though only p_any = 36% draw one
    (docs/performance.md "the spatial warp").
    ``TS2D_SPATIAL=persample`` restores independent per-sample Bernoulli
    draws (the batchgenerators semantics; also the automatic fallback
    for elastic deformation and batches smaller than 8)."""
    value = os.environ.get('TS2D_SPATIAL', 'partition')
    if value not in ('partition', 'persample'):
        raise ValueError(
            f"TS2D_SPATIAL must be 'partition' or 'persample', got {value!r}")
    return value


def _use_fast_warp() -> bool:
    """Spatial-warp backend switch, read at trace time by
    ``spatial_transform``. The default (``TS2D_WARP=matmul``) recasts the
    interpolation as one-hot matmuls (image, ``warp_image``) and ONE
    quad-packed-bit point gather per pixel (one-hot target,
    ``warp_onehot``), which the TPU runs 4.8x / 7.5x faster than the
    advanced-index sampler (point gathers scalarize on TPU, matmuls ride
    the MXU; measured in tools/train_probe4-8.py, shipped numbers in
    docs/performance.md "the spatial warp").
    ``TS2D_WARP=gather`` selects the per-tap ``map_coordinates`` sampler
    instead (the pre-round-5 path; the two paths' agreement is pinned in
    tests/test_018_augment.py)."""
    value = os.environ.get('TS2D_WARP', 'matmul')
    if value not in ('matmul', 'gather'):
        raise ValueError(
            f"TS2D_WARP must be 'matmul' or 'gather', got {value!r}")
    return value == 'matmul'


# ---------------------------------------------------------------------------
# interpolation core
# ---------------------------------------------------------------------------

def _mirror_idx(idx: jnp.ndarray, n: int) -> jnp.ndarray:
    """Reflect an integer index into [0, n): mirror boundary without edge
    repetition (scipy mode='mirror'), period 2n-2."""
    if n == 1:
        return jnp.zeros_like(idx)
    period = 2 * n - 2
    m = jnp.mod(idx, period)  # jnp.mod is non-negative for positive period
    return jnp.where(m >= n, period - m, m)


def _bspline3(t: jnp.ndarray) -> jnp.ndarray:
    at = jnp.abs(t)
    return jnp.where(
        at < 1.0, 2.0 / 3.0 - at * at + 0.5 * at ** 3,
        jnp.where(at < 2.0, ((2.0 - at) ** 3) / 6.0, 0.0))


def map_coordinates(img: jnp.ndarray, coords: jnp.ndarray, order: int,
                    mode: str = 'mirror', cval: float = 0.0,
                    prefiltered: bool = False) -> jnp.ndarray:
    """Sample ``img`` (H, W) or (H, W, C) at continuous index positions
    ``coords`` (2, ...): scipy.ndimage.map_coordinates semantics.

    order 0 = nearest, 1 = linear, 3 = cubic B-spline (the image is
    prefiltered internally unless ``prefiltered``). mode 'mirror' reflects;
    mode 'constant' fills positions whose coordinate leaves [0, n-1] with
    ``cval`` (interior values still interpolate over the mirrored
    neighborhood, which differs from scipy only in the outermost one-pixel
    band)."""
    H, W = img.shape[:2]
    y, x = coords[0], coords[1]
    channelled = img.ndim == 3

    if order == 0:
        iy = _mirror_idx(jnp.floor(y + 0.5).astype(jnp.int32), H)
        ix = _mirror_idx(jnp.floor(x + 0.5).astype(jnp.int32), W)
        out = img[iy, ix]
    elif order == 1:
        y0 = jnp.floor(y).astype(jnp.int32)
        x0 = jnp.floor(x).astype(jnp.int32)
        ty, tx = y - y0, x - x0
        out = 0.0
        for dy, wy in ((0, 1.0 - ty), (1, ty)):
            for dx, wx in ((0, 1.0 - tx), (1, tx)):
                v = img[_mirror_idx(y0 + dy, H), _mirror_idx(x0 + dx, W)]
                w = wy * wx
                out = out + v * (w[..., None] if channelled else w)
    elif order == 3:
        c = img if prefiltered else bspline_prefilter(
            img.astype(jnp.float32), (0, 1))
        y0 = jnp.floor(y).astype(jnp.int32)
        x0 = jnp.floor(x).astype(jnp.int32)
        out = 0.0
        for dy in range(-1, 3):
            wy = _bspline3(y - (y0 + dy))
            iy = _mirror_idx(y0 + dy, H)
            for dx in range(-1, 3):
                w = wy * _bspline3(x - (x0 + dx))
                v = c[iy, _mirror_idx(x0 + dx, W)]
                out = out + v * (w[..., None] if channelled else w)
    else:
        raise ValueError(f'Unsupported interpolation order: {order}')

    if mode == 'constant':
        valid = (y >= 0) & (y <= H - 1) & (x >= 0) & (x <= W - 1)
        out = jnp.where(valid[..., None] if channelled else valid, out, cval)
    elif mode != 'mirror':
        raise ValueError(f'Unsupported mode: {mode}')
    return out


def _tap_data(coords: jnp.ndarray, order: int, shape: Tuple[int, int]
              ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Mirror-folded integer tap indices + interpolation weights for the
    flattened output grid: coords (2, H', W') -> iy/ix (P, S) int32 and
    wy/wx (P, S) float32, S = 4 (order 3) or 2 (order 1). The taps and
    weights are exactly ``map_coordinates``'s (same ``_mirror_idx`` fold,
    same B-spline/linear kernels), only laid out tap-minor."""
    H, W = shape
    y = coords[0].reshape(-1)
    x = coords[1].reshape(-1)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    if order == 3:
        rng_ = range(-1, 3)
        wy = jnp.stack([_bspline3(y - (y0 + d)) for d in rng_], -1)
        wx = jnp.stack([_bspline3(x - (x0 + d)) for d in rng_], -1)
    elif order == 1:
        rng_ = range(0, 2)
        ty, tx = y - y0, x - x0
        wy = jnp.stack([1.0 - ty, ty], -1)
        wx = jnp.stack([1.0 - tx, tx], -1)
    else:
        raise ValueError(f'Unsupported fast-warp order: {order}')
    iy = jnp.stack([_mirror_idx(y0 + d, H) for d in rng_], -1)
    ix = jnp.stack([_mirror_idx(x0 + d, W) for d in rng_], -1)
    return iy, ix, wy, wx


def _pad_taps(P: int, *arrs):
    """Pad the tap arrays' pixel axis up to a _WARP_CHUNK multiple."""
    nch = -(-P // _WARP_CHUNK)
    pad = nch * _WARP_CHUNK - P
    if pad:
        arrs = tuple(jnp.pad(a, ((0, pad), (0, 0))) for a in arrs)
    return (nch,) + arrs


def warp_image(img: jnp.ndarray, coords: jnp.ndarray, order: int = 3,
               cval: float = 0.0, prefiltered: bool = False) -> jnp.ndarray:
    """mode='constant' resample of a channelled image (H, W, C) at
    ``coords`` (2, H', W') via one-hot MATMULS: per output-pixel chunk,
    row/column weight matrices Ry (P, H) / Rx (P, W) are built as weighted
    one-hots of the mirrored tap indices and the interpolation becomes
    (Ry @ img) @ Rx, so the MXU does the data movement instead of 16
    scalarized point gathers. Matches ``map_coordinates(img, coords,
    order, 'constant')`` to fp32 einsum precision (~6e-7 measured;
    tools/train_probe4.py — 11.4 -> 2.3 ms/patch on v5e at the training
    patch shapes)."""
    H, W, C = img.shape
    src = img.astype(jnp.float32)
    if order == 3 and not prefiltered:
        src = bspline_prefilter(src, (0, 1))
    Ho, Wo = coords.shape[1], coords.shape[2]
    P = Ho * Wo
    iy, ix, wy, wx = _tap_data(coords, order, (H, W))
    nch, iy, ix, wy, wx = _pad_taps(P, iy, ix, wy, wx)
    imgf = src.reshape(H, W * C)
    ii = jnp.arange(H, dtype=jnp.int32)
    jj = jnp.arange(W, dtype=jnp.int32)
    hi = jax.lax.Precision.HIGHEST

    def step(c0):
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, c0, _WARP_CHUNK, 0)
        iyc, ixc, wyc, wxc = sl(iy), sl(ix), sl(wy), sl(wx)
        Ry = jnp.zeros((_WARP_CHUNK, H), jnp.float32)
        Rx = jnp.zeros((_WARP_CHUNK, W), jnp.float32)
        for d in range(iyc.shape[-1]):
            Ry = Ry + wyc[:, d, None] * (
                iyc[:, d, None] == ii).astype(jnp.float32)
            Rx = Rx + wxc[:, d, None] * (
                ixc[:, d, None] == jj).astype(jnp.float32)
        tmp = jnp.einsum('ph,hj->pj', Ry, imgf, precision=hi)
        tmp = tmp.reshape(_WARP_CHUNK, W, C)
        return jnp.einsum('pw,pwc->pc', Rx, tmp, precision=hi)

    outs = jax.lax.map(
        step, jnp.arange(nch, dtype=jnp.int32) * _WARP_CHUNK)
    out = outs.reshape(nch * _WARP_CHUNK, C)[:P].reshape(Ho, Wo, C)
    y, x = coords[0], coords[1]
    valid = (y >= 0) & (y <= H - 1) & (x >= 0) & (x <= W - 1)
    return jnp.where(valid[..., None], out, cval)


def _win_size(tile: int, order: int, smax: float) -> int:
    """Static source-window size that holds every tap of one tile x tile
    output block under a map whose per-axis Lipschitz constant is at most
    ``smax * sqrt(2)`` (a rotation composed with zoom <= smax): coordinate
    span <= (tile-1)*smax*sqrt(2), floor slack 1, taps span 4 (order 3)
    or 2 (order 1), rounded up to a multiple of 8."""
    span = (tile - 1) * smax * math.sqrt(2.0)
    taps = 4 if order == 3 else 2
    w = int(math.ceil(span)) + taps + 1
    return -(-w // 8) * 8


#: tiles per serialized step of warp_image_affine: bounds the one-hot
#: temporaries to chunk*tile^2*WIN floats so the b128-vmapped augment
#: program stays in HBM (the un-chunked form spilled at batch 128:
#: 5.7 s/step vs 0.25 at b64 — tools/train_probe9.py)
_WARP_TILE_CHUNK = 64


def warp_image_affine(img: jnp.ndarray, coords: jnp.ndarray, order: int = 3,
                      cval: float = 0.0, smax: float = 1.4, tile: int = 32,
                      prefiltered: bool = False) -> jnp.ndarray:
    """``warp_image`` specialized to AFFINE sampling grids (rotation +
    zoom <= ``smax``, i.e. every ``affine_grid`` output): neighboring
    output pixels sample neighboring source positions, so a tile x tile
    output block reads only a bounded source window (``_win_size``). Each
    tile slices its window with a traced-start ``dynamic_slice`` and the
    one-hot interpolation matmuls run at the WINDOW size instead of the
    full image height — ~13x fewer FLOPs than ``warp_image`` at the
    shipped tile=32 / 256px training patches (41x at tile=16, but the
    larger windows' matmuls run closer to MXU peak and tile=32 measures
    fastest: 2.38 -> 1.03 ms/patch on v5e vs tile16's 1.29,
    tools/train_probe9.py). Same one-hot construction and
    HIGHEST-precision einsums as ``warp_image``; agreement pinned at
    1e-5 in tests/test_018_augment.py. Tiles process in ``_WARP_TILE_CHUNK`` groups
    via lax.map so the vmapped batch program stays memory-bounded. Falls
    back to ``warp_image`` when the image is too small for the window.

    Correctness requires the Lipschitz bound: callers with free-form
    coords (elastic offsets, test grids) must use ``warp_image``.
    Mirror-interior semantics are preserved by a 2-pixel reflect pad
    (order-3 taps of in-bounds coords reach at most 2 outside); pixels
    whose coords leave the image are masked to ``cval`` exactly as in
    ``map_coordinates``'s constant mode, so their clamped taps are free."""
    H, W, C = img.shape
    WIN = _win_size(tile, order, smax)
    Hp, Wp = H + 4, W + 4
    if WIN > Hp or WIN > Wp:
        return warp_image(img, coords, order=order, cval=cval,
                          prefiltered=prefiltered)
    src = img.astype(jnp.float32)
    if order == 3 and not prefiltered:
        src = bspline_prefilter(src, (0, 1))
    pad = jnp.pad(src, ((2, 2), (2, 2), (0, 0)), mode='reflect')

    Ho, Wo = coords.shape[1], coords.shape[2]
    Ht, Wt = -(-Ho // tile), -(-Wo // tile)
    y = jnp.clip(coords[0], 0.0, H - 1.0)
    x = jnp.clip(coords[1], 0.0, W - 1.0)
    grow = ((0, Ht * tile - Ho), (0, Wt * tile - Wo))
    y = jnp.pad(y, grow, mode='edge')
    x = jnp.pad(x, grow, mode='edge')
    tiled = lambda a: a.reshape(Ht, tile, Wt, tile).transpose(
        0, 2, 1, 3).reshape(Ht * Wt, tile * tile)
    y, x = tiled(y), tiled(x)
    T, P = y.shape

    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    ys = jnp.clip(jnp.min(y0, axis=1) + 1, 0, Hp - WIN)  # padded window
    xs = jnp.clip(jnp.min(x0, axis=1) + 1, 0, Wp - WIN)  # starts, (T,)

    if order == 3:
        offs = range(-1, 3)
        wy = jnp.stack([_bspline3(y - (y0 + d)) for d in offs], -1)
        wx = jnp.stack([_bspline3(x - (x0 + d)) for d in offs], -1)
    elif order == 1:
        offs = range(0, 2)
        ty, tx = y - y0, x - x0
        wy = jnp.stack([1.0 - ty, ty], -1)
        wx = jnp.stack([1.0 - tx, tx], -1)
    else:
        raise ValueError(f'Unsupported fast-warp order: {order}')
    doffs = jnp.asarray(list(offs), jnp.int32)
    iy = y0[..., None] + doffs + 2 - ys[:, None, None]   # (T, P, S) local
    ix = x0[..., None] + doffs + 2 - xs[:, None, None]

    G = min(_WARP_TILE_CHUNK, T)
    nch = -(-T // G)
    tpad = nch * G - T
    if tpad:
        padt = lambda a: jnp.pad(a, ((0, tpad),) + ((0, 0),) * (a.ndim - 1))
        iy, ix, wy, wx = padt(iy), padt(ix), padt(wy), padt(wx)
        ys, xs = padt(ys), padt(xs)
    lanes = jnp.arange(WIN, dtype=jnp.int32)
    hi = jax.lax.Precision.HIGHEST

    def step(c0):
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, c0, G, 0)
        iyc, ixc, wyc, wxc = sl(iy), sl(ix), sl(wy), sl(wx)
        win = jax.vmap(lambda sy, sx: jax.lax.dynamic_slice(
            pad, (sy, sx, 0), (WIN, WIN, C)))(sl(ys), sl(xs))
        Ry = jnp.zeros((G, P, WIN), jnp.float32)
        Rx = jnp.zeros((G, P, WIN), jnp.float32)
        for d in range(iyc.shape[-1]):                   # tap loop: keeps
            Ry = Ry + wyc[..., d, None] * (              # temporaries at
                iyc[..., d, None] == lanes)              # (G, P, WIN)
            Rx = Rx + wxc[..., d, None] * (ixc[..., d, None] == lanes)
        tmp = jnp.einsum('tpw,twk->tpk', Ry, win.reshape(G, WIN, WIN * C),
                         precision=hi)
        return jnp.einsum('tpw,tpwc->tpc', Rx, tmp.reshape(G, P, WIN, C),
                          precision=hi)

    outs = jax.lax.map(step, jnp.arange(nch, dtype=jnp.int32) * G)
    out = outs.reshape(nch * G, P, C)[:T]
    out = out.reshape(Ht, Wt, tile, tile, C).transpose(0, 2, 1, 3, 4)
    out = out.reshape(Ht * tile, Wt * tile, C)[:Ho, :Wo]
    yv, xv = coords[0], coords[1]
    valid = (yv >= 0) & (yv <= H - 1) & (xv >= 0) & (xv <= W - 1)
    return jnp.where(valid[..., None], out, cval)


def warp_onehot(target: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Order-1 + 0.5-threshold mode='constant' warp of a binary one-hot
    target (H, W, L) -> bool (H', W', L): the L bit-planes pack into
    ceil(L/32) uint32 words, and the packed field's 2x2 tap neighborhood
    is pre-packed with static mirror-shifts (Q[y, x] = (T[y,x], T[y,xn],
    T[yn,x], T[yn,xn]), xn/yn the mirror successors) so ALL FOUR linear
    taps arrive in ONE point gather per output pixel regardless of L —
    point gathers scalarize on TPU, so halving/quartering their count is
    the whole win (4 gathers 3.2 -> 1 gather 1.1 ms/patch on v5e,
    tools/train_probe7.py; the 4-gather form was already 2.9x over the
    unpacked sampler, train_probe4.py).

    Exactness: a pre-packed neighbor can only differ from the exact
    mirror-folded tap ``mirror(y0+1)`` when ``y0`` itself was folded
    (coordinate out of bounds -> masked by mode='constant') or sits on
    the top edge with fractional part exactly 0 (tap weight exactly 0) —
    so the fp32 accumulation, taken in ``map_coordinates``'s term order,
    is BIT-IDENTICAL to ``map_coordinates(target.astype(f32), coords, 1,
    'constant') > 0.5`` (pinned in tests/test_018_augment.py::TestFastWarp,
    verified on-device in train_probe7)."""
    H, W, L = target.shape
    Ho, Wo = coords.shape[1], coords.shape[2]
    P = Ho * Wo
    bits = (target > 0).astype(jnp.uint32)
    words = []
    for w0 in range(0, L, 32):
        chunk = bits[..., w0:w0 + 32]
        shifts = jnp.arange(chunk.shape[-1], dtype=jnp.uint32)
        words.append(jnp.sum(chunk << shifts, axis=-1, dtype=jnp.uint32))
    packed = jnp.stack(words, axis=-1)  # (H, W, nw)
    nw = len(words)
    xn = _mirror_idx(jnp.arange(W) + 1, W)  # static mirror successors
    yn = _mirror_idx(jnp.arange(H) + 1, H)
    px = packed[:, xn]
    quad = jnp.concatenate([packed, px, packed[yn], px[yn]], axis=-1)
    qf = quad.reshape(H * W, 4 * nw)
    iy, ix, wy, wx = _tap_data(coords, 1, (H, W))
    taps = jnp.take(qf, iy[:, 0] * W + ix[:, 0], axis=0).reshape(P, 4, nw)
    w = jnp.stack([wy[:, 0] * wx[:, 0], wy[:, 0] * wx[:, 1],
                   wy[:, 1] * wx[:, 0], wy[:, 1] * wx[:, 1]], axis=1)
    lanes = jnp.arange(32, dtype=jnp.uint32)
    acc = 0.0
    for t in range(4):  # map_coordinates' exact term order
        bit = ((taps[:, t, :, None] >> lanes) & 1).astype(jnp.float32)
        acc = acc + bit * w[:, t, None, None]
    out = (acc > 0.5).reshape(P, nw * 32)[:, :L]
    out = out.reshape(Ho, Wo, L)
    y, x = coords[0], coords[1]
    valid = (y >= 0) & (y <= H - 1) & (x >= 0) & (x <= W - 1)
    return jnp.where(valid[..., None], out, False)


def gaussian_blur(img: jnp.ndarray, sigma, radius: int = 5,
                  axes: Sequence[int] = (0, 1)) -> jnp.ndarray:
    """Separable gaussian blur with a STATIC kernel radius (the truncation
    scipy applies via ``radius=``): jit-safe for a traced sigma. Boundary:
    edge-replicating pad (scipy mode='reflect' / jnp 'symmetric'... scipy's
    default 'reflect' repeats the edge sample, i.e. numpy 'symmetric')."""
    t = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    w = jnp.exp(-0.5 * (t / sigma) ** 2)
    w = w / jnp.sum(w)
    out = img
    for ax in axes:
        pad = [(0, 0)] * out.ndim
        pad[ax] = (radius, radius)
        padded = jnp.pad(out, pad, mode='symmetric')
        acc = 0.0
        for k in range(2 * radius + 1):
            acc = acc + w[k] * jax.lax.slice_in_dim(
                padded, k, k + out.shape[ax], axis=ax)
        out = acc
    return out


# ---------------------------------------------------------------------------
# individual transforms (image (H, W, C) float, target (H, W, L) uint8)
# ---------------------------------------------------------------------------

def affine_grid(shape: Tuple[int, int], angle, scale) -> jnp.ndarray:
    """Output->input sampling grid (2, H, W) for a rotation by ``angle``
    (radians) + zoom by ``scale`` about the patch center. scale > 1 spreads
    the sampling positions, i.e. the content shrinks (batchgenerators'
    scale convention)."""
    H, W = shape
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32) - cy,
                          jnp.arange(W, dtype=jnp.float32) - cx,
                          indexing='ij')
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    ys = (cos * yy - sin * xx) * scale + cy
    xs = (sin * yy + cos * xx) * scale + cx
    return jnp.stack([ys, xs])


def elastic_offsets(key: jax.Array, shape: Tuple[int, int], alpha,
                    sigma) -> jnp.ndarray:
    """Elastic displacement field (2, H, W): gaussian-smoothed U(-1, 1)
    noise scaled by alpha (batchgenerators elastic_deform_coordinates)."""
    noise = jax.random.uniform(key, (2,) + tuple(shape),
                               minval=-1.0, maxval=1.0)
    smooth = jax.vmap(lambda n: gaussian_blur(n, sigma))(noise)
    return smooth * alpha


def spatial_transform(key: jax.Array, image: jnp.ndarray,
                      target: jnp.ndarray,
                      rotation: Tuple[float, float] = ROTATION_RANGE,
                      p_rot: float = 0.2,
                      scale: Tuple[float, float] = SCALE_RANGE,
                      p_scale: float = 0.2,
                      p_elastic: float = 0.0,
                      elastic_alpha: Tuple[float, float] = (0.0, 200.0),
                      elastic_sigma: Tuple[float, float] = (9.0, 13.0),
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rotation + zoom (+ optional elastic deformation) composed into ONE
    resample: image order 3 / constant 0, one-hot target order 1 + 0.5
    threshold. The resample only runs when at least one component is drawn
    (lax.cond), so the un-augmented path stays bit-exact."""
    k = jax.random.split(key, 6)
    do_rot = jax.random.bernoulli(k[0], p_rot)
    do_scale = jax.random.bernoulli(k[1], p_scale)
    do_el = jax.random.bernoulli(k[2], p_elastic) if p_elastic > 0 else False
    angle = jnp.where(do_rot, jax.random.uniform(
        k[3], (), minval=rotation[0], maxval=rotation[1]), 0.0)
    sc = jnp.where(do_scale, jax.random.uniform(
        k[4], (), minval=scale[0], maxval=scale[1]), 1.0)

    def resample(args):
        img, tgt = args
        coords = affine_grid(img.shape[:2], angle, sc)
        if p_elastic > 0:
            ka, ks = jax.random.split(jax.random.fold_in(k[5], 1))
            alpha = jax.random.uniform(ka, (), minval=elastic_alpha[0],
                                       maxval=elastic_alpha[1])
            sig = jax.random.uniform(ks, (), minval=elastic_sigma[0],
                                     maxval=elastic_sigma[1])
            off = elastic_offsets(k[5], img.shape[:2], alpha, sig)
            coords = coords + jnp.where(do_el, 1.0, 0.0) * off
        if _use_fast_warp():
            # MXU/packed-bit fast path (the default; see _use_fast_warp):
            # warp_onehot is bit-identical to the gather path, warp_image
            # matches it to fp32-einsum precision (~6e-7). Pure-affine
            # grids (elastic off, the nnU-Net default) qualify for the
            # windowed form — tile-local matmuls at ~1/13th the FLOPs.
            if p_elastic > 0:
                img_out = warp_image(img, coords, order=3)
            else:
                img_out = warp_image_affine(img, coords, order=3,
                                            smax=max(1.0, scale[1]))
            tgt_out = warp_onehot(tgt, coords).astype(tgt.dtype)
        else:
            img_out = map_coordinates(img, coords, order=3, mode='constant')
            tgt_out = (map_coordinates(tgt.astype(jnp.float32), coords,
                                       order=1, mode='constant')
                       > 0.5).astype(tgt.dtype)
        return img_out, tgt_out

    any_spatial = do_rot | do_scale | (do_el if p_elastic > 0 else False)
    return jax.lax.cond(any_spatial, resample, lambda a: a, (image, target))


def spatial_transform_batch(key: jax.Array, images: jnp.ndarray,
                            targets: jnp.ndarray, p_rot: float = 0.2,
                            p_scale: float = 0.2,
                            rotation: Tuple[float, float] = ROTATION_RANGE,
                            scale: Tuple[float, float] = SCALE_RANGE,
                            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batch-level rotation+zoom with a STATIC warped count: a uniformly
    random subset of exactly K = round(B * p_any) samples is warped,
    p_any = 1 - (1-p_rot)(1-p_scale), and each warped sample draws its
    (do_rot, do_scale) pair from the exact conditional-on-any
    distribution, then its angle/zoom from the usual ranges.

    Why: under vmap, ``lax.cond`` lowers to select — BOTH branches
    execute — so per-sample Bernoulli gating makes every sample pay the
    full warp (docs/performance.md "the spatial warp"). Partitioning the
    batch keeps the warp's shapes static while only the K selected
    samples pay it: ~2.8x less spatial-augmentation work at the recipe's
    probabilities. Each sample is warped with probability K/B ~= p_any
    and draws identical per-sample warp parameters; the only
    distributional deviation is that the per-batch COUNT of warped
    samples is the rounded mean instead of Binomial(B, p_any) — a
    documented TPU-first adaptation (cf. the discrete LOWRES_ZOOMS).

    Elastic deformation is not offered here: its field is free-form, so
    callers wanting it use the per-sample path (``augment_batch``
    falls back automatically)."""
    B = images.shape[0]
    p_any = 1.0 - (1.0 - p_rot) * (1.0 - p_scale)
    K = int(round(B * p_any))
    if K == 0:
        return images, targets
    ksel, kdraw = jax.random.split(key)
    perm = jax.random.permutation(ksel, B)
    inv = jnp.argsort(perm)
    sel_img = jnp.take(images, perm[:K], axis=0)
    sel_tgt = jnp.take(targets, perm[:K], axis=0)
    # P(rot only | any), P(scale only | any); remainder = both
    a = p_rot * (1.0 - p_scale) / p_any
    b = (1.0 - p_rot) * p_scale / p_any
    smax = max(1.0, scale[1])

    def one(k, img, tgt):
        k1, k2, k3 = jax.random.split(k, 3)
        r = jax.random.uniform(k1, ())
        do_rot = (r < a) | (r >= a + b)
        do_scale = r >= a
        angle = jnp.where(do_rot, jax.random.uniform(
            k2, (), minval=rotation[0], maxval=rotation[1]), 0.0)
        sc = jnp.where(do_scale, jax.random.uniform(
            k3, (), minval=scale[0], maxval=scale[1]), 1.0)
        coords = affine_grid(img.shape[:2], angle, sc)
        if _use_fast_warp():
            w_img = warp_image_affine(img, coords, order=3, smax=smax)
            w_tgt = warp_onehot(tgt, coords).astype(tgt.dtype)
        else:
            w_img = map_coordinates(img, coords, order=3, mode='constant')
            w_tgt = (map_coordinates(tgt.astype(jnp.float32), coords,
                                     order=1, mode='constant')
                     > 0.5).astype(tgt.dtype)
        return w_img, w_tgt

    ks = jax.random.split(kdraw, K)
    w_img, w_tgt = jax.vmap(one)(ks, sel_img.astype(jnp.float32), sel_tgt)
    out_img = jnp.concatenate(
        [w_img, jnp.take(images, perm[K:], axis=0).astype(jnp.float32)], 0)
    out_tgt = jnp.concatenate(
        [w_tgt, jnp.take(targets, perm[K:], axis=0)], 0)
    return jnp.take(out_img, inv, axis=0), jnp.take(out_tgt, inv, axis=0)


def add_gaussian_noise(key: jax.Array, image: jnp.ndarray, p: float = 0.1,
                       variance: Tuple[float, float] = (0.0, 0.1)
                       ) -> jnp.ndarray:
    k1, k2, k3 = jax.random.split(key, 3)
    do = jax.random.bernoulli(k1, p)
    var = jax.random.uniform(k2, (), minval=variance[0], maxval=variance[1])
    noise = jax.random.normal(k3, image.shape) * jnp.sqrt(var)
    return jnp.where(do, image + noise, image)


def blur_transform(key: jax.Array, image: jnp.ndarray, p: float = 0.2,
                   p_per_channel: float = 0.5,
                   sigma: Tuple[float, float] = (0.5, 1.0)) -> jnp.ndarray:
    C = image.shape[-1]
    k = jax.random.split(key, 2 * C + 1)
    do_sample = jax.random.bernoulli(k[0], p)
    chans = []
    for c in range(C):
        do_c = jax.random.bernoulli(k[1 + 2 * c], p_per_channel)
        sig = jax.random.uniform(k[2 + 2 * c], (), minval=sigma[0],
                                 maxval=sigma[1])
        blurred = gaussian_blur(image[..., c], sig)
        chans.append(jnp.where(do_sample & do_c, blurred, image[..., c]))
    return jnp.stack(chans, axis=-1)


def brightness_transform(key: jax.Array, image: jnp.ndarray,
                         p: float = 0.15,
                         rng: Tuple[float, float] = (0.75, 1.25)
                         ) -> jnp.ndarray:
    """Per-channel multiplicative brightness."""
    C = image.shape[-1]
    k1, k2 = jax.random.split(key)
    do = jax.random.bernoulli(k1, p)
    mult = jax.random.uniform(k2, (C,), minval=rng[0], maxval=rng[1])
    return jnp.where(do, image * mult, image)


def contrast_transform(key: jax.Array, image: jnp.ndarray, p: float = 0.15,
                       rng: Tuple[float, float] = (0.75, 1.25)
                       ) -> jnp.ndarray:
    """Per-channel contrast about the channel mean, range-preserving
    (batchgenerators preserve_range=True: results clip to the channel's
    original [min, max])."""
    C = image.shape[-1]
    k1, k2 = jax.random.split(key)
    do = jax.random.bernoulli(k1, p)
    factor = jax.random.uniform(k2, (C,), minval=rng[0], maxval=rng[1])
    mean = jnp.mean(image, axis=(0, 1), keepdims=True)
    mn = jnp.min(image, axis=(0, 1), keepdims=True)
    mx = jnp.max(image, axis=(0, 1), keepdims=True)
    stretched = jnp.clip((image - mean) * factor + mean, mn, mx)
    return jnp.where(do, stretched, image)


def lowres_transform(key: jax.Array, image: jnp.ndarray, p: float = 0.25,
                     p_per_channel: float = 0.5) -> jnp.ndarray:
    """Simulated low resolution: nearest-neighbor downsample to a discrete
    zoom level then cubic upsample back (skimage edge/half-pixel
    convention, matching nnU-Net's SimulateLowResolutionTransform up to the
    discretized zoom draw)."""
    H, W = image.shape[:2]
    C = image.shape[-1]

    def level_fn(z):
        low = (max(1, int(round(H * z))), max(1, int(round(W * z))))

        def fn(x):
            small = _resize_jit(x, low, 0, 'edge', (0, 1))
            return _resize_jit(small, (H, W), 3, 'edge', (0, 1))
        return fn

    branches = [level_fn(z) for z in LOWRES_ZOOMS] + [lambda x: x]
    identity = len(branches) - 1

    k = jax.random.split(key, 2 * C + 1)
    do_sample = jax.random.bernoulli(k[0], p)
    chans = []
    for c in range(C):
        do_c = jax.random.bernoulli(k[1 + 2 * c], p_per_channel)
        lvl = jax.random.randint(k[2 + 2 * c], (), 0, len(LOWRES_ZOOMS))
        idx = jnp.where(do_sample & do_c, lvl, identity)
        chans.append(jax.lax.switch(idx, branches, image[..., c]))
    return jnp.stack(chans, axis=-1)


def gamma_transform(key: jax.Array, image: jnp.ndarray, p: float = 0.3,
                    rng: Tuple[float, float] = (0.7, 1.5),
                    invert: bool = False,
                    retain_stats: bool = True) -> jnp.ndarray:
    """nnU-Net gamma: half the draws come from the sub-1 range when the
    range straddles 1 (batchgenerators GammaTransform), applied to the
    min-max-normalized intensities; retain_stats restores the original
    mean/std afterwards; invert applies the curve to the negated image."""
    k = jax.random.split(key, 3)
    do = jax.random.bernoulli(k[0], p)
    low_side = jax.random.bernoulli(k[1], 0.5) & (rng[0] < 1.0)
    u = jax.random.uniform(k[2], ())
    gamma = jnp.where(low_side,
                      rng[0] + u * (1.0 - rng[0]),
                      max(rng[0], 1.0) + u * (rng[1] - max(rng[0], 1.0)))
    x = -image if invert else image
    mean = jnp.mean(x)
    std = jnp.std(x)
    mn = jnp.min(x)
    span = jnp.maximum(jnp.max(x) - mn, 1e-7)
    y = jnp.power((x - mn) / span, gamma) * span + mn
    if retain_stats:
        y = (y - jnp.mean(y)) / jnp.maximum(jnp.std(y), 1e-7) * std + mean
    y = -y if invert else y
    return jnp.where(do, y, image)


def mirror_transform(key: jax.Array, image: jnp.ndarray,
                     target: jnp.ndarray, p_flip: float = 0.5
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    k1, k2 = jax.random.split(key)
    do_fy = jax.random.bernoulli(k1, p_flip)
    do_fx = jax.random.bernoulli(k2, p_flip)
    image = jnp.where(do_fy, jnp.flip(image, 0), image)
    target = jnp.where(do_fy, jnp.flip(target, 0), target)
    image = jnp.where(do_fx, jnp.flip(image, 1), image)
    target = jnp.where(do_fx, jnp.flip(target, 1), target)
    return image, target


# ---------------------------------------------------------------------------
# the composed recipe
# ---------------------------------------------------------------------------

def augment_pair(key: jax.Array, image: jnp.ndarray, target: jnp.ndarray,
                 p_rot: float = 0.2, p_scale: float = 0.2,
                 p_elastic: float = 0.0,
                 p_noise: float = 0.1, p_blur: float = 0.2,
                 p_brightness: float = 0.15, p_contrast: float = 0.15,
                 p_lowres: float = 0.25, p_gamma_invert: float = 0.1,
                 p_gamma: float = 0.3, p_flip: float = 0.5
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Apply the full nnU-Net default 2D augmentation chain (order as in
    nnunetv2 get_training_transforms) to one (H, W, C) image + (H, W, L)
    one-hot target pair. All defaults match the nnU-Net recipe; elastic
    deformation is available but off by default, as upstream.

    The spatial probabilities are STATIC (Python floats): all-zero
    spatial probabilities skip the resample at trace time, which is what
    lets ``augment_batch``'s partitioned path pay the warp only for the
    selected sub-batch."""
    image = image.astype(jnp.float32)
    ks = jax.random.split(key, 9)
    if p_rot or p_scale or p_elastic:
        image, target = spatial_transform(ks[0], image, target, p_rot=p_rot,
                                          p_scale=p_scale,
                                          p_elastic=p_elastic)
    image = add_gaussian_noise(ks[1], image, p=p_noise)
    image = blur_transform(ks[2], image, p=p_blur)
    image = brightness_transform(ks[3], image, p=p_brightness)
    image = contrast_transform(ks[4], image, p=p_contrast)
    image = lowres_transform(ks[5], image, p=p_lowres)
    image = gamma_transform(ks[6], image, p=p_gamma_invert, invert=True)
    image = gamma_transform(ks[7], image, p=p_gamma, invert=False)
    return mirror_transform(ks[8], image, target, p_flip=p_flip)


def augment_batch(key: jax.Array, batch: Dict[str, jnp.ndarray],
                  **kw) -> Dict[str, jnp.ndarray]:
    """Augment a whole (N, H, W, C)/(N, H, W, L) batch in one program.

    The spatial stage runs batch-partitioned by default (exactly
    round(N * p_any) samples warp — see ``spatial_transform_batch`` /
    ``_spatial_mode``); elastic deformation, batches under 8, or
    ``TS2D_SPATIAL=persample`` use independent per-sample draws. The
    remaining recipe always applies per-sample under vmap."""
    n = batch['image'].shape[0]
    image, target = batch['image'], batch['target']
    p_rot = kw.get('p_rot', 0.2)
    p_scale = kw.get('p_scale', 0.2)
    p_elastic = kw.get('p_elastic', 0.0)
    if (_spatial_mode() == 'partition' and not p_elastic and n >= 8
            and (p_rot or p_scale)):
        key, kp = jax.random.split(key)
        image, target = spatial_transform_batch(
            kp, image, target, p_rot=p_rot, p_scale=p_scale)
        kw = dict(kw, p_rot=0.0, p_scale=0.0, p_elastic=0.0)
    keys = jax.random.split(key, n)
    img, tgt = jax.vmap(lambda kk, i, t: augment_pair(kk, i, t, **kw))(
        keys, image, target)
    return {'image': img, 'target': tgt}
