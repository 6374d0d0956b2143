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


def accumulate_tiles(work, tiles, valid, net_batch, acc0, wacc0,
                     patch: Sequence[int], mirrors: Sequence[Tuple[int, ...]],
                     gauss, chunk_cap: int = 64):
    """Sliding-window Gaussian accumulation with tile×TTA-batched forwards.

    Measured on TPU v5e: one U-Net forward carries ~10 ms of fixed cost
    (InstanceNorm reductions + small deep stages), so batching all tiles'
    TTA mirrors into one forward per network (batch = Tc*M) is ~3x faster
    than a per-tile scan with batch M. ``chunk_cap`` bounds the forward
    batch (activation memory) — tiles are processed in chunks of
    Tc = chunk_cap // M, and the chunk loop is a ``lax.scan``.

    :param work: padded input image (H, W, C)
    :param tiles: (T, 2) tile origins (traced or static)
    :param valid: (T, 1) tile weights (0 disables a padding tile)
    :param net_batch: (B, ph, pw, C) -> (*prefix, B, ph, pw, L) — any
        leading ensemble dims, matching ``acc0``'s leading dims
    :param acc0/wacc0: zero accumulators (*prefix, H, W, L) / (H, W, 1)
    :param mirrors: TTA flip combinations over spatial axes (0=h, 1=w)
    :returns: (acc, wacc) accumulated logits and Gaussian weights
    """
    import jax
    import jax.numpy as jnp

    C = work.shape[-1]
    M = len(mirrors)
    prefix = acc0.shape[:-3]
    P = len(prefix)
    L = acc0.shape[-1]
    T = tiles.shape[0]
    Tc = max(1, min(int(T), max(1, chunk_cap // M)))
    Tpad = -(-T // Tc) * Tc
    if Tpad != T:
        tiles = jnp.pad(jnp.asarray(tiles), ((0, Tpad - T), (0, 0)))
        valid = jnp.pad(jnp.asarray(valid), ((0, Tpad - T), (0, 0)))
    n_chunks = Tpad // Tc
    # flips indexed from the right (h=-3, w=-2) so they apply at any rank
    m_axes = [tuple(a - 3 for a in m) for m in mirrors]

    def tta_expand(tile):
        return jnp.stack([tile if not m else jnp.flip(tile, axis=m)
                          for m in m_axes], 0)

    def chunk_step(carry, inp):
        poss, vals = inp                                  # (Tc, 2), (Tc, 1)
        acc, wacc = carry
        gathered = jax.vmap(lambda p: jax.lax.dynamic_slice(
            work, (p[0], p[1], 0), (patch[0], patch[1], C)))(poss)
        batch = jax.vmap(tta_expand)(gathered)            # (Tc, M, ph, pw, C)
        batch = batch.reshape((Tc * M,) + batch.shape[2:])
        logits = net_batch(batch)                 # (*prefix, Tc*M, ph, pw, L)
        logits = logits.reshape(prefix + (Tc, M) + logits.shape[-3:])
        merged = sum(
            (logits[..., i, :, :, :] if not m
             else jnp.flip(logits[..., i, :, :, :], axis=m))
            for i, m in enumerate(m_axes)) / float(M)     # (*prefix, Tc, ...)
        g = gauss[None] * vals[:, None, None]             # (Tc, ph, pw, 1)
        merged = merged * g
        for t in range(Tc):                               # static unroll
            idx = (0,) * P + (poss[t, 0], poss[t, 1], 0)
            cur = jax.lax.dynamic_slice(
                acc, idx, prefix + (patch[0], patch[1], L))
            acc = jax.lax.dynamic_update_slice(
                acc, cur + merged[..., t, :, :, :], idx)
            wcur = jax.lax.dynamic_slice(
                wacc, (poss[t, 0], poss[t, 1], 0), (patch[0], patch[1], 1))
            wacc = jax.lax.dynamic_update_slice(
                wacc, wcur + g[t], (poss[t, 0], poss[t, 1], 0))
        return (acc, wacc), None

    xs = (jnp.asarray(tiles).reshape(n_chunks, Tc, 2),
          jnp.asarray(valid).reshape(n_chunks, Tc, 1))
    (acc, wacc), _ = jax.lax.scan(chunk_step, (acc0, wacc0), xs)
    return acc, wacc
