"""Segmentation losses (nnU-Net recipe).

The reference ships no training code (its models come pre-trained from
Zenodo), but a complete framework must be able to (re)train the group
models. These implement the nnU-Net loss family: soft Dice + cross-entropy
for label maps, soft Dice + BCE per channel for multilabel (the fork TS2D's
models were trained with), and deep-supervision weighting.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp


def soft_dice_loss(logits: jnp.ndarray, target: jnp.ndarray,
                   multilabel: bool, smooth: float = 1e-5,
                   batch_dice: bool = False) -> jnp.ndarray:
    """Soft Dice over spatial dims. logits (N,H,W,L); target one-hot/binary
    (N,H,W,L) for multilabel, or int labels (N,H,W) otherwise."""
    if multilabel:
        probs = jax.nn.sigmoid(logits)
        tgt = target.astype(probs.dtype)
    else:
        probs = jax.nn.softmax(logits, axis=-1)
        tgt = jax.nn.one_hot(target, logits.shape[-1], dtype=probs.dtype)
    axes = (0, 1, 2) if batch_dice else (1, 2)
    inter = jnp.sum(probs * tgt, axis=axes)
    denom = jnp.sum(probs, axis=axes) + jnp.sum(tgt, axis=axes)
    dice = (2 * inter + smooth) / (denom + smooth)
    return 1.0 - jnp.mean(dice)


def bce_loss(logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    t = target.astype(logits.dtype)
    return jnp.mean(jnp.maximum(logits, 0) - logits * t
                    + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def ce_loss(logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(
        logp, target[..., None].astype(jnp.int32), axis=-1))


def dice_and_ce(logits: jnp.ndarray, target: jnp.ndarray,
                multilabel: bool) -> jnp.ndarray:
    """nnU-Net compound loss: Dice + (BCE if multilabel else CE), equal
    weights."""
    d = soft_dice_loss(logits, target, multilabel)
    c = bce_loss(logits, target) if multilabel else ce_loss(logits, target)
    return d + c


def deep_supervision_weights(n: int) -> jnp.ndarray:
    """nnU-Net deep-supervision weighting: 2^-i per scale, normalized."""
    w = jnp.asarray([2.0 ** (-i) for i in range(n)])
    return w / jnp.sum(w)


def deep_supervision_loss(logits_list: List[jnp.ndarray],
                          target: jnp.ndarray, multilabel: bool) -> jnp.ndarray:
    """Weighted loss over the decoder's multi-scale heads (highest
    resolution first); targets are average-pool-downsampled per scale."""
    weights = deep_supervision_weights(len(logits_list))
    total = 0.0
    for i, logits in enumerate(logits_list):
        tgt = _downsample_target(target, logits.shape[1:3], multilabel)
        total = total + weights[i] * dice_and_ce(logits, tgt, multilabel)
    return total


def _downsample_target(target: jnp.ndarray, hw, multilabel: bool) -> jnp.ndarray:
    th, tw = target.shape[1:3]
    oh, ow = hw
    if (th, tw) == (oh, ow):
        return target
    fy, fx = th // oh, tw // ow
    if multilabel:
        t = target.reshape(target.shape[0], oh, fy, ow, fx, target.shape[-1])
        return (jnp.max(t, axis=(2, 4)))
    t = target.reshape(target.shape[0], oh, fy, ow, fx)
    return t[:, :, 0, :, 0]  # nearest-neighbor label downsampling


def dice_score(pred: jnp.ndarray, target: jnp.ndarray,
               smooth: float = 1e-5) -> jnp.ndarray:
    """Per-channel binary Dice of hard predictions (evaluation metric; the
    reference reports per-group test Dice, doc/available_models.md)."""
    p = pred.astype(jnp.float32)
    t = target.astype(jnp.float32)
    axes = tuple(range(p.ndim - 1))
    inter = jnp.sum(p * t, axis=axes)
    denom = jnp.sum(p, axis=axes) + jnp.sum(t, axis=axes)
    return (2 * inter + smooth) / (denom + smooth)
