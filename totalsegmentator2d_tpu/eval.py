"""Segmentation evaluation: per-label Dice between two segmentations.

The reference reports per-group test Dice for every published model
(doc/available_models.md) but ships no evaluation code; this provides it,
both as an API and a CLI (`python -m totalsegmentator2d_tpu.eval pred.nrrd
gt.nrrd`). Labels are matched by 3D-Slicer Segment names when present, else
by value/channel index. The Dice computation itself runs as one jnp
reduction over all labels.
"""

from __future__ import annotations

import json
from typing import Dict, Optional

import numpy as np

from .io import MedicalImage, read_image
from .ops.annotations import get_annotation_labels, get_label_mask


def _dice_sums(p, g):
    """(L, ...) stacked masks -> per-label (intersection, |p|, |g|) sums.
    Module-level so jax.jit's cache persists across dice_per_label calls
    (a per-call closure would re-trace every evaluation)."""
    import jax.numpy as jnp
    axes = tuple(range(1, p.ndim))
    p = p.astype(jnp.float32)
    g = g.astype(jnp.float32)
    return (jnp.sum(p * g, axis=axes), jnp.sum(p, axis=axes),
            jnp.sum(g, axis=axes))


_dice_sums_jit = None  # populated on first use (keeps import jax lazy)


def _label_masks(seg: MedicalImage) -> Dict[str, np.ndarray]:
    """{label name: binary mask}; names from Segment metadata when present,
    else 'labelN' / channel index."""
    out = {}
    annotated = get_annotation_labels(seg)
    if annotated:
        for name, info in annotated.items():
            out[name] = get_label_mask(seg, info['value']).array.astype(bool)
        return out
    if seg.ncomponents > 1:
        for c in range(seg.ncomponents):
            out[f'label{c + 1}'] = seg.array[..., c] > 0
    else:
        for v in np.unique(seg.array):
            if v != 0:
                out[f'label{int(v)}'] = seg.array == v
    return out


def dice_per_label(pred: MedicalImage, gt: MedicalImage,
                   smooth: float = 0.0) -> Dict[str, float]:
    """Per-label Dice, matched by name. Labels missing on either side score
    0.0 unless empty on both (1.0). All matched labels are stacked and
    reduced in ONE device dispatch (a 117-label evaluation is one program,
    not 117 round trips)."""
    pm = _label_masks(pred)
    gm = _label_masks(gt)
    import jax

    result: Dict[str, float] = {}
    both = []
    for name in sorted(set(pm) | set(gm)):
        p = pm.get(name)
        g = gm.get(name)
        if p is None or g is None:
            missing_empty = ((p is None or not p.any())
                             and (g is None or not g.any()))
            result[name] = 1.0 if missing_empty else 0.0
            continue
        if p.shape != g.shape:
            raise ValueError(f'Shape mismatch for {name}: {p.shape} vs {g.shape}')
        both.append(name)
    if not both:
        return result

    p_all = np.stack([pm[n] for n in both]).astype(np.uint8)
    g_all = np.stack([gm[n] for n in both]).astype(np.uint8)

    global _dice_sums_jit
    if _dice_sums_jit is None:
        _dice_sums_jit = jax.jit(_dice_sums)
    inter, ps, gs = (np.asarray(x) for x in _dice_sums_jit(
        jax.device_put(p_all), jax.device_put(g_all)))
    for i, name in enumerate(both):
        denom = float(ps[i]) + float(gs[i])
        if denom + smooth == 0:
            result[name] = 1.0
        else:
            result[name] = (2.0 * float(inter[i]) + smooth) / (denom + smooth)
    return result


def evaluate(pred_path: str, gt_path: str) -> dict:
    pred = read_image(pred_path)
    gt = read_image(gt_path)
    scores = dice_per_label(pred, gt)
    return {
        'labels': scores,
        'mean_dice': float(np.mean(list(scores.values()))) if scores else 1.0,
        'n_labels': len(scores),
    }


def main() -> None:
    import argparse
    parser = argparse.ArgumentParser(
        description='Per-label Dice between a predicted and a ground-truth '
                    'segmentation (labels matched by Segment metadata names).')
    parser.add_argument('pred', help='predicted segmentation image')
    parser.add_argument('gt', help='ground-truth segmentation image')
    args = parser.parse_args()
    print(json.dumps(evaluate(args.pred, args.gt), indent=2))


if __name__ == '__main__':
    main()
