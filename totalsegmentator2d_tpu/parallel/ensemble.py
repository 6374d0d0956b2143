"""Stacked-weights ensemble execution.

The five anatomical-group models of ts2d-v2 share one architecture but
differ in segmentation-head width (label count). Padding every head to the
widest group lets the whole ensemble stack into ONE params pytree with a
leading group axis, so the ensemble runs as a single vmapped U-Net call —
on one chip (vmap) or spread over an 'ensemble' mesh axis (sharded stack).
This replaces the reference's five resident worker processes
(SURVEY.md §2.3) with one XLA program.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def pad_head(params: dict, n_labels: int, max_labels: int) -> dict:
    """Pad every segmentation head from n_labels to max_labels output
    channels (zero weights; bias -inf-free: padded logits stay ~0 and are
    sliced away before any decision)."""
    if n_labels == max_labels:
        return params
    extra = max_labels - n_labels

    def pad_seg(seg):
        w = np.asarray(seg['w'])
        out = dict(seg)
        out['w'] = np.concatenate(
            [w, np.zeros(w.shape[:3] + (extra,), w.dtype)], axis=-1)
        if 'b' in seg:
            b = np.asarray(seg['b'])
            out['b'] = np.concatenate([b, np.zeros((extra,), b.dtype)])
        return out

    out = jax.tree_util.tree_map(lambda x: x, params)  # shallow-ish copy
    out['decoder'] = dict(params['decoder'])
    out['decoder']['seg_layers'] = [pad_seg(s) for s in
                                    params['decoder']['seg_layers']]
    return out


def stack_groups(group_params: Sequence[dict],
                 label_counts: Sequence[int]) -> Tuple[dict, int]:
    """Stack per-group params into one pytree with a leading group axis.
    Heads are padded to the max label count. Returns (stacked, max_labels).

    Requires identical architectures across groups (true for the published
    ts2d-v2/v1 sets, which share one plans configuration per release)."""
    max_labels = max(label_counts)
    padded = [pad_head(p, n, max_labels)
              for p, n in zip(group_params, label_counts)]
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *padded)
    return stacked, max_labels


def ensemble_forward(forward_fn, stacked_params, x: jnp.ndarray) -> jnp.ndarray:
    """(G-stacked params, (N,H,W,C)) -> (G,N,H,W,Lmax): one vmapped U-Net
    call over the group axis; all groups share the projected input."""
    return jax.vmap(lambda p: forward_fn(p, x))(stacked_params)


def ensemble_forward_sharded(forward_fn, stacked_params, x: jnp.ndarray,
                             mesh, ensemble_axis: str = 'ensemble') -> jnp.ndarray:
    """Ensemble forward with the group axis spread over a mesh axis.

    Uses a partial-manual shard_map over the ensemble axis (each device
    slice runs its own groups; 'data'/'model' axes stay with the automatic
    SPMD partitioner). This is both the natural expression — groups are
    independent, no cross-group communication exists — and a deliberate
    bypass of the GSPMD grouped-conv path: vmapping a strided conv over
    params sharded on the vmapped axis miscompiles in XLA's partitioner
    (verified on the CPU backend, jax 0.9), so the ensemble axis must not
    go through it.
    """
    from jax.sharding import PartitionSpec as P

    def local(p_local, x_full):
        return jax.vmap(lambda p: forward_fn(p, x_full))(p_local)

    fn = jax.shard_map(local, mesh=mesh,
                       in_specs=(P(ensemble_axis), P()),
                       out_specs=P(ensemble_axis),
                       axis_names=frozenset({ensemble_axis}))
    return fn(stacked_params, x)


def split_group_outputs(logits: jnp.ndarray,
                        label_counts: Sequence[int]) -> List[jnp.ndarray]:
    """Slice the padded (G, ..., Lmax) ensemble output back into per-group
    (..., L_g) arrays."""
    return [logits[g, ..., :n] for g, n in enumerate(label_counts)]


def merge_multilabel(logits: jnp.ndarray, label_counts: Sequence[int],
                     threshold: bool = True) -> jnp.ndarray:
    """On-device 117-channel merge: sigmoid-threshold each group's valid
    channels and concatenate along the label axis (the device-side
    equivalent of combine_segmentations, reference image.py:490-510)."""
    parts = []
    for g, n in enumerate(label_counts):
        part = logits[g, ..., :n]
        if threshold:
            part = (jax.nn.sigmoid(part) > 0.5).astype(jnp.uint8)
        parts.append(part)
    return jnp.concatenate(parts, axis=-1)
