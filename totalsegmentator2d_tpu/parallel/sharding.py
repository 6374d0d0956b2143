"""Sharding rules for U-Net parameter/activation pytrees.

Tensor parallelism for a conv net: weights shard on the *output-channel*
axis (the last axis of HWIO / HWOI layouts), biases and norm affine params
shard on their channel axis. Activations then carry channels-last sharding;
XLA's SPMD partitioner inserts the all-gathers between layers where a conv
needs its full input-channel fan-in. Data parallelism shards the leading
batch axis. The ensemble axis (stacked group/fold models) shards the leading
stacking axis of every leaf.

Axes that do not divide evenly by the mesh axis size (e.g. a 3-label
segmentation head under model=2) replicate instead — XLA requires exact
divisibility for sharded dims.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _axis_size(mesh: Mesh, name: Optional[str]) -> int:
    if name is None or name not in mesh.axis_names:
        return 0
    return int(mesh.shape[name])


def param_spec(shape: Sequence[int], mesh: Mesh, model_axis: Optional[str],
               ensemble_axis: Optional[str] = None,
               stacked: bool = False) -> P:
    """PartitionSpec for one param leaf: channels (last axis) on the model
    axis, optional leading stack axis on the ensemble axis. Non-divisible
    axes replicate."""
    ndim = len(shape)
    ens = _axis_size(mesh, ensemble_axis)
    mdl = _axis_size(mesh, model_axis)

    spec = [None] * ndim
    i0 = 0
    if stacked and ndim >= 1:
        if ens and shape[0] % ens == 0:
            spec[0] = ensemble_axis
        i0 = 1
    if ndim - i0 >= 1 and mdl and shape[-1] % mdl == 0:
        spec[-1] = model_axis
    return P(*spec)


def param_shardings(params, mesh: Mesh, model_axis: Optional[str] = 'model',
                    ensemble_axis: Optional[str] = None, stacked: bool = False):
    """The NamedSharding pytree (for jit in_shardings/out_shardings)."""
    return jax.tree_util.tree_map(
        lambda leaf: NamedSharding(
            mesh, param_spec(leaf.shape, mesh, model_axis, ensemble_axis,
                             stacked)),
        params)


def shard_params(params, mesh: Mesh, model_axis: Optional[str] = 'model',
                 ensemble_axis: Optional[str] = None, stacked: bool = False):
    """Apply NamedShardings to a params pytree (device_put)."""
    shardings = param_shardings(params, mesh, model_axis, ensemble_axis,
                                stacked)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


def batch_sharding(mesh: Mesh, data_axis: str = 'data', ndim: int = 4,
                   ensemble_axis: Optional[str] = None,
                   stacked: bool = False) -> NamedSharding:
    """Sharding for (N, H, W, C) batches (optionally with a leading stacked
    ensemble axis)."""
    lead = (ensemble_axis if (ensemble_axis and
                              ensemble_axis in mesh.axis_names) else None,)
    lead = lead if stacked else ()
    da = data_axis if data_axis in mesh.axis_names else None
    spec = lead + (da,) + (None,) * (ndim - 1)
    return NamedSharding(mesh, P(*spec))
