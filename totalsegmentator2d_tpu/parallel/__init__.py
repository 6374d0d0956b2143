"""Multi-device execution: meshes, sharding rules, stacked ensembles."""

from .ensemble import (ensemble_forward, ensemble_forward_sharded,
                       merge_multilabel, pad_head, split_group_outputs,
                       stack_groups)
from .mesh import auto_axes, make_mesh, named
from .sharding import batch_sharding, param_shardings, shard_params

__all__ = ['ensemble_forward', 'ensemble_forward_sharded', 'merge_multilabel',
           'pad_head', 'split_group_outputs', 'stack_groups', 'auto_axes',
           'make_mesh', 'named', 'batch_sharding', 'param_shardings',
           'shard_params']
