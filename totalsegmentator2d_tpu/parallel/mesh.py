"""Device mesh construction helpers.

The workload's parallel axes (see SURVEY.md §2.3 for why the reference has
none of this — it shipped a host process pool instead):

 - 'data'     : batch/cohort data parallelism (DP)
 - 'model'    : tensor parallelism over U-Net feature channels (TP)
 - 'ensemble' : the independent anatomical-group models (EP — the ensemble
                is embarrassingly parallel, one group per device slice)

All communication is expressed through jax.sharding annotations; XLA's SPMD
partitioner inserts the ICI collectives.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axes: Dict[str, int], devices: Optional[Sequence] = None) -> Mesh:
    """Build a Mesh with named axes, e.g. make_mesh({'data': 4, 'model': 2})."""
    if devices is None:
        devices = jax.devices()
    n = int(np.prod(list(axes.values())))
    if n > len(devices):
        raise ValueError(f'Mesh needs {n} devices, only {len(devices)} available')
    grid = np.asarray(devices[:n]).reshape(tuple(axes.values()))
    return Mesh(grid, tuple(axes.keys()))


def auto_axes(n_devices: int, want_ensemble: bool = True) -> Dict[str, int]:
    """A reasonable default factorization of n devices into
    (ensemble, data, model)."""
    axes: Dict[str, int] = {}
    rem = n_devices
    if want_ensemble and rem % 2 == 0 and rem >= 4:
        axes['ensemble'] = 2
        rem //= 2
    if rem % 2 == 0 and rem >= 4:
        axes['data'] = rem // 2
        axes['model'] = 2
    else:
        axes['data'] = rem
    return axes


def named(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))
