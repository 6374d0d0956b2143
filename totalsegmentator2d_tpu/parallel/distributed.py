"""Multi-process (multi-host) execution: the DCN tier.

One process already scales over every locally-addressable chip through
jax.sharding meshes (parallel/mesh.py). This module adds the multi-process
runtime — jax.distributed initialization plus the host-local <-> global
array plumbing — so the SAME cohort-inference and training programs run
unchanged across TPU pod slices (and, in tests, a multi-host CPU cluster
over gloo collectives). The reference has no distributed backend at all
(SURVEY.md §5 'Distributed communication backend': multiprocessing.Manager
proxies + temp-file NRRD hand-off, single machine); this is the scale-out
story the TPU build adds on top of API parity.

No function here issues an explicit collective: data stays expressed as
global jax.Arrays with NamedShardings, and XLA's SPMD partitioner inserts
the psums/all-gathers — over ICI within a slice, DCN across slices.

Typical pod-slice flow::

    init_distributed()                      # env-autodetected on TPU pods
    mesh = global_mesh()                    # all chips of all hosts
    mine = vols[process_shard(len(vols))]   # this host's share of the work
    segs = predict_cohort_distributed(engine, mine, spacing, modes,
                                      mesh=mesh)
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

__all__ = ['init_distributed', 'is_distributed', 'process_shard',
           'global_mesh', 'distribute_batch', 'replicate', 'local_shard',
           'predict_cohort_distributed']


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     local_device_ids=None, **kwargs) -> Tuple[int, int]:
    """Join (or form) the multi-process JAX runtime.

    On TPU pod slices every argument is autodetected from the environment
    (jax.distributed's cluster detection); on a hand-rolled cluster pass
    ``coordinator_address='host:port'``, ``num_processes`` and
    ``process_id`` explicitly. Must run before the backend initializes.

    :returns: ``(process_id, num_processes)`` after initialization.
    """
    import jax
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id,
                               local_device_ids=local_device_ids, **kwargs)
    return jax.process_index(), jax.process_count()


def is_distributed() -> bool:
    """True when more than one process shares the JAX runtime."""
    import jax
    return jax.process_count() > 1


def process_shard(n: int, num_processes: Optional[int] = None,
                  process_id: Optional[int] = None) -> slice:
    """This process's contiguous, balanced share of ``n`` work items
    (the remainder spreads one-each over the first processes)."""
    import jax
    nproc = jax.process_count() if num_processes is None else num_processes
    pid = jax.process_index() if process_id is None else process_id
    base, rem = divmod(n, nproc)
    start = pid * base + min(pid, rem)
    return slice(start, start + base + (1 if pid < rem else 0))


def global_mesh(axes: Optional[Dict[str, int]] = None):
    """A mesh over ALL global devices (every chip of every host).

    ``jax.devices()`` orders devices process-major, so a mesh built from it
    lays consecutive index blocks of the leading axis onto consecutive
    processes — the layout :func:`distribute_batch` assembles host-local
    shards against. Default: one 'data' axis spanning everything.
    """
    import jax
    from .mesh import make_mesh
    devices = jax.devices()
    if axes is None:
        axes = {'data': len(devices)}
    return make_mesh(axes, devices=devices)


def distribute_batch(tree, mesh, axis: str = 'data'):
    """Assemble per-process host-local arrays into global jax.Arrays whose
    leading dimension shards over ``axis`` (each process contributes its own
    rows — the distributed input-pipeline pattern). Works on pytrees
    (e.g. ``{'image': ..., 'target': ...}`` training batches)."""
    import jax
    from jax.experimental import multihost_utils as mh
    from jax.sharding import PartitionSpec as P

    def one(x):
        x = np.ascontiguousarray(x)
        spec = P(axis, *([None] * (x.ndim - 1)))
        return mh.host_local_array_to_global_array(x, mesh, spec)

    return jax.tree_util.tree_map(one, tree)


def replicate(tree, mesh):
    """Turn host arrays (identical on every process, e.g. model params)
    into fully-replicated global jax.Arrays on the mesh."""
    import jax
    from jax.experimental import multihost_utils as mh
    from jax.sharding import PartitionSpec as P

    return jax.tree_util.tree_map(
        lambda x: mh.host_local_array_to_global_array(
            np.ascontiguousarray(x), mesh, P()), tree)


def local_shard(global_arr, mesh, axis: str = 'data') -> np.ndarray:
    """This process's host-local block of a global array sharded on
    ``axis`` (leading dimension)."""
    from jax.experimental import multihost_utils as mh
    from jax.sharding import PartitionSpec as P
    spec = P(axis, *([None] * (global_arr.ndim - 1)))
    return np.asarray(mh.global_array_to_host_local_array(
        global_arr, mesh, spec))


def predict_cohort_distributed(engine, vols, spacing_yx: Sequence[float],
                               modes: Sequence[str], mesh=None,
                               gather: bool = False) -> np.ndarray:
    """Cohort inference across every host's chips: each process passes ITS
    OWN shard of the cohort (counts may differ; :func:`process_shard` splits
    one), the shards assemble into one global data-parallel batch, and ONE
    SPMD program serves all of it.

    :param engine: an :class:`~..inference.EnsembleEngine`; its params must
        be identical on every process (they are replicated onto the mesh).
    :param vols: this process's (n_local, Z, Y, X) same-shape RAI volumes.
    :param mesh: a :func:`global_mesh`-style mesh whose leading/'data' axis
        spans all devices process-major. Default: ``global_mesh()``.
    :param gather: return the FULL cohort's segmentations on every process
        (an allgather over DCN) instead of only this process's shard.
    :returns: merged multilabel segs — (n_local, Z, X, sum L) uint8, or the
        full (sum n_i, ...) cohort with ``gather=True`` (process-rank order,
        matching :func:`process_shard`'s contiguous split).
    """
    import jax
    from jax.experimental import multihost_utils as mh
    from ..inference.ensemble_engine import _mesh_key, unpack_bits
    from ..utils.logging import log

    vols = np.ascontiguousarray(vols)
    if vols.ndim != 4:
        raise ValueError(f'expected (n, Z, Y, X) volumes, got {vols.shape}')

    if any(engine.spec.preprocess.use_mask_for_norm):
        # exact masked normalization projects on the HOST (hole-filled
        # masks, see predict_cohort) — the data never crosses processes, so
        # each process serves its own shard locally and only the optional
        # gather is a collective. An empty shard still MUST reach the
        # gather (its absence would deadlock the other ranks' allgather).
        if vols.shape[0]:
            local = engine.predict_cohort(vols, spacing_yx, modes)
        else:
            local = np.zeros((0, vols.shape[1], vols.shape[3],
                              engine.total_labels), np.uint8)
        return _gather_uneven(local) if gather else local

    if mesh is None:
        mesh = global_mesh()
    data_axis = 'data' if 'data' in mesh.axis_names else mesh.axis_names[0]
    nproc = jax.process_count()
    ldc = int(mesh.shape[data_axis]) // nproc  # devices per process on axis
    if ldc * nproc != int(mesh.shape[data_axis]):
        raise ValueError('the data axis must divide evenly across processes')

    # every process must contribute an equal block of the global batch, a
    # multiple of its device share: pad to the cohort-wide max (padding
    # rows repeat the last scan — or zeros for an empty shard — and are
    # dropped before returning)
    n_local = int(vols.shape[0])
    counts = np.asarray(mh.process_allgather(np.asarray([n_local]))
                        ).reshape(-1)
    block = max(ldc, -(-int(counts.max()) // ldc) * ldc)
    if n_local < block:
        filler = (np.repeat(vols[-1:], block - n_local, axis=0) if n_local
                  else np.zeros((block,) + vols.shape[1:], vols.dtype))
        padded = np.concatenate([vols, filler]) if n_local else filler
    else:
        padded = vols
    n_global = block * nproc

    glob = distribute_batch(padded, mesh, data_axis)
    key = ('cohort', (n_global,) + tuple(vols.shape[1:]),
           tuple(round(float(s), 6) for s in spacing_yx), tuple(modes),
           _mesh_key(mesh))
    pkey = ('dist-params', _mesh_key(mesh))
    with engine._cache_lock:
        hit = engine._cache.get(key)
        if hit is None:
            # mesh is always set here, so the builder returns the PLAIN
            # packed wire (cmeta None) — the cross-process gather moves
            # one sharded array
            hit = engine._build_cohort(n_global, tuple(vols.shape[1:]),
                                       tuple(spacing_yx), tuple(modes),
                                       mesh)
            engine._cache[key] = hit
            log(f'compiled distributed cohort program for '
                f'batch={n_global} shape={vols.shape[1:]} over '
                f'{nproc} processes x {ldc} devices')
        fn, _ = hit
        params = engine._cache.get(pkey)
        if params is None:
            # params replicate onto the global mesh once (committed global
            # arrays; the builder's replicated in_shardings then match)
            host = jax.tree_util.tree_map(np.asarray, engine.params)
            params = replicate(host, mesh)
            engine._cache[pkey] = params

    out = fn(params, glob)  # (n_global, Z, X, packed) sharded on data_axis
    mine = local_shard(out, mesh, data_axis)
    segs = unpack_bits(mine, engine.total_labels)[:n_local]
    return _gather_uneven(segs) if gather else segs


def _gather_uneven(local: np.ndarray) -> np.ndarray:
    """Allgather per-process result blocks of UNEQUAL first-dimension
    length: pad to the max count, gather, trim."""
    import jax
    from jax.experimental import multihost_utils as mh
    nproc = jax.process_count()
    counts = np.asarray(mh.process_allgather(
        np.asarray([local.shape[0]]))).reshape(-1)
    m = int(counts.max())
    if local.shape[0] < m:
        pad = np.zeros((m - local.shape[0],) + local.shape[1:], local.dtype)
        local = np.concatenate([local, pad])
    everyone = np.asarray(mh.process_allgather(local, tiled=False))
    return np.concatenate([everyone[p, :counts[p]] for p in range(nproc)])
