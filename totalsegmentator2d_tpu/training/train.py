"""Sharded training step and trainer loop.

nnU-Net optimization recipe (SGD + Nesterov momentum 0.99, poly LR decay,
weight decay 3e-5, Dice+CE/BCE with deep supervision) expressed as a single
pjit-compiled step over a named mesh: batch on 'data', feature channels on
'model', optional stacked group models on 'ensemble'. XLA inserts the
gradient psums (DP) and activation all-gathers (TP) from the sharding
annotations alone — no explicit collectives in user code.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.plans import ArchSpec
from ..models.unet import forward, init_params, stats_override
from ..parallel.sharding import batch_sharding, param_shardings
from .losses import deep_supervision_loss, dice_and_ce


@dataclasses.dataclass
class TrainConfig:
    lr: float = 1e-2
    momentum: float = 0.99
    weight_decay: float = 3e-5
    total_steps: int = 1000
    poly_power: float = 0.9
    deep_supervision: bool = True
    multilabel: bool = True
    # rematerialize the forward in the backward pass: trades FLOPs for HBM,
    # enabling large patches / batches that would not otherwise fit
    remat: bool = False
    # 'bfloat16': conv operands/activations in bf16 for ~2x MXU throughput
    # (params, gradients, optimizer state, logits and the loss stay fp32 —
    # the TPU analogue of the reference stack's torch AMP training; bf16's
    # fp32-matched exponent range needs no loss scaling)
    compute_dtype: Optional[str] = None
    # apply the full on-device nnU-Net augmentation recipe (augment.py)
    # to every batch the Trainer steps on
    augment: bool = False
    # InstanceNorm statistics form for the training step. Training has no
    # bitwise-parity contract (unlike the solo inference program, which
    # matches torch two-pass statistics — unet._one_pass_stats), so it
    # defaults to the one-HBM-traversal E[x^2]-E[x]^2 form; '2pass'
    # restores torch-identical statistics. TS2D_STATS (env) overrides both.
    stats: str = '1pass'

    def __post_init__(self):
        if self.compute_dtype not in (None, 'bfloat16', 'bf16'):
            # fail loudly: a typo (or 'float16', torch-AMP's default) would
            # otherwise silently train in full fp32
            raise ValueError(
                f"compute_dtype must be None or 'bfloat16'; "
                f"got {self.compute_dtype!r} (fp16 is not offered — bf16 "
                f"is the TPU mixed-precision dtype and needs no loss "
                f"scaling)")
        if self.stats not in ('1pass', '2pass'):
            raise ValueError(
                f"stats must be '1pass' or '2pass'; got {self.stats!r}")


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    schedule = optax.polynomial_schedule(
        init_value=cfg.lr, end_value=0.0, power=cfg.poly_power,
        transition_steps=cfg.total_steps)
    return optax.chain(
        optax.add_decayed_weights(cfg.weight_decay),
        optax.sgd(learning_rate=schedule, momentum=cfg.momentum, nesterov=True),
    )


def loss_fn(params, batch, spec: ArchSpec, cfg: TrainConfig):
    x, y = batch['image'], batch['target']
    cdt = jnp.bfloat16 if cfg.compute_dtype in ('bfloat16', 'bf16') else None
    fwd = forward
    if cfg.remat:
        fwd = jax.checkpoint(forward, static_argnums=(2, 3, 4, 5))
    # bf16 heads keep the head conv's backward dtype-consistent; the loss
    # itself always runs fp32. The stats_override context is active while
    # this body TRACES, which is when unet._one_pass_stats is consulted —
    # it covers every jit entry point (Trainer, build_sharded_train_step).
    with stats_override(cfg.stats):
        if cfg.deep_supervision:
            outs = fwd(params, x, spec, True, cdt, cdt)
            outs = [o.astype(jnp.float32) for o in outs]
            return deep_supervision_loss(outs, y, cfg.multilabel)
        logits = fwd(params, x, spec, False, cdt, cdt)
        return dice_and_ce(logits.astype(jnp.float32), y, cfg.multilabel)


def train_step(params, opt_state, batch, *, spec: ArchSpec, cfg: TrainConfig,
               optimizer: optax.GradientTransformation):
    loss, grads = jax.value_and_grad(loss_fn)(params, batch, spec, cfg)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


def ensemble_train_step(params, opt_state, batch, *, spec: ArchSpec,
                        cfg: TrainConfig,
                        optimizer: optax.GradientTransformation):
    """One optimization step for a stacked group ensemble: vmap the whole
    (loss, grad, update) over the leading group axis — groups are
    independent models trained on their own targets."""
    def one(p, s, b):
        return train_step(p, s, b, spec=spec, cfg=cfg, optimizer=optimizer)
    return jax.vmap(one)(params, opt_state, batch)


def build_sharded_train_step(mesh: Mesh, spec: ArchSpec, cfg: TrainConfig,
                             params, *, ensemble: bool = False,
                             spatial: bool = False):
    """jit-compile the train step with explicit in/out shardings over the
    mesh. Returns (step_fn, sharded_params, sharded_opt_state, optimizer).

    ``spatial=True`` switches the 'model' mesh axis from tensor parallelism
    (feature channels) to spatial parallelism: the image *height* axis is
    sharded and XLA's SPMD partitioner inserts the halo exchanges the convs
    need at shard borders — the scale-out path for arbitrarily large 2D
    inputs (the spatial analogue of long-context sequence parallelism,
    SURVEY.md §5)."""
    optimizer = make_optimizer(cfg)
    ens_axis = 'ensemble' if (ensemble and 'ensemble' in mesh.axis_names) else None

    if ensemble:
        inner = functools.partial(train_step, spec=spec, cfg=cfg,
                                  optimizer=optimizer)

        def vstep(p, s, b):
            return jax.vmap(inner)(p, s, b)

        if ens_axis:
            # shard_map over the ensemble axis: groups are independent models
            # (no cross-group communication), and it keeps the vmapped convs
            # out of GSPMD's grouped-conv partitioning, which miscompiles
            # when the vmapped axis is sharded (see parallel/ensemble.py)
            step = jax.shard_map(vstep, mesh=mesh,
                                 in_specs=(P(ens_axis), P(ens_axis), P(ens_axis)),
                                 out_specs=(P(ens_axis), P(ens_axis), P(ens_axis)),
                                 axis_names=frozenset({ens_axis}))
        else:
            step = vstep
    else:
        step = functools.partial(train_step, spec=spec, cfg=cfg,
                                 optimizer=optimizer)

    model_axis = None if spatial else 'model'
    p_sh = param_shardings(params, mesh, model_axis=model_axis,
                           ensemble_axis=ens_axis, stacked=ensemble)
    params = jax.tree_util.tree_map(jax.device_put, params, p_sh)
    opt_state = optimizer.init(params) if not ensemble else \
        jax.vmap(optimizer.init)(params)
    o_sh = jax.tree_util.tree_map(
        lambda leaf: _opt_leaf_sharding(leaf, mesh, ensemble,
                                        model_axis=model_axis), opt_state)

    if spatial and 'model' in mesh.axis_names:
        lead = (ens_axis,) if ens_axis else ()
        x_sh = NamedSharding(mesh, P(*(lead + ('data', 'model', None, None))))
    else:
        x_sh = batch_sharding(mesh, 'data', ndim=4,
                              ensemble_axis=ens_axis, stacked=ensemble)
    y_sh = x_sh
    scalar = NamedSharding(mesh, P(*((ens_axis,) if ens_axis else ())))

    jitted = jax.jit(
        step,
        in_shardings=(p_sh, o_sh, {'image': x_sh, 'target': y_sh}),
        out_shardings=(p_sh, o_sh, scalar),
    )
    return jitted, params, opt_state, optimizer


def _opt_leaf_sharding(leaf, mesh: Mesh, ensemble: bool, model_axis='model'):
    """Optimizer state mirrors param sharding where shapes match params
    (momentum buffers); scalars/counters replicate."""
    if not hasattr(leaf, 'ndim') or leaf.ndim == 0:
        return NamedSharding(mesh, P())
    from ..parallel.sharding import param_spec
    ens_axis = 'ensemble' if ensemble else None
    return NamedSharding(mesh, param_spec(leaf.shape, mesh, model_axis,
                                          ens_axis, stacked=ensemble))


def unpack_target(packed: jnp.ndarray, n_labels: int) -> jnp.ndarray:
    """Device-side inverse of data.pack_target_np: (..., ceil(L/8)) uint8
    bit-plane bytes -> (..., L) uint8 one-hot (bit l of byte w is label
    8w + l). One cheap traversal on device; the wire ships 8x fewer
    bytes."""
    lanes = jnp.arange(8, dtype=jnp.uint8)
    bits = (packed[..., :, None] >> lanes) & jnp.uint8(1)
    flat = bits.reshape(packed.shape[:-1] + (packed.shape[-1] * 8,))
    return flat[..., :n_labels]


class Trainer:
    """Minimal training loop with orbax checkpoint/resume.

    Batches may carry the one-hot target either as ``'target'``
    (N, H, W, L) uint8 or as ``'target_packed'`` bit-plane bytes
    (``data.pack_target_np``); packed targets are unpacked on device
    (bit-identical, 8x fewer host->device wire bytes)."""

    def __init__(self, spec: ArchSpec, cfg: TrainConfig,
                 mesh: Optional[Mesh] = None, seed: int = 0,
                 ensemble_size: Optional[int] = None, spatial: bool = False):
        self.spec = spec
        self.cfg = cfg
        self.mesh = mesh
        self.step_count = 0
        self._augment_fn = None
        self._unpack_fn = None
        self._augment_key = jax.random.PRNGKey(seed ^ 0x5EED)
        key = jax.random.PRNGKey(seed)
        if ensemble_size:
            keys = jax.random.split(key, ensemble_size)
            params = jax.vmap(lambda k: init_params(k, spec))(keys)
            self._ensemble = True
        else:
            params = init_params(key, spec)
            self._ensemble = False

        if mesh is not None:
            (self._step, self.params, self.opt_state,
             self.optimizer) = build_sharded_train_step(
                mesh, spec, cfg, params, ensemble=self._ensemble,
                spatial=spatial)
        else:
            self.optimizer = make_optimizer(cfg)
            self.params = params
            self.opt_state = (self.optimizer.init(params) if not self._ensemble
                              else jax.vmap(self.optimizer.init)(params))
            base = ensemble_train_step if self._ensemble else train_step
            self._step = jax.jit(functools.partial(
                base, spec=spec, cfg=cfg, optimizer=self.optimizer))

    def step(self, batch: Dict[str, jnp.ndarray]):
        if 'target_packed' in batch:
            if self._unpack_fn is None:
                L = self.spec.out_channels
                # fresh lambda per Trainer (same trace-cache rule as the
                # augment fn below)
                self._unpack_fn = jax.jit(
                    lambda p: unpack_target(p, L))
            batch = dict(batch)
            batch['target'] = self._unpack_fn(batch.pop('target_packed'))
        if self.cfg.augment:
            from .augment import augment_batch
            if self._augment_fn is None:
                # fresh lambda, NOT jax.jit(augment_batch): jit's trace
                # cache is global per function OBJECT, so jitting the
                # module-level function directly would reuse another
                # Trainer's trace and ignore this one's TS2D_WARP.
                # On a sharded batch, pin out_shardings to the input's:
                # the partitioned spatial stage's permutation makes GSPMD
                # replicate the output otherwise, gathering the batch to
                # every device before the step resharded it anyway.
                out_sh = None
                if not self._ensemble:
                    sh = getattr(batch['image'], 'sharding', None)
                    if isinstance(sh, jax.sharding.NamedSharding):
                        out_sh = {k: v.sharding for k, v in batch.items()}
                self._augment_fn = jax.jit(
                    lambda k, b: augment_batch(k, b),
                    **({'out_shardings': out_sh} if out_sh else {}))
            self._augment_key, sub = jax.random.split(self._augment_key)
            if self._ensemble:
                # (G, N, ...) batches: each group draws its own augmentations
                G = batch['image'].shape[0]
                subs = jax.random.split(sub, G)
                batch = jax.vmap(self._augment_fn)(subs, batch)
            else:
                batch = self._augment_fn(sub, batch)
        self.params, self.opt_state, loss = self._step(
            self.params, self.opt_state, batch)
        self.step_count += 1
        return loss

    # -- checkpointing ------------------------------------------------------

    def save_checkpoint(self, path: str) -> None:
        import orbax.checkpoint as ocp
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, {'params': self.params, 'opt_state': self.opt_state,
                          'step': self.step_count}, force=True)
        ckptr.wait_until_finished()

    def restore_checkpoint(self, path: str) -> None:
        import orbax.checkpoint as ocp
        ckptr = ocp.StandardCheckpointer()
        target = {'params': self.params, 'opt_state': self.opt_state,
                  'step': self.step_count}
        restored = ckptr.restore(path, target)
        self.params = restored['params']
        self.opt_state = restored['opt_state']
        self.step_count = int(restored['step'])
