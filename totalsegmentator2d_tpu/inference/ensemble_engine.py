"""EnsembleEngine: the whole anatomical-group ensemble as ONE device program.

Where InferenceEngine runs a single group model, this stacks all G group
models (heads padded to the widest label count, parallel/ensemble.py) and
F folds into one params pytree and compiles ONE XLA program per input shape:

    normalize -> resample -> pad
    -> scan tiles: TTA batch -> lax.map over (G x F) U-Nets -> Gaussian blend
    -> inverse resample -> per-group sigmoid>0.5 -> on-device 117-ch
    concat + bit-packing (downloads are the bottleneck on remote devices)

This is the TPU-native replacement for the reference's five resident
predictor processes run sequentially per case (tool.py:110-112,
SURVEY.md §2.3): one dispatch, one compile, all groups share the projection
input and the memory traffic of every stage.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.plans import ModelSpec
from ..models.unet import forward
from ..ops.gaussian import gaussian_map
from ..ops.normalize import nonzero_norm_mask, normalize_channels
from ..ops.resample import apply_separable, axis_weights, bspline_prefilter
from ..parallel.ensemble import pad_head
from ..utils.jaxcache import enable_compilation_cache
from ..utils.logging import log
from .engine import _mirror_combos, _nonzero_bbox, compute_new_shape
from .tiling import pad_amounts, padded_shape, tile_positions


def _pack_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """Pack a (..., L) array of 0/1 uint8 into (..., ceil(L/8)) uint8,
    little bit order (numpy np.unpackbits(..., bitorder='little'))."""
    L = bits.shape[-1]
    Lpad = -(-L // 8) * 8
    if Lpad != L:
        bits = jnp.pad(bits, [(0, 0)] * (bits.ndim - 1) + [(0, Lpad - L)])
    grouped = bits.reshape(bits.shape[:-1] + (Lpad // 8, 8))
    weights = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.uint8)
    return jnp.sum(grouped * weights, axis=-1, dtype=jnp.uint8)


def unpack_bits(packed: np.ndarray, n_labels: int) -> np.ndarray:
    """Host-side inverse of _pack_bits."""
    bits = np.unpackbits(packed, axis=-1, bitorder='little')
    return bits[..., :n_labels]


class EnsembleEngine:
    """Fused multi-group multi-fold inference.

    :param specs: per-group ModelSpecs; architectures must match except for
        the segmentation-head width, and preprocessing must be identical
        (true for the published ts2d model sets, which share one plans
        configuration per release).
    :param group_fold_params: params[group][fold] pytrees
    """

    def __init__(self, specs: Sequence[ModelSpec],
                 group_fold_params: Sequence[Sequence[dict]],
                 tile_step_size: float = 0.5, use_mirroring: bool = True,
                 dtype=jnp.float32, compute_dtype=None,
                 tile_mesh=None, tile_axis: str = 'data'):
        if not specs:
            raise ValueError('At least one group is required')
        self.specs = list(specs)
        self.spec = specs[0]
        for s in specs[1:]:
            if s.preprocess != self.spec.preprocess:
                raise ValueError('All groups must share one preprocessing '
                                 'configuration')
            if s.arch.in_channels != self.spec.arch.in_channels:
                raise ValueError('All groups must share the input channels')
        self.label_counts = [s.arch.out_channels for s in specs]
        # packed output channels per group: softmax groups drop background
        self.output_label_counts = [
            s.arch.out_channels - (0 if s.multilabel else 1) for s in specs]
        self.max_labels = max(self.label_counts)
        self.n_groups = len(specs)
        self.n_folds = len(group_fold_params[0])
        if any(len(f) != self.n_folds for f in group_fold_params):
            raise ValueError('All groups must provide the same fold count')
        self.tile_step_size = float(tile_step_size)
        self.use_mirroring = bool(use_mirroring)
        self.dtype = dtype
        # compute_dtype=jnp.bfloat16: bf16 conv operands (fp32 accumulation
        # and norms) for ~2x MXU throughput; None = exact fp32
        self.compute_dtype = compute_dtype
        # tile_mesh: spatial parallelism — the sliding-window tile grid
        # shards over mesh axis `tile_axis`, partial accumulators psum over
        # ICI (multi-chip single-scan latency scaling)
        self.tile_mesh = tile_mesh
        self.tile_axis = tile_axis
        enable_compilation_cache()

        # stack: per group pad heads + stack folds -> (F, ...); then stack
        # groups -> (G, F, ...)
        per_group = []
        for g, folds in enumerate(group_fold_params):
            padded = [pad_head(p, self.label_counts[g], self.max_labels)
                      for p in folds]
            per_group.append(jax.tree_util.tree_map(
                lambda *xs: np.stack([np.asarray(x) for x in xs]), *padded))
        # with a bf16 compute dtype, store the weights in bf16 up front so
        # the per-block casts inside the tile scan are no-ops (weights would
        # otherwise be re-cast on every scan step)
        store_dtype = compute_dtype if compute_dtype is not None else dtype
        self.params = jax.tree_util.tree_map(
            lambda *xs: jnp.asarray(np.stack(xs), store_dtype), *per_group)
        self._cache: Dict[Tuple, object] = {}

    @property
    def total_labels(self) -> int:
        """Total packed output channels (softmax groups contribute
        out_channels - 1: background is dropped on device)."""
        return sum(self.output_label_counts)

    def labels(self) -> Dict[int, str]:
        """Merged label map: 1-based values in group order (the order the
        reference's combine_segmentations produces)."""
        out: Dict[int, str] = {}
        v = 0
        for s in self.specs:
            for _, name in sorted(s.labels.items()):
                v += 1
                out[v] = name
        return out

    # -- program construction ----------------------------------------------

    def _build(self, in_shape: Tuple[int, int], in_spacing: Tuple[float, float]):
        spec = self.spec
        pre = spec.preprocess
        C = spec.arch.in_channels
        Lp = self.max_labels
        G = self.n_groups
        patch = tuple(pre.patch_size)

        rs_shape = compute_new_shape(in_shape, in_spacing, pre.spacing)
        pad_shape = padded_shape(rs_shape, patch)
        pads = pad_amounts(rs_shape, pad_shape)
        tiles = tile_positions(pad_shape, patch, self.tile_step_size)
        mirrors = _mirror_combos(spec.allowed_mirroring_axes
                                 if self.use_mirroring else ())
        n_mirror = len(mirrors)
        gauss = jnp.asarray(gaussian_map(patch), self.dtype)[..., None]

        def _w(n_in, n_out, order):
            if n_in == n_out:
                return None
            coords = (np.arange(n_out) + 0.5) * (n_in / n_out) - 0.5
            return jnp.asarray(axis_weights(n_in, coords, order, outside='edge'),
                               self.dtype)

        w_down = [_w(in_shape[k], rs_shape[k], 3) for k in range(2)]
        w_up = [_w(rs_shape[k], in_shape[k], 1) for k in range(2)]
        tiles_j = jnp.asarray(tiles)
        label_counts = list(self.label_counts)

        def tta_batch(tile):
            return jnp.stack([tile if not m else jnp.flip(tile, axis=m)
                              for m in mirrors], axis=0)

        def tta_merge(logits):
            outs = [logits[i] if not m else jnp.flip(logits[i], axis=m)
                    for i, m in enumerate(mirrors)]
            return sum(outs) / float(n_mirror)

        compute_dtype = self.compute_dtype
        G_, F_ = self.n_groups, self.n_folds

        def net(params, x):
            # (G, F, ...) params; x (M, ph, pw, C) -> (G, M, ph, pw, Lp).
            # lax.map (scan), NOT vmap: vmapping convs over stacked weights
            # lowers to grouped convolutions, which the TPU executes at a
            # few percent of MXU peak — sequential standard convs are ~10x
            # faster here and the (G*F) trip count is tiny.
            flat = jax.tree_util.tree_map(
                lambda a: a.reshape((G_ * F_,) + a.shape[2:]), params)
            outs = jax.lax.map(
                lambda p: forward(p, x, spec.arch,
                                  compute_dtype=compute_dtype), flat)
            outs = outs.reshape((G_, F_) + outs.shape[1:])
            return jnp.mean(outs, axis=1)  # fold average

        needs_mask = any(pre.use_mask_for_norm)

        def program(params, arr, nz_mask=None):
            work = arr.astype(self.dtype)
            work = normalize_channels(work, pre, nz_mask)
            if any(w is not None for w in w_down):
                pref = bspline_prefilter(work, [k for k in range(2)
                                                if w_down[k] is not None])
                work = apply_separable(pref, w_down, axes=(0, 1))
            work = jnp.pad(work, pads + [(0, 0)])

            acc0 = jnp.zeros((G,) + pad_shape + (Lp,), self.dtype)
            wacc0 = jnp.zeros(pad_shape + (1,), self.dtype)

            # per-tile scan with the TTA mirrors as the forward batch (M=4).
            # Measured on v5e: this beats gathering all tiles into one big
            # batch (T*M), whose large activations push XLA into a ~4x
            # slower conv schedule.
            def step(carry, inp):
                pos, valid = inp
                acc, wacc = carry
                tile = jax.lax.dynamic_slice(
                    work, (pos[0], pos[1], 0), (patch[0], patch[1], C))
                logits = net(params, tta_batch(tile))        # (G, M, ph, pw, Lp)
                g = gauss * valid  # padding tiles (spatial sharding) weigh 0
                merged = jax.vmap(tta_merge)(logits) * g      # (G, ph, pw, Lp)
                cur = jax.lax.dynamic_slice(
                    acc, (0, pos[0], pos[1], 0), (G, patch[0], patch[1], Lp))
                acc = jax.lax.dynamic_update_slice(
                    acc, cur + merged, (0, pos[0], pos[1], 0))
                wcur = jax.lax.dynamic_slice(
                    wacc, (pos[0], pos[1], 0), (patch[0], patch[1], 1))
                wacc = jax.lax.dynamic_update_slice(
                    wacc, wcur + g, (pos[0], pos[1], 0))
                return (acc, wacc), None

            def tile_loop(my_tiles, my_valid, init):
                return jax.lax.scan(step, init, (my_tiles, my_valid))[0]

            if self.tile_mesh is None:
                acc, wacc = tile_loop(tiles_j,
                                      jnp.ones((len(tiles), 1), self.dtype),
                                      (acc0, wacc0))
            else:
                # spatial parallelism over the tile grid: each device slice
                # runs its share of the sliding window, partial Gaussian
                # accumulators merge with one psum over ICI
                from jax.sharding import PartitionSpec as P
                mesh, ax = self.tile_mesh, self.tile_axis
                D = int(mesh.shape[ax])
                T = len(tiles)
                Tpad = -(-T // D) * D
                tiles_padded = np.zeros((Tpad, 2), np.int32)
                tiles_padded[:T] = tiles
                valid = np.zeros((Tpad, 1), np.float32)
                valid[:T] = 1.0

                def sharded(my_tiles, my_valid):
                    # the closed-over zero carry must be marked varying over
                    # the manual axis before it can thread through the scan
                    init = (jax.lax.pcast(acc0, ax, to='varying'),
                            jax.lax.pcast(wacc0, ax, to='varying'))
                    acc, wacc = tile_loop(my_tiles, my_valid, init)
                    return (jax.lax.psum(acc, ax), jax.lax.psum(wacc, ax))

                acc, wacc = jax.shard_map(
                    sharded, mesh=mesh, in_specs=(P(ax), P(ax)),
                    out_specs=(P(), P()), axis_names=frozenset({ax}))(
                        jnp.asarray(tiles_padded),
                        jnp.asarray(valid, self.dtype))
            logits = acc / jnp.maximum(wacc, 1e-8)[None]
            logits = jax.lax.slice(
                logits, (0, pads[0][0], pads[1][0], 0),
                (G, pads[0][0] + rs_shape[0], pads[1][0] + rs_shape[1], Lp))
            if any(w is not None for w in w_up):
                logits = apply_separable(logits, w_up, axes=(1, 2))
            # per-group decision + on-device multilabel concat
            parts = []
            for g, n in enumerate(label_counts):
                lg = logits[g, ..., :n]
                if self.specs[g].multilabel:
                    parts.append((jax.nn.sigmoid(lg) > 0.5).astype(jnp.uint8))
                else:
                    parts.append(jax.nn.one_hot(
                        jnp.argmax(lg, axis=-1), n,
                        dtype=jnp.uint8)[..., 1:])
            seg = jnp.concatenate(parts, axis=-1)
            # bit-pack the one-hot channels on device: host downloads are the
            # bottleneck on remote-attached TPUs (~30 MB/s observed), and the
            # packed masks are 8x smaller; numpy unpacks on the host
            return _pack_bits(seg)

        jitted = jax.jit(program)
        meta = {'rs_shape': rs_shape, 'n_tiles': len(tiles),
                'n_mirror': n_mirror, 'needs_mask': needs_mask}
        return jitted, meta

    def _program(self, in_shape, in_spacing):
        key = (tuple(in_shape), tuple(round(float(s), 6) for s in in_spacing))
        hit = self._cache.get(key)
        if hit is None:
            hit = self._build(tuple(in_shape), tuple(in_spacing))
            self._cache[key] = hit
            log(f'compiled ensemble program for shape={key[0]} '
                f'({self.n_groups} groups, {hit[1]["n_tiles"]} tiles, '
                f'{hit[1]["n_mirror"]} mirrors, {self.n_folds} folds)')
        return hit

    # -- fused volume path ---------------------------------------------------

    def _build_volume(self, vol_shape: Tuple[int, int, int],
                      spacing_yx: Tuple[float, float],
                      modes: Tuple[str, ...]):
        """ONE program for the whole scan: (Z, Y, X) RAI volume in ->
        coronal projections (Z, X, C) + merged multilabel seg out. Removes
        the per-projection device round trips of the unfused path."""
        from ..ops.projection import project_array

        fn2d, meta2d = self._program(vol_shape[::2], spacing_yx)

        def program(params, vol):
            work = vol.astype(self.dtype)
            chans = [jnp.squeeze(project_array(work, m, axis=1), 1)
                     for m in modes]
            x2d = jnp.stack(chans, axis=-1)          # (Z, X, C)
            if meta2d['needs_mask']:
                # device-side mask (no hole fill): CT projections are dense,
                # so this only affects hypothetical masked-norm volume plans
                return fn2d.__wrapped__(params, x2d,
                                        jnp.any(x2d != 0, axis=-1)), x2d
            return fn2d.__wrapped__(params, x2d), x2d

        return jax.jit(program)

    def predict_volume_async(self, vol: np.ndarray,
                             spacing_yx: Sequence[float],
                             modes: Sequence[str]):
        """Dispatch a fused scan prediction without blocking: returns device
        arrays (packed_seg, proj) — the seg is bit-packed (see unpack_bits).
        Use for pipelined throughput: queue several scans, jax.device_get,
        then unpack_bits(seg, engine.total_labels) on the host."""
        key = ('vol', vol.shape, tuple(round(float(s), 6) for s in spacing_yx),
               tuple(modes))
        fn = self._cache.get(key)
        if fn is None:
            fn = self._build_volume(tuple(vol.shape), tuple(spacing_yx),
                                    tuple(modes))
            self._cache[key] = fn
            log(f'compiled fused volume program for shape={vol.shape}')
        return fn(self.params, jax.device_put(np.ascontiguousarray(vol)))

    def predict_volume(self, vol: np.ndarray, spacing_yx: Sequence[float],
                       modes: Sequence[str]) -> Tuple[np.ndarray, np.ndarray]:
        """Fully fused scan prediction. ``vol``: (Z, Y, X) RAI-oriented
        array; projections are taken along the coronal (Y) axis. Returns
        (merged multilabel seg (Z, X, sum L), projections (Z, X, C)).

        Skips the nnU-Net nonzero-crop: coronal MIP/AIP of CT volumes in
        Hounsfield units are dense (air is -1000, not 0), so the crop is a
        no-op on this modality; use predict_array for inputs where exact
        crop semantics matter."""
        seg, proj = self.predict_volume_async(vol, spacing_yx, modes)
        return (unpack_bits(np.asarray(jax.device_get(seg)), self.total_labels),
                np.asarray(jax.device_get(proj)))

    # -- cohort (batched / multi-chip data-parallel) path ---------------------

    def _build_cohort(self, n: int, vol_shape: Tuple[int, int, int],
                      spacing_yx: Tuple[float, float],
                      modes: Tuple[str, ...], mesh=None):
        """Batched fused program: (N, Z, Y, X) volumes -> (N, Z, X, sum L)
        merged segs. With a mesh, the batch shards over the 'data' axis and
        XLA replicates the (vmapped) per-scan program across chips."""
        from ..ops.projection import project_array

        fn2d, meta2d = self._program(vol_shape[::2], spacing_yx)

        def one(params, vol):
            work = vol.astype(self.dtype)
            chans = [jnp.squeeze(project_array(work, m, axis=1), 1)
                     for m in modes]
            x2d = jnp.stack(chans, axis=-1)
            if meta2d['needs_mask']:
                return fn2d.__wrapped__(params, x2d,
                                        jnp.any(x2d != 0, axis=-1))
            return fn2d.__wrapped__(params, x2d)

        def program(params, vols):
            return jax.vmap(lambda v: one(params, v))(vols)

        if mesh is None:
            return jax.jit(program)
        from jax.sharding import NamedSharding, PartitionSpec as P
        data_axis = 'data' if 'data' in mesh.axis_names else mesh.axis_names[0]
        vspec = NamedSharding(mesh, P(data_axis, None, None, None))
        ospec = NamedSharding(mesh, P(data_axis, None, None, None))
        rep = jax.tree_util.tree_map(
            lambda _: NamedSharding(mesh, P()), self.params)
        return jax.jit(program, in_shardings=(rep, vspec),
                       out_shardings=ospec)

    def predict_cohort(self, vols: np.ndarray, spacing_yx: Sequence[float],
                       modes: Sequence[str], mesh=None) -> np.ndarray:
        """Batched scan prediction: ``vols`` (N, Z, Y, X) same-shape RAI
        volumes. With ``mesh``, data-parallel over its 'data' axis (the
        multi-chip cohort throughput mode; N must divide by the axis size).
        Returns merged multilabel segs (N, Z, X, sum L) uint8."""
        vols = np.ascontiguousarray(vols)
        key = ('cohort', vols.shape,
               tuple(round(float(s), 6) for s in spacing_yx), tuple(modes),
               id(mesh) if mesh is not None else None)
        fn = self._cache.get(key)
        if fn is None:
            fn = self._build_cohort(vols.shape[0], tuple(vols.shape[1:]),
                                    tuple(spacing_yx), tuple(modes), mesh)
            self._cache[key] = fn
            log(f'compiled cohort program for batch={vols.shape[0]} '
                f'shape={vols.shape[1:]}'
                + (f' over mesh {dict(mesh.shape)}' if mesh is not None else ''))
        params = self.params
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            data_axis = 'data' if 'data' in mesh.axis_names else mesh.axis_names[0]
            vols_in = jax.device_put(
                vols, NamedSharding(mesh, P(data_axis, None, None, None)))
            params = jax.device_put(
                params, jax.tree_util.tree_map(
                    lambda _: NamedSharding(mesh, P()), self.params))
        else:
            vols_in = jax.device_put(vols)
        return unpack_bits(np.asarray(jax.device_get(fn(params, vols_in))),
                           self.total_labels)

    # -- host API ------------------------------------------------------------

    def predict_array(self, arr: np.ndarray, spacing_yx: Sequence[float]
                      ) -> np.ndarray:
        """(H, W, C) float array -> (H, W, sum(labels)) merged multilabel
        one-hot uint8."""
        if arr.ndim == 2:
            arr = arr[..., None]
        if arr.shape[-1] != self.spec.arch.in_channels:
            raise ValueError(
                f'Input has {arr.shape[-1]} channels; the models expect '
                f'{self.spec.arch.in_channels}')
        (y0, y1), (x0, x1) = _nonzero_bbox(arr)
        cropped = arr[y0:y1, x0:x1]
        fn, meta = self._program(cropped.shape[:2], spacing_yx)
        args = (self.params, jax.device_put(np.ascontiguousarray(cropped)))
        if meta['needs_mask']:
            args += (jax.device_put(nonzero_norm_mask(cropped)),)
        seg_c = unpack_bits(np.asarray(jax.device_get(fn(*args))),
                            self.total_labels)
        if seg_c.shape[:2] != arr.shape[:2]:
            seg = np.zeros(arr.shape[:2] + (seg_c.shape[-1],), np.uint8)
            seg[y0:y1, x0:x1] = seg_c
            return seg
        return seg_c

    def warmup(self, in_shape: Sequence[int],
               in_spacing: Optional[Sequence[float]] = None) -> None:
        if in_spacing is None:
            in_spacing = self.spec.preprocess.spacing
        dummy = np.zeros(tuple(in_shape) + (self.spec.arch.in_channels,),
                         np.float32)
        self.predict_array(dummy, in_spacing)
