"""EnsembleEngine: the whole anatomical-group ensemble as ONE device program.

Where InferenceEngine runs a single group model, this stacks all G group
models (heads padded to the widest label count, parallel/ensemble.py) and
F folds into one params pytree and compiles ONE XLA program per input shape:

    normalize -> resample -> pad
    -> tile×TTA-batched forwards (lax.map over the G x F U-Nets, chunked
       lax.scan over tile batches) -> Gaussian overlap-add
    -> inverse resample -> per-group sigmoid>0.5 -> on-device 117-ch
    concat + bit-packing (downloads are the bottleneck on remote devices)

This is the TPU-native replacement for the reference's five resident
predictor processes run sequentially per case (tool.py:110-112,
SURVEY.md §2.3): one dispatch, one compile, all groups share the projection
input and the memory traffic of every stage.
"""

from __future__ import annotations

import threading
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.plans import ModelSpec
from ..models.unet import forward, stats_override
from ..ops.gaussian import gaussian_map
from ..ops.normalize import nonzero_norm_mask, normalize_channels
from ..ops.resample import apply_separable, axis_weights, bspline_prefilter
from ..parallel.ensemble import pad_head
from ..utils.jaxcache import enable_compilation_cache
from ..utils.logging import log, warn
from .engine import _mirror_combos, _nonzero_bbox, compute_new_shape
from .tiling import accumulate_tiles, pad_amounts, padded_shape, tile_positions


def _mesh_key(mesh) -> Optional[Tuple]:
    """GC-stable cache identity for a Mesh. id(mesh) is unsafe: a dead
    mesh's address can be reused by a new one, silently serving a cached
    program whose NamedShardings point at the dead mesh. Axis names +
    sizes + the device ids pin the identity instead."""
    if mesh is None:
        return None
    return (tuple(mesh.axis_names), tuple(mesh.shape.values()),
            tuple(d.id for d in mesh.devices.flat))


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
    """Host-side inverse of _pack_bits. Unpacks the flattened buffer (the
    axis= path of np.unpackbits is measurably slower, and device_get can
    hand back non-contiguous views that would push it onto a slow path)."""
    packed = np.ascontiguousarray(packed)
    bits = np.unpackbits(packed.reshape(-1), bitorder='little')
    bits = bits.reshape(packed.shape[:-1] + (packed.shape[-1] * 8,))
    return bits[..., :n_labels]


# -- compacted mask wire: ship only the nonzero tiles of the packed masks -----
#
# Bit-packing alone still ships ~1 byte per pixel per 8 labels; on real
# anatomy the one-hot masks are SPARSE (per-label foreground is a few
# percent of a projection), so most packed bytes are zero. The program
# compacts the packed byte stream on device — plane-major tiles of
# _COMPACT_TILE bytes, occupied tiles scattered to a dense prefix via
# cumsum positions (no sort) — and returns (buf, occupancy bitmap). The
# host fetches the tiny bitmap (whose popcount sizes a bucketed PREFIX
# of the buffer) and, concurrently, speculatively fetches the bucket the
# LAST result of the same program needed (fetch_compact's hint): only
# the prefix crosses the wire, and on a hint cover the bitmap round-trip
# costs no wall time. Sparse masks ship 4-15x fewer bytes through the
# download wire (the measured pipeline floor on remote-attached TPUs,
# docs/performance.md), while dense masks degrade to a full fetch plus a
# ~1.6% bitmap overhead. Reconstruction is bit-identical by construction
# (tiles move losslessly; the buffer's trash row for unoccupied scatter
# targets is never read back).

_COMPACT_TILE = 8


def _compact_meta(h: int, w: int, n_bytes: int) -> dict:
    total = h * w * n_bytes
    return {'shape': (h, w, n_bytes),
            'T': -(-total // _COMPACT_TILE)}


def prefix_buckets(T: int) -> Tuple[int, ...]:
    """Fetchable prefix lengths (occupied-tile counts round UP to one of
    these). Fixed fractions of the tile count keep the slice-program
    count bounded: each distinct prefix shape is a tiny device program,
    and every compile costs real time through a remote tunnel."""
    return tuple(sorted({max(1, -(-T // 16)), -(-T // 8), -(-T // 4),
                         -(-T // 2), T + 1}))


def pick_prefix(count: int, T: int) -> int:
    for b in prefix_buckets(T):
        if b >= count:
            return b
    return T + 1  # pragma: no cover — the last bucket always covers


def _compact_pack(packed: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Device side: (H, W, nB) bit-packed masks -> (buf, occ) where
    ``buf`` is (T+1, _COMPACT_TILE) uint8 with the occupied plane-major
    tiles compacted to a dense prefix (row T is the trash target for
    unoccupied tiles) and ``occ`` is the packed tile-occupancy bitmap.
    The occupied count is NOT shipped separately — the host derives it
    from the bitmap (one fewer wire fetch).

    The prefix is built as a 4-byte index scatter + row GATHER, not a
    64-byte row scatter: `zeros.at[idx].set(tiles)` cost 7.8 ms/scan
    inside the batch-8 vmapped program (vmapped data-dependent row
    scatters lower ~4x worse than solo) vs 2.75 for this form — 2.8x,
    bit-identical output incl. the trash row, since unoccupied tiles are
    exactly the all-zero tiles (tools/compact_probe.py, round 5)."""
    planes = jnp.transpose(packed, (2, 0, 1))       # (nB, H, W): a label
    # byte-plane's support is spatially local, so plane-major tiles go
    # all-zero together (pixel-major interleaves all 117 labels per pixel
    # and measures ~25% worse occupancy on speckle masks)
    flat = planes.reshape(-1)
    pad = (-flat.size) % _COMPACT_TILE
    if pad:
        flat = jnp.pad(flat, (0, pad))
    tiles = flat.reshape(-1, _COMPACT_TILE)
    T = tiles.shape[0]
    occ = jnp.any(tiles != 0, axis=1)
    pos = jnp.cumsum(occ) - 1
    idx = jnp.where(occ, pos, T)
    src = jnp.full((T + 1,), T, jnp.int32).at[idx].set(
        jnp.arange(T, dtype=jnp.int32))
    tiles_p = jnp.concatenate(
        [tiles, jnp.zeros((1, _COMPACT_TILE), jnp.uint8)])
    buf = jnp.take(tiles_p, src, axis=0)
    occ_packed = _pack_bits(occ.astype(jnp.uint8)[None])[0]
    return buf, occ_packed


def occupied_count(occ_packed: np.ndarray, T: int) -> int:
    """Occupied-tile count from the fetched bitmap (host side)."""
    bits = np.unpackbits(np.ascontiguousarray(occ_packed).reshape(-1),
                         bitorder='little')
    return int(bits[:T].sum())


def uncompact(prefix: np.ndarray, occ_packed: np.ndarray, count: int,
              shape: Tuple[int, int, int]) -> np.ndarray:
    """Host side: rebuild the (H, W, nB) packed-mask array from a fetched
    buffer prefix (length >= count) and the occupancy bitmap. Bit-identical
    to the uncompacted program output."""
    h, w, n_bytes = shape
    total = h * w * n_bytes
    T = -(-total // _COMPACT_TILE)
    occ = np.unpackbits(np.ascontiguousarray(occ_packed).reshape(-1),
                        bitorder='little')[:T].astype(bool)
    out = np.zeros((T, _COMPACT_TILE), np.uint8)
    out[occ] = prefix[:count]
    planes = out.reshape(-1)[:total].reshape(n_bytes, h, w)
    return np.ascontiguousarray(planes.transpose(1, 2, 0))


_fetch_pools: Dict[str, object] = {}
_fetch_pool_lock = threading.Lock()


def _fetch_pool(kind: str, workers: int):
    """Shared IO pools for result downloads (same pattern as
    io/dicom._series_decode_pool): the fetch paths run once per scan in
    the serving hot loop, and per-call executors would spawn and join up
    to 6 OS threads per mask download — a pure tax on the 1-core host.
    Deadlock-free by construction: 'slab' tasks never submit into a
    pool, and 'spec' tasks submit only into 'slab' — acyclic."""
    with _fetch_pool_lock:
        pool = _fetch_pools.get(kind)
        if pool is None:
            from concurrent.futures import ThreadPoolExecutor
            pool = ThreadPoolExecutor(
                workers, thread_name_prefix=f'ts2d-fetch-{kind}')
            _fetch_pools[kind] = pool
        return pool


def fetch_split(dev, min_bytes: int = 1_000_000,
                streams: int = 4) -> np.ndarray:
    """Fetch a device array as concurrent contiguous-slab streams along
    axis 0: through a remote tunnel one device_get stream moves only
    ~16 MB/s while 2+ streams aggregate ~38 MB/s (probe16/18); the
    contiguous-slab concat is bit-identical to the whole-array fetch.
    Small arrays take the single-stream path (the slice dispatches are
    not worth their queue hops)."""
    n = dev.shape[0] if getattr(dev, 'ndim', 0) >= 1 else 0
    if n >= 2 and dev.nbytes >= min_bytes:
        k = min(streams, n)
        bounds = [n * i // k for i in range(k + 1)]
        slabs = [dev[bounds[i]:bounds[i + 1]] for i in range(k)]
        # 8 workers: two fetch_split calls can run concurrently (the
        # speculative prefix racing a top-up / another program's result)
        parts = list(_fetch_pool('slab', 8).map(
            lambda s: np.asarray(jax.device_get(s)), slabs))
        return np.concatenate(parts)
    return np.asarray(jax.device_get(dev))


def _fetch_speculative(occ, spec_thunk):
    """Fetch the occupancy bitmap, overlapping an optional speculative
    prefix fetch with its tunnel round-trip (~20-45 ms of pure RPC latency
    that would otherwise SERIALIZE ahead of the prefix fetch). Returns
    ``(occ_np, speculative_result_or_None)``."""
    if spec_thunk is None:
        return np.asarray(jax.device_get(occ)), None
    spec = _fetch_pool('spec', 2).submit(spec_thunk)
    occ_np = np.asarray(jax.device_get(occ))
    return occ_np, spec.result()


def fetch_compact(dev_pair, cmeta: dict) -> np.ndarray:
    """Fetch a compacted solo result: the occupancy bitmap (tiny), plus
    only the bucketed prefix the count requires.

    Serving workloads are homogeneous, so the bucket the LAST solo result
    of this program needed (``cmeta['hint_solo']``, mutable in the
    per-program cached meta dict; the batched fetch keeps its own
    ``hint_batch`` — their counts differ systematically, a shared slot
    ping-pongs between prefix sizes) is speculatively fetched CONCURRENTLY
    with the bitmap; when it covers the new count (the common case —
    buckets are coarse) the bitmap round-trip vanishes. On undershoot the
    bucket prefix refetches WHOLE rather than topping up ``buf[hint:k]``:
    a pairwise (hint, k) slab would be a first-time device slice program
    per pair (each stalling its first request on a tunnel compile), while
    bucket prefixes reuse the same bounded program set the cold path
    compiles. Always bit-identical: ``uncompact`` reads exactly
    ``prefix[:count]`` rows."""
    buf, occ = dev_pair
    T = cmeta['T']
    hint = cmeta.get('hint_solo')
    occ_np, prefix = _fetch_speculative(
        occ, (lambda: fetch_split(buf[:hint])) if hint else None)
    count = occupied_count(occ_np, T)
    k = pick_prefix(count, T)
    if prefix is None or count > hint:
        prefix = fetch_split(buf[:k])
    cmeta['hint_solo'] = k
    return uncompact(prefix, occ_np, count, cmeta['shape'])


def fetch_compact_batch(dev_pair, cmeta: dict) -> np.ndarray:
    """Fetch a batch of compacted results ((B, T+1, tile) buffer +
    (B, occB) bitmaps): one prefix slab sized by the largest per-scan
    count crosses the wire, then every scan reconstructs with one
    vectorized scatter. Speculation protocol and hint/undershoot
    semantics as in ``fetch_compact`` (own ``hint_batch`` slot). Returns
    the plain packed (B, H, W, nB) array, bit-identical to the
    uncompacted wire."""
    buf, occ = dev_pair
    T = cmeta['T']
    h, w, n_bytes = cmeta['shape']
    hint = cmeta.get('hint_batch')
    occ_np, slab = _fetch_speculative(
        occ, (lambda: fetch_split(buf[:, :hint])) if hint else None)
    bits = np.unpackbits(np.ascontiguousarray(occ_np), axis=-1,
                         bitorder='little')[:, :T].astype(bool)
    counts = bits.sum(axis=-1)
    kmax = pick_prefix(int(counts.max()), T)
    if slab is None or int(counts.max()) > hint:
        slab = fetch_split(buf[:, :kmax])
    cmeta['hint_batch'] = kmax
    B = slab.shape[0]
    out = np.zeros((B, T, _COMPACT_TILE), np.uint8)
    out[bits] = np.concatenate([slab[i, :counts[i]] for i in range(B)])
    total = h * w * n_bytes
    planes = out.reshape(B, -1)[:, :total].reshape(B, n_bytes, h, w)
    return np.ascontiguousarray(planes.transpose(0, 2, 3, 1))


# -- int16 wire: exact-integer channels upload at half width ------------------
#
# Host->device transfers are a first-order serving cost on remote-attached
# TPUs (probe12: ~38 MB/s through the tunnel; the 8-scan stacked upload A/Bs
# 160 -> 125 ms with the split wire). CT MIP channels — and integer X-ray
# inputs — hold exactly-integral float values, which an int16 carries
# losslessly at half the bytes; the device casts back to float before
# normalization, so results are BIT-IDENTICAL to the float32 wire. The AIP
# (mean) channel is fractional and stays float32. f16/bf16 wires were
# rejected: neither represents HU values up to 3071 exactly (+-1 HU error).

def wire_detect(arr: np.ndarray) -> Tuple[bool, ...]:
    """Per-channel int16 eligibility of a float (H, W, C) array: every
    value integral and within int16 range. NaN/inf fail the equality and
    land on the float32 wire."""
    wire = []
    for c in range(arr.shape[-1]):
        ch = arr[..., c]
        wire.append(bool(ch.size and np.all(np.trunc(ch) == ch)
                         and ch.min() >= -32768 and ch.max() <= 32767))
    return tuple(wire)


def _wire_pack(arr: np.ndarray, wire) -> object:
    """Split (H, W, C) float32 into the wire payload: the int16 channels
    and the float32 channels as two arrays (int channels first). All-float
    wires return the array unchanged; all-int wires return a 1-tuple."""
    if wire is None or not any(wire):
        return np.ascontiguousarray(arr, np.float32)
    ii = [c for c, w in enumerate(wire) if w]
    ff = [c for c, w in enumerate(wire) if not w]
    xi = np.ascontiguousarray(arr[..., ii]).astype(np.int16)
    if not ff:
        return (xi,)
    return (xi, np.ascontiguousarray(arr[..., ff], np.float32))


def _wire_restore(payload, wire, dtype) -> jnp.ndarray:
    """Device-side inverse of _wire_pack: cast, concat, and restore the
    original channel order (a no-op slice when the int channels already
    lead, e.g. the (MIP, AIP) = (int16, float32) CT case)."""
    if wire is None or not any(wire):
        return payload.astype(dtype)
    ii = [c for c, w in enumerate(wire) if w]
    ff = [c for c, w in enumerate(wire) if not w]
    parts = [payload[0].astype(dtype)]
    if ff:
        parts.append(payload[1].astype(dtype))
    cat = jnp.concatenate(parts, axis=-1) if len(parts) > 1 else parts[0]
    perm = np.argsort(np.asarray(ii + ff))
    if np.array_equal(perm, np.arange(len(perm))):
        return cat
    return cat[..., tuple(perm)]


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
                 tile_mesh=None, tile_axis: str = 'data',
                 forward_batch_cap: int = 64,
                 auto_batch: Optional[int] = None,
                 pad_quantum: Optional[int] = None,
                 compact_wire: Optional[bool] = None):
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
        for s in specs:
            # the fused merge maps channel i <-> label value i+1 (multilabel)
            # and one_hot[..., 1:] <-> sorted values (softmax): both require
            # contiguous 1-based label values or channels get mislabeled
            if s.labels and sorted(s.labels) != list(range(1, len(s.labels) + 1)):
                raise ValueError(
                    f'Label values must be contiguous starting at 1 for the '
                    f'fused ensemble; got {sorted(s.labels)}')
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
        # bound on the tile×TTA forward batch (activation memory)
        self.forward_batch_cap = int(forward_batch_cap)
        # pad_quantum=N: quantized-shape serving. predict_array places each
        # cropped input flush in a shape bucket (next multiple of N per
        # axis) served by ONE geometry-as-data program per bucket
        # (_build_bucket): the scan's true extent rides in as data and
        # reproduces exact-mode geometry, so heterogeneous traffic compiles
        # a BOUNDED set of programs (one per bucket instead of one per
        # cropped shape — each compile costs seconds-to-minutes through a
        # remote tunnel) and different-size scans land in the SAME
        # micro-batch bucket and coalesce. Results match the exact programs
        # up to float-noise borderline flips (>=99.9% agreement on
        # synthetic all-borderline weights, tests/test_008).
        # None (default) = exact per-shape programs, bitwise parity path.
        if pad_quantum is not None and int(pad_quantum) < 1:
            raise ValueError('pad_quantum must be >= 1')
        self.pad_quantum = int(pad_quantum) if pad_quantum else None
        # compact_wire: the serving programs return (buf, occ-bitmap)
        # compacted masks (_compact_pack) instead of the plain packed
        # array, and the host fetches only the occupied-tile prefix —
        # 4-15x fewer download bytes on sparse anatomy masks, ~1.6%
        # overhead when dense. Bit-identical either way. Default on;
        # TS2D_COMPACT=0 (or compact_wire=False) restores the plain wire.
        if compact_wire is None:
            import os
            compact_wire = os.environ.get('TS2D_COMPACT', '1') != '0'
        self.compact_wire = bool(compact_wire)
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
        # serving calls predict concurrently from request threads: guard the
        # program cache so one shape compiles once (JAX dispatch itself is
        # thread-safe; everything else here is pure per call). RLock: the
        # volume program builds the 2D program while holding the lock.
        import threading
        self._cache_lock = threading.RLock()
        # auto_batch=N: concurrent predict_array requests coalesce into one
        # batched dispatch of up to N scans (dynamic micro-batching — the
        # production serving mode; see inference/batching.py for measurements)
        self._batcher = None
        if auto_batch is not None:
            if tile_mesh is not None:
                # the batcher vmaps the fused program; the tile-sharded
                # program is a shard_map over the mesh — the two batch the
                # device in incompatible ways (scale latency via tile_mesh
                # OR throughput via auto_batch, not both)
                raise ValueError('auto_batch cannot be combined with '
                                 'tile_mesh')
            from .batching import DynamicBatcher
            self._batcher = DynamicBatcher(self, max_batch=auto_batch)

    def close(self) -> None:
        """Stop the micro-batch dispatcher thread (if enabled)."""
        if self._batcher is not None:
            self._batcher.stop()
            self._batcher = None

    def set_batch_linger(self, linger_ms: float) -> None:
        """Throughput knob for the micro-batcher: hold a partial batch up to
        ``linger_ms`` waiting for it to fill (partial batches pad to
        max_batch and cost a full program run). 0 = dispatch immediately
        (latency-first, the default)."""
        if self._batcher is None:
            raise RuntimeError('micro-batching is not enabled '
                               '(construct with auto_batch=N)')
        self._batcher.linger_ms = float(linger_ms)

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

    def _build(self, in_shape: Tuple[int, int], in_spacing: Tuple[float, float],
               force_norm_mask: bool = False, wire=None):
        spec = self.spec
        pre = spec.preprocess
        if force_norm_mask:
            # padded-bucket cohorts: z-score statistics must come from the
            # scan's true extent, not the zero border — flip every channel
            # to the masked-normalization path (CT/rescale channels ignore
            # the mask in normalize_channels, so this only affects z-score)
            import dataclasses
            pre = dataclasses.replace(
                pre, use_mask_for_norm=(True,) * len(pre.use_mask_for_norm))
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

        compute_dtype = self.compute_dtype
        G_, F_ = self.n_groups, self.n_folds

        def net(params, x):
            # (G, F, ...) params; x (B, ph, pw, C) -> (G, B, ph, pw, Lp).
            # lax.map (scan), NOT vmap: vmapping convs over stacked weights
            # lowers to grouped convolutions, which the TPU executes at a
            # few percent of MXU peak — sequential standard convs with a
            # large tile×TTA batch are far faster and the (G*F) trip count
            # is tiny.
            flat = jax.tree_util.tree_map(
                lambda a: a.reshape((G_ * F_,) + a.shape[2:]), params)
            outs = jax.lax.map(
                lambda p: forward(p, x, spec.arch,
                                  compute_dtype=compute_dtype), flat)
            outs = outs.reshape((G_, F_) + outs.shape[1:])
            return jnp.mean(outs, axis=1)  # fold average

        needs_mask = any(pre.use_mask_for_norm)

        def program(params, arr, nz_mask=None):
            # arr: (H, W, C) float, or the int16-wire payload (_wire_pack)
            work = _wire_restore(arr, wire, self.dtype)
            work = normalize_channels(work, pre, nz_mask)
            if force_norm_mask and nz_mask is not None:
                # the forced mask marks a scan's TRUE extent inside a padded
                # bucket (pad_quantum serving / padded cohorts). Exact mode
                # pads with zeros AFTER normalization; masked z-score keeps
                # out-of-mask zeros already, but schemes that ignore the
                # mask (CTNormalization shifts zeros to -mean/std) must
                # re-zero the synthetic border to match the exact path's
                # conv-border values.
                work = jnp.where(nz_mask[..., None], work,
                                 jnp.zeros((), work.dtype))
            if any(w is not None for w in w_down):
                pref = bspline_prefilter(work, [k for k in range(2)
                                                if w_down[k] is not None])
                work = apply_separable(pref, w_down, axes=(0, 1))
            work = jnp.pad(work, pads + [(0, 0)])

            acc0 = jnp.zeros((G,) + pad_shape + (Lp,), self.dtype)
            wacc0 = jnp.zeros(pad_shape + (1,), self.dtype)

            def tile_loop(my_tiles, my_valid, init):
                # tile×TTA-batched forwards (measured ~3x faster on v5e
                # than a per-tile scan with batch M: each forward carries
                # ~10 ms of fixed cost, see tiling.accumulate_tiles)
                return accumulate_tiles(
                    work, my_tiles, my_valid,
                    lambda b: net(params, b), init[0], init[1],
                    patch=patch, mirrors=mirrors, gauss=gauss,
                    chunk_cap=self.forward_batch_cap)

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

        raw = program
        if self.compact_wire:
            # the SERVED program additionally compacts the packed bytes so
            # sparse masks ship only their occupied tiles (_compact_pack);
            # `raw` stays available in meta for the volume/cohort builders
            # that compose the 2D chain into larger device programs
            def program(params, arr, nz_mask=None):
                return _compact_pack(raw(params, arr, nz_mask))
        jitted = jax.jit(program)
        meta = {'rs_shape': rs_shape, 'n_tiles': len(tiles),
                'n_mirror': n_mirror, 'needs_mask': needs_mask,
                'raw': raw}
        if self.compact_wire:
            meta['compact'] = _compact_meta(in_shape[0], in_shape[1],
                                            -(-self.total_labels // 8))
        return jitted, meta

    def _program(self, in_shape, in_spacing, wire=None):
        if wire is not None and not any(wire):
            wire = None  # all-float wire == the plain program
        key = (tuple(in_shape), tuple(round(float(s), 6) for s in in_spacing),
               wire)
        with self._cache_lock:
            hit = self._cache.get(key)
            if hit is None:
                hit = self._build(tuple(in_shape), tuple(in_spacing),
                                  wire=wire)
                self._cache[key] = hit
                log(f'compiled ensemble program for shape={key[0]} '
                    f'({self.n_groups} groups, {hit[1]["n_tiles"]} tiles, '
                    f'{hit[1]["n_mirror"]} mirrors, {self.n_folds} folds'
                    + (f', int16 wire {wire}' if wire else '') + ')')
        return hit

    def _build_bucket(self, bucket: Tuple[int, int],
                      in_spacing: Tuple[float, float], wire=None):
        """Quantized-shape serving program (pad_quantum): ONE compiled
        program per shape bucket serves EVERY cropped scan size inside it
        with exact-mode geometry. The scan's true (h, w) extent rides in as
        DATA — derived on device from the valid-extent mask — and drives:

         - traced nnU-Net tile positions (compute_steps_1d's even-spread
           layout, padded to the bucket's static tile count with zero
           validity),
         - traced symmetric pad placement (pad_nd_image's before = total//2),
         - per-scan resample matrices scatter-built on device (the exact
           mirror-tap B-spline construction of ops/resample.axis_weights),
           applied to coefficients prefiltered over a mirror-extended canvas
           (the IIR boundary init error decays as |pole|^gap, pole ~ -0.268).

        Results match the exact per-shape program up to float-noise
        borderline flips (device f32 tile/coordinate arithmetic vs the
        host's f64) — bounded compile count under heterogeneous traffic,
        without the tile-geometry drift a naive padded canvas would cause.
        """
        import dataclasses
        spec = self.spec
        pre = dataclasses.replace(
            spec.preprocess,
            use_mask_for_norm=(True,) * len(spec.preprocess.use_mask_for_norm))
        C = spec.arch.in_channels
        Lp = self.max_labels
        G = self.n_groups
        patch = tuple(pre.patch_size)
        H, W = int(bucket[0]), int(bucket[1])
        ratios = tuple(float(o) / float(s)
                       for o, s in zip(in_spacing, pre.spacing))
        resamp = tuple(abs(r - 1.0) > 1e-9 for r in ratios)
        # static canvas in resampled space: the largest rs any scan in this
        # bucket can need (compute_new_shape is monotone in shape)
        rs_canvas = tuple(
            max(compute_new_shape((n,), (o,), (s,))[0] if rz else n, p)
            for n, o, s, p, rz in zip((H, W), in_spacing, pre.spacing,
                                      patch, resamp))
        mirrors = _mirror_combos(spec.allowed_mirroring_axes
                                 if self.use_mirroring else ())
        gauss = jnp.asarray(gaussian_map(patch), self.dtype)[..., None]
        target = tuple(p * self.tile_step_size for p in patch)
        # static per-axis tile-count maxima (monotone in canvas size)
        NT = tuple(int(np.ceil((c - p) / t)) + 1 if c > p else 1
                   for c, p, t in zip(rs_canvas, patch, target))
        label_counts = list(self.label_counts)
        compute_dtype = self.compute_dtype
        G_, F_ = self.n_groups, self.n_folds

        def net(params, x):
            flat = jax.tree_util.tree_map(
                lambda a: a.reshape((G_ * F_,) + a.shape[2:]), params)
            outs = jax.lax.map(
                lambda p: forward(p, x, spec.arch,
                                  compute_dtype=compute_dtype), flat)
            outs = outs.reshape((G_, F_) + outs.shape[1:])
            return jnp.mean(outs, axis=1)

        def _mirror_i(idx, n):
            # ops/resample._mirror_index, traced: scipy 'mirror' reflection
            p = jnp.maximum(2 * n - 2, 1)
            return jnp.where(n == 1, 0,
                             (n - 1) - jnp.abs(jnp.mod(idx, p) - (n - 1)))

        def _b3(t):
            at = jnp.abs(t)
            return jnp.where(
                at < 1.0, 2.0 / 3.0 - at * at + 0.5 * at ** 3,
                jnp.where(at < 2.0, ((2.0 - at) ** 3) / 6.0, 0.0))

        def _down_matrix(n_canvas, n_rs_canvas, h, rs, pb):
            """(n_rs_canvas, n_canvas) order-3 matrix for one axis: row o
            holds axis_weights' mirror-tap B-spline row for scan row o-pb,
            zero outside [pb, pb+rs)."""
            o = jnp.arange(n_rs_canvas)
            r = o - pb
            rowv = ((r >= 0) & (r < rs)).astype(jnp.float32)
            hf = h.astype(jnp.float32)
            c = (r.astype(jnp.float32) + 0.5) * (hf / rs.astype(jnp.float32)) - 0.5
            c = jnp.clip(c, 0.0, hf - 1.0)  # outside='edge'
            base = jnp.floor(c).astype(jnp.int32)
            M = jnp.zeros((n_rs_canvas, n_canvas), jnp.float32)
            for off in range(-1, 3):
                idx = _mirror_i(base + off, h)
                w = _b3(c - (base + off).astype(jnp.float32)) * rowv
                M = M.at[o, idx].add(w)
            return M

        def _up_matrix(n_canvas, n_rs_canvas, h, rs, pb):
            """(n_canvas, n_rs_canvas) order-1 matrix: row r samples the
            scan's resampled rows (offset pb) at axis_weights' linear taps,
            zero for r >= h."""
            r = jnp.arange(n_canvas)
            rowv = (r < h).astype(jnp.float32)
            c = ((r.astype(jnp.float32) + 0.5)
                 * (rs.astype(jnp.float32) / h.astype(jnp.float32)) - 0.5)
            base = jnp.floor(c).astype(jnp.int32)
            frac = c - base.astype(jnp.float32)
            M = jnp.zeros((n_canvas, n_rs_canvas), jnp.float32)
            for off, w in ((0, 1.0 - frac), (1, frac)):
                idx = pb + _mirror_i(base + off, rs)
                M = M.at[r, idx].add(w * rowv)
            return M

        def _steps(size, n_static, p, t):
            """compute_steps_1d, traced size: even-spread tile origins
            padded to n_static with validity flags."""
            num = jnp.where(
                size == p, 1,
                jnp.ceil((size - p).astype(jnp.float32) / t).astype(jnp.int32)
                + 1)
            actual = ((size - p).astype(jnp.float32)
                      / jnp.maximum(num - 1, 1).astype(jnp.float32))
            k = jnp.arange(n_static)
            pos = jnp.round(actual * k.astype(jnp.float32)).astype(jnp.int32)
            valid = k < num
            return jnp.where(valid, pos, 0), valid

        def program(params, arr, nz_mask):
            work = _wire_restore(arr, wire, self.dtype)
            # the scan's true extent, from the flush-placed valid mask
            h = H - jnp.argmax(nz_mask.any(axis=1)[::-1]).astype(jnp.int32)
            w = W - jnp.argmax(nz_mask.any(axis=0)[::-1]).astype(jnp.int32)
            work = normalize_channels(work, pre, nz_mask)
            # exact mode pads zeros AFTER normalization: re-zero outside the
            # scan RECT (schemes that ignore the norm mask, e.g.
            # CTNormalization, shift zeros; in-rect out-of-mask pixels stay
            # normalized exactly like the exact path)
            rect = ((jnp.arange(H)[:, None] < h)
                    & (jnp.arange(W)[None, :] < w))
            work = jnp.where(rect[..., None], work,
                             jnp.zeros((), work.dtype))

            hw = (h, w)
            rs = tuple(
                jnp.round(hw[k].astype(jnp.float32) * ratios[k]).astype(
                    jnp.int32) if resamp[k] else hw[k]
                for k in range(2))
            ph = tuple(jnp.maximum(rs[k], patch[k]) for k in range(2))
            pb = tuple((ph[k] - rs[k]) // 2 for k in range(2))

            if any(resamp):
                # mirror-extend the scan content over the canvas so the IIR
                # prefilter's boundary init matches the exact path's
                # scan-edge mirror (error ~ |pole|^gap; taps themselves
                # always land inside the scan via the mirror indices)
                ext = work
                if resamp[0]:
                    ext = ext[_mirror_i(jnp.arange(H), h), :, :]
                if resamp[1]:
                    ext = ext[:, _mirror_i(jnp.arange(W), w), :]
                pref = bspline_prefilter(ext, [k for k in range(2)
                                               if resamp[k]])
                w_dn = [
                    _down_matrix((H, W)[k], rs_canvas[k], hw[k], rs[k], pb[k])
                    if resamp[k] else None
                    for k in range(2)]
                work = apply_separable(pref, w_dn, axes=(0, 1))
            # non-resampled axes: grow the canvas to the static tile canvas
            # (a bucket below the patch size still tiles over >= patch),
            # then apply the symmetric-pad placement (traced roll over the
            # zero border; resampled axes had it built into the matrices)
            grow = [(0, rs_canvas[k] - work.shape[k]) for k in range(2)]
            if any(g != (0, 0) for g in grow):
                work = jnp.pad(work, grow + [(0, 0)])
            shifts = tuple(0 if resamp[k] else pb[k] for k in range(2))
            if any(not resamp[k] for k in range(2)):
                work = jnp.roll(work, shifts, axis=(0, 1))

            pos_y, val_y = _steps(ph[0], NT[0], patch[0], target[0])
            pos_x, val_x = _steps(ph[1], NT[1], patch[1], target[1])
            tiles = jnp.stack(
                [jnp.repeat(pos_y, NT[1]), jnp.tile(pos_x, NT[0])], axis=-1)
            valid = (jnp.repeat(val_y, NT[1])
                     & jnp.tile(val_x, NT[0]))[:, None].astype(self.dtype)

            acc0 = jnp.zeros((G,) + rs_canvas + (Lp,), self.dtype)
            wacc0 = jnp.zeros(rs_canvas + (1,), self.dtype)
            acc, wacc = accumulate_tiles(
                work, tiles, valid, lambda b: net(params, b), acc0, wacc0,
                patch=patch, mirrors=mirrors, gauss=gauss,
                chunk_cap=self.forward_batch_cap)
            logits = acc / jnp.maximum(wacc, 1e-8)[None]

            if any(resamp):
                w_up = [
                    _up_matrix((H, W)[k], rs_canvas[k], hw[k], rs[k], pb[k])
                    if resamp[k] else None
                    for k in range(2)]
                logits = apply_separable(logits, w_up, axes=(1, 2))
            shifts = tuple(0 if resamp[k] else -pb[k] for k in range(2))
            if any(not resamp[k] for k in range(2)):
                logits = jnp.roll(logits, shifts, axis=(1, 2))
            logits = logits[:, :H, :W]  # drop the tile-canvas growth

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
            return _pack_bits(seg)

        raw = program
        if self.compact_wire:
            def program(params, arr, nz_mask):
                return _compact_pack(raw(params, arr, nz_mask))
        inner = program

        def program(params, arr, nz_mask):
            # quantized-bucket serving is already non-bitwise vs the exact
            # per-shape program (geometry-as-data f32 arithmetic), so it
            # takes the one-pass-stats traversal cut — unet.stats_override
            with stats_override('1pass'):
                return inner(params, arr, nz_mask)
        jitted = jax.jit(program)
        meta = {'rs_canvas': rs_canvas, 'n_tiles_max': NT[0] * NT[1],
                'n_mirror': len(mirrors), 'needs_mask': True, 'raw': raw}
        if self.compact_wire:
            meta['compact'] = _compact_meta(H, W,
                                            -(-self.total_labels // 8))
        return jitted, meta

    def _program_bucket(self, bucket, in_spacing, wire=None):
        if wire is not None and not any(wire):
            wire = None
        key = ('bucket', tuple(bucket),
               tuple(round(float(s), 6) for s in in_spacing), wire)
        with self._cache_lock:
            hit = self._cache.get(key)
            if hit is None:
                hit = self._build_bucket(tuple(bucket), tuple(in_spacing),
                                         wire=wire)
                self._cache[key] = hit
                log(f'compiled bucket serving program for bucket={key[1]} '
                    f'(q={self.pad_quantum}, <= {hit[1]["n_tiles_max"]} '
                    f'tiles'
                    + (f', int16 wire {wire}' if wire else '') + ')')
        return hit

    def _program_padded(self, in_shape, in_spacing, wire=None):
        """The masked 2D program variant: normalization statistics come
        from an explicit valid-extent mask instead of the whole array.
        Shared by quantized-shape serving (pad_quantum) and padded
        mixed-shape cohorts (_build_cohort_padded)."""
        if wire is not None and not any(wire):
            wire = None
        key = ('2d-masked', tuple(in_shape),
               tuple(round(float(s), 6) for s in in_spacing), wire)
        with self._cache_lock:
            hit = self._cache.get(key)
            if hit is None:
                hit = self._build(tuple(in_shape), tuple(in_spacing),
                                  force_norm_mask=True, wire=wire)
                self._cache[key] = hit
                log(f'compiled masked ensemble program for shape={key[1]}'
                    + (f', int16 wire {wire}' if wire else ''))
        return hit

    def _serving_program(self, in_shape, in_spacing, wire=None):
        """The program predict_array dispatches: the geometry-as-data
        bucket program under quantized-shape serving, the exact per-shape
        one otherwise."""
        if self.pad_quantum is not None:
            return self._program_bucket(in_shape, in_spacing, wire)
        return self._program(in_shape, in_spacing, wire)

    def _batched_program(self, batch: int, in_shape, in_spacing,
                         has_mask: bool, wire=None):
        """vmap of the fused 2D program over a stacked batch of same-shape
        scans (the micro-batching dispatch path). Returns (fn, meta) like
        the per-scan builders — meta is the underlying program's, so the
        dispatcher never has to repeat the lookup."""
        if wire is not None and not any(wire):
            wire = None
        key = ('batch', int(batch), tuple(in_shape),
               tuple(round(float(s), 6) for s in in_spacing), bool(has_mask),
               wire, self.pad_quantum is not None)
        with self._cache_lock:
            hit = self._cache.get(key)
            if hit is None:
                fn2d, meta = self._serving_program(in_shape, in_spacing,
                                                   wire)
                # batched programs are already non-bitwise vs the solo
                # exact program (batch-size-dependent conv scheduling,
                # the borderline-flip class pinned in tools/parity.py),
                # so they take the one-pass-stats traversal cut too
                if has_mask:
                    def batched(params, xb, mb):
                        with stats_override('1pass'):
                            return jax.vmap(lambda a, m: fn2d.__wrapped__(
                                params, a, m))(xb, mb)
                else:
                    def batched(params, xb):
                        with stats_override('1pass'):
                            return jax.vmap(lambda a: fn2d.__wrapped__(
                                params, a))(xb)
                fn = jax.jit(batched)
                hit = self._cache[key] = (fn, meta)
                log(f'compiled batched ensemble program for shape={in_shape} '
                    f'batch={batch}')
        return hit

    # -- fused volume path ---------------------------------------------------

    def _build_volume(self, vol_shape: Tuple[int, int, int],
                      spacing_yx: Tuple[float, float],
                      modes: Tuple[str, ...]):
        """ONE program for the whole scan: (Z, Y, X) RAI volume in ->
        coronal projections (Z, X, C) + merged multilabel seg out. Removes
        the per-projection device round trips of the unfused path."""
        from ..ops.projection import project_array

        _, meta2d = self._program(vol_shape[::2], spacing_yx)

        # masked-norm plans never reach this builder (predict_volume_async
        # reroutes them to the host-projection path for the exact
        # hole-filled mask) — an approximate device-side mask here would be
        # silently wrong, so refuse rather than carry dead code
        assert not meta2d['needs_mask'], \
            'masked-norm plans take the host-projection path'

        def program(params, vol):
            work = vol.astype(self.dtype)
            chans = [jnp.squeeze(project_array(work, m, axis=1), 1)
                     for m in modes]
            x2d = jnp.stack(chans, axis=-1)          # (Z, X, C)
            packed = meta2d['raw'](params, x2d)
            if self.compact_wire:
                # the volume path's masks ride the compacted wire too
                # (finish_volume fetches bitmap + prefix)
                return _compact_pack(packed), x2d
            return packed, x2d

        return jax.jit(program), meta2d.get('compact')

    def predict_volume_async(self, vol: np.ndarray,
                             spacing_yx: Sequence[float],
                             modes: Sequence[str]):
        """Dispatch a fused scan prediction without blocking: returns a
        handle for :meth:`finish_volume`. The volume is cropped on the host
        to its nonzero (z, x) bounding box before upload — for the standard
        channel modes this equals nnU-Net's crop_to_nonzero of the projected
        2D image (an all-zero (z,·,x) column projects to 0 in every mode),
        restoring the reference crop semantics AND shrinking the transfer.

        For plans with use_mask_for_norm the masked normalization needs the
        hole-filled host mask; that path projects on the host and runs the
        2D program (predict_array semantics) instead."""
        if any(self.spec.preprocess.use_mask_for_norm):
            from ..ops.projection import project_arrays_np
            proj = np.concatenate(
                project_arrays_np(vol, modes, 1),
                axis=1).transpose(0, 2, 1).astype(np.float32)  # (Z, X, C)
            return ('hostproj',
                    self.predict_array_async(proj, spacing_yx), proj)

        mask_zx = np.any(vol != 0, axis=1)
        zs, xs = np.nonzero(mask_zx)
        full_zx = (vol.shape[0], vol.shape[2])
        if zs.size == 0:
            bbox = ((0, vol.shape[0]), (0, vol.shape[2]))
        else:
            bbox = ((int(zs.min()), int(zs.max()) + 1),
                    (int(xs.min()), int(xs.max()) + 1))
        (z0, z1), (x0, x1) = bbox
        cropped = vol[z0:z1, :, x0:x1]

        key = ('vol', cropped.shape,
               tuple(round(float(s), 6) for s in spacing_yx), tuple(modes))
        with self._cache_lock:
            hit = self._cache.get(key)
            if hit is None:
                hit = self._build_volume(tuple(cropped.shape),
                                         tuple(spacing_yx), tuple(modes))
                self._cache[key] = hit
                log(f'compiled fused volume program for shape={cropped.shape}')
        fn, cmeta = hit
        out = fn(self.params, jax.device_put(np.ascontiguousarray(cropped)))
        return ('device', out, bbox, full_zx, cmeta)

    def finish_volume(self, handle) -> Tuple[np.ndarray, np.ndarray]:
        """Block on a predict_volume_async handle; returns (seg, proj)."""
        if handle[0] == 'hostproj':
            _, inner, proj = handle
            return self.finish_array(inner), proj
        _, (seg_d, proj_d), bbox, full_zx, cmeta = handle
        if cmeta is not None:
            packed = fetch_compact(seg_d, cmeta)
        else:
            packed = np.asarray(jax.device_get(seg_d))
        seg_c = unpack_bits(packed, self.total_labels)
        proj_c = np.asarray(jax.device_get(proj_d))
        (z0, z1), (x0, x1) = bbox
        if seg_c.shape[:2] != full_zx:
            seg = np.zeros(full_zx + (seg_c.shape[-1],), np.uint8)
            seg[z0:z1, x0:x1] = seg_c
            proj = np.zeros(full_zx + (proj_c.shape[-1],), proj_c.dtype)
            proj[z0:z1, x0:x1] = proj_c
            return seg, proj
        return seg_c, proj_c

    def predict_volume(self, vol: np.ndarray, spacing_yx: Sequence[float],
                       modes: Sequence[str]) -> Tuple[np.ndarray, np.ndarray]:
        """Fully fused scan prediction. ``vol``: (Z, Y, X) RAI-oriented
        array; projections are taken along the coronal (Y) axis. Returns
        (merged multilabel seg (Z, X, sum L), projections (Z, X, C))."""
        return self.finish_volume(
            self.predict_volume_async(vol, spacing_yx, modes))

    # -- cohort (batched / multi-chip data-parallel) path ---------------------

    def _build_cohort(self, n: int, vol_shape: Tuple[int, int, int],
                      spacing_yx: Tuple[float, float],
                      modes: Tuple[str, ...], mesh=None):
        """Batched fused program: (N, Z, Y, X) volumes -> (N, Z, X, sum L)
        merged segs. With a mesh, the batch shards over the 'data' axis and
        XLA replicates the (vmapped) per-scan program across chips."""
        from ..ops.projection import project_array

        _, meta2d = self._program(vol_shape[::2], spacing_yx)

        # masked-norm cohorts are rerouted to the exact host-projection
        # path before this builder runs (see predict_cohort)
        assert not meta2d['needs_mask'], \
            'masked-norm plans take the host-projection path'

        def one(params, vol):
            work = vol.astype(self.dtype)
            chans = [jnp.squeeze(project_array(work, m, axis=1), 1)
                     for m in modes]
            x2d = jnp.stack(chans, axis=-1)
            return meta2d['raw'](params, x2d)

        compact = self.compact_wire and mesh is None

        def program(params, vols):
            packed = jax.vmap(lambda v: one(params, v))(vols)
            if compact:
                # per-scan compacted wire (the cohort download is N masks —
                # the biggest single fetch in the codebase). Mesh runs keep
                # the plain packed output: the sharded out-spec stays one
                # array, and ICI/DCN collectives are not the wire this
                # optimizes.
                return jax.vmap(_compact_pack)(packed)
            return packed

        if mesh is None:
            return jax.jit(program), (meta2d.get('compact') if compact
                                      else None)
        from jax.sharding import NamedSharding, PartitionSpec as P
        data_axis = 'data' if 'data' in mesh.axis_names else mesh.axis_names[0]
        vspec = NamedSharding(mesh, P(data_axis, None, None, None))
        ospec = NamedSharding(mesh, P(data_axis, None, None, None))
        rep = jax.tree_util.tree_map(
            lambda _: NamedSharding(mesh, P()), self.params)
        return jax.jit(program, in_shardings=(rep, vspec),
                       out_shardings=ospec), None

    def predict_cohort(self, vols: np.ndarray, spacing_yx: Sequence[float],
                       modes: Sequence[str], mesh=None) -> np.ndarray:
        """Batched scan prediction: ``vols`` (N, Z, Y, X) same-shape RAI
        volumes. With ``mesh``, data-parallel over its 'data' axis (the
        multi-chip cohort throughput mode); when N does not divide by the
        axis size the batch is padded by repeating the last volume and the
        padding results are dropped. Returns merged multilabel segs
        (N, Z, X, sum L) uint8. For mixed-shape cohorts use
        :meth:`predict_cohort_mixed`."""
        if any(self.spec.preprocess.use_mask_for_norm):
            # exact masked normalization needs the hole-filled HOST mask:
            # project on the host and pipeline the async 2D path (requests
            # coalesce in the micro-batcher when enabled). The mesh's
            # device-side projection DP does not apply here.
            if mesh is not None:
                warn('predict_cohort ignores the mesh for masked-norm '
                     'plans (exact hole-filled masks are host-side)',
                     once=True)
            from ..ops.projection import project_arrays_np
            handles = []
            for vol in vols:
                proj = np.concatenate(
                    project_arrays_np(np.ascontiguousarray(vol), modes, 1),
                    axis=1).transpose(0, 2, 1).astype(np.float32)
                handles.append(self.predict_array_async(proj, spacing_yx))
            return np.stack([self.finish_array(h) for h in handles])
        vols = np.ascontiguousarray(vols)
        if mesh is not None:
            data_axis = ('data' if 'data' in mesh.axis_names
                         else mesh.axis_names[0])
            D = int(mesh.shape[data_axis])
            n = vols.shape[0]
            npad = -(-n // D) * D
            if npad != n:
                vols = np.concatenate(
                    [vols, np.repeat(vols[-1:], npad - n, axis=0)])
                return self.predict_cohort(vols, spacing_yx, modes,
                                           mesh=mesh)[:n]
        key = ('cohort', vols.shape,
               tuple(round(float(s), 6) for s in spacing_yx), tuple(modes),
               _mesh_key(mesh))
        with self._cache_lock:
            hit = self._cache.get(key)
            if hit is None:
                hit = self._build_cohort(vols.shape[0], tuple(vols.shape[1:]),
                                         tuple(spacing_yx), tuple(modes),
                                         mesh)
                self._cache[key] = hit
                log(f'compiled cohort program for batch={vols.shape[0]} '
                    f'shape={vols.shape[1:]}'
                    + (f' over mesh {dict(mesh.shape)}'
                       if mesh is not None else ''))
        fn, cmeta = hit
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
        out = fn(params, vols_in)
        packed = (fetch_compact_batch(out, cmeta) if cmeta is not None
                  else np.asarray(jax.device_get(out)))
        return unpack_bits(packed, self.total_labels)

    def _build_cohort_padded(self, vol_shape: Tuple[int, int, int],
                             spacing_yx: Tuple[float, float],
                             modes: Tuple[str, ...], mesh=None):
        """Batched fused program for PADDED mixed-shape cohorts: each scan
        carries its true (z, y, x) extent, and the padded regions are
        masked out of the projections so zero padding never corrupts the
        MIP (zero would beat negative HU) or the AIP (the mean denominator
        stays the true y-extent). The 2D program variant used here computes
        z-score statistics over the valid-extent mask, so per-image
        normalization matches exact mode; the remaining pad-mode deltas are
        the resample/tile grids seeing the padded extent."""
        _, meta2d = self._program_padded(vol_shape[::2], tuple(spacing_yx))
        Z, Y, X = vol_shape
        for m in modes:
            if m not in ('max', 'mean', 'min'):
                raise ValueError(
                    f"bucket='pad' supports max/mean/min projections; "
                    f"got {m!r} (use bucket='exact')")

        def one(params, vol, ext):
            work = vol.astype(self.dtype)
            zl, yl, xl = ext[0], ext[1], ext[2]
            ymask = (jnp.arange(Y) < yl)[None, :, None]
            chans = []
            for m in modes:
                if m == 'max':
                    c = jnp.max(jnp.where(ymask, work, -jnp.inf), axis=1)
                elif m == 'min':
                    c = jnp.min(jnp.where(ymask, work, jnp.inf), axis=1)
                else:
                    c = (jnp.sum(jnp.where(ymask, work, 0), axis=1)
                         / yl.astype(self.dtype))
                chans.append(c)
            x2d = jnp.stack(chans, axis=-1)
            zx = ((jnp.arange(Z) < zl)[:, None]
                  & (jnp.arange(X) < xl)[None, :])
            x2d = jnp.where(zx[..., None], x2d, 0.0)
            # center the scan inside the bucket (jnp.roll with traced
            # shifts): matches exact mode's symmetric pad_nd_image
            # placement, so the conv border geometry lines up
            sz, sx = (Z - zl) // 2, (X - xl) // 2
            x2d = jnp.roll(x2d, (sz, sx), axis=(0, 1))
            zx = jnp.roll(zx, (sz, sx), axis=(0, 1))
            # the valid-extent mask doubles as the normalization mask:
            # z-score statistics come from the scan's true pixels only
            return meta2d['raw'](params, x2d, zx)

        compact = self.compact_wire and mesh is None

        def program(params, vols, exts):
            packed = jax.vmap(lambda v, e: one(params, v, e))(vols, exts)
            if compact:
                return jax.vmap(_compact_pack)(packed)
            return packed

        if mesh is None:
            return jax.jit(program), (meta2d.get('compact') if compact
                                      else None)
        from jax.sharding import NamedSharding, PartitionSpec as P
        data_axis = 'data' if 'data' in mesh.axis_names else mesh.axis_names[0]
        vspec = NamedSharding(mesh, P(data_axis, None, None, None))
        espec = NamedSharding(mesh, P(data_axis, None))
        ospec = NamedSharding(mesh, P(data_axis, None, None, None))
        rep = jax.tree_util.tree_map(
            lambda _: NamedSharding(mesh, P()), self.params)
        return jax.jit(program, in_shardings=(rep, vspec, espec),
                       out_shardings=ospec), None

    def predict_cohort_mixed(self, vols: Sequence[np.ndarray],
                             spacing_yx, modes: Sequence[str],
                             mesh=None, bucket: str = 'exact',
                             pad_quantum: int = 32) -> list:
        """Heterogeneous cohort: volumes of DIFFERENT shapes/spacings run
        data-parallel without caller-side padding.

        ``bucket='exact'`` (default) groups scans by exact (shape, spacing)
        — nnU-Net preprocessing is per-image, so padding would perturb the
        per-image normalization statistics and resample grids; exact
        buckets keep per-scan results identical to solo runs, at the cost
        of batch-1 execution when every scan has a unique shape.

        ``bucket='pad'`` quantizes each axis up to the next multiple of
        ``pad_quantum`` voxels and zero-pads scans into shared buckets, so
        a realistic all-unique-shape cohort still batches (one compiled
        program per bucket instead of per scan). The padded regions are
        masked out of the projections (true MIP/AIP over each scan's real
        extent), z-score statistics are computed over the valid-extent mask
        (matching exact mode's per-image stats), and each scan is centered
        in its bucket to reproduce exact mode's symmetric pad placement.
        The remaining deviation is the resample/tile grid seeing the padded
        extent: measured vs exact mode on synthetic (all-borderline)
        weights, ~0.1% of voxels when the input is already at plan spacing
        and up to ~9% when a 2x resample runs over the padded grid
        (tests/test_008; real saturated checkpoints flip far less). Prefer
        'exact' when inputs are pre-resampled offline or bitwise parity
        matters; 'pad' when cohort throughput does.

        :param spacing_yx: one (y, x) spacing for all scans, or a sequence
            of per-scan spacings
        :returns: list of per-scan merged segs, input order preserved
        """
        if bucket not in ('exact', 'pad'):
            raise ValueError(f"bucket must be 'exact' or 'pad'; got {bucket!r}")
        vols = list(vols)
        n = len(vols)
        sps = (list(spacing_yx) if not np.isscalar(spacing_yx[0])
               else [tuple(spacing_yx)] * n)
        if len(sps) != n:
            raise ValueError('spacing_yx must be one spacing or one per scan')
        if bucket == 'pad' and any(self.spec.preprocess.use_mask_for_norm):
            warn("bucket='pad' is not available for masked-norm plans "
                 "(exact hole-filled host masks); using exact buckets",
                 once=True)
            bucket = 'exact'

        out: list = [None] * n
        if bucket == 'exact':
            buckets: Dict[Tuple, list] = {}
            for i, (v, sp) in enumerate(zip(vols, sps)):
                key = (tuple(v.shape), tuple(round(float(s), 6) for s in sp))
                buckets.setdefault(key, []).append(i)
            for (shape, sp), idxs in sorted(buckets.items()):
                batch = np.stack([vols[i] for i in idxs])
                segs = self.predict_cohort(batch, sp, modes, mesh=mesh)
                for i, s in zip(idxs, segs):
                    out[i] = s
            return out

        q = max(1, int(pad_quantum))
        buckets = {}
        for i, (v, sp) in enumerate(zip(vols, sps)):
            qshape = tuple(-(-d // q) * q for d in v.shape)
            key = (qshape, tuple(round(float(s), 6) for s in sp))
            buckets.setdefault(key, []).append(i)
        for (qshape, sp), idxs in sorted(buckets.items()):
            batch = np.zeros((len(idxs),) + qshape, np.float32)
            exts = np.zeros((len(idxs), 3), np.int32)
            for j, i in enumerate(idxs):
                v = vols[i]
                batch[j, :v.shape[0], :v.shape[1], :v.shape[2]] = v
                exts[j] = v.shape
            segs = self._predict_cohort_padded(batch, exts, sp, tuple(modes),
                                               mesh)
            for j, i in enumerate(idxs):
                z, _, x = vols[i].shape
                sz, sx = (qshape[0] - z) // 2, (qshape[2] - x) // 2
                out[i] = segs[j, sz:sz + z, sx:sx + x]
        return out

    def _predict_cohort_padded(self, vols: np.ndarray, exts: np.ndarray,
                               spacing_yx, modes: Tuple[str, ...],
                               mesh=None) -> np.ndarray:
        """Dispatch one padded bucket (N, Zq, Yq, Xq) + true extents."""
        if mesh is not None:
            data_axis = ('data' if 'data' in mesh.axis_names
                         else mesh.axis_names[0])
            D = int(mesh.shape[data_axis])
            npad = -(-vols.shape[0] // D) * D
            if npad != vols.shape[0]:
                reps = npad - vols.shape[0]
                vols = np.concatenate([vols, np.repeat(vols[-1:], reps, 0)])
                exts = np.concatenate([exts, np.repeat(exts[-1:], reps, 0)])
                return self._predict_cohort_padded(
                    vols, exts, spacing_yx, modes, mesh)[:-reps]
        key = ('cohortpad', vols.shape,
               tuple(round(float(s), 6) for s in spacing_yx), modes,
               _mesh_key(mesh))
        with self._cache_lock:
            hit = self._cache.get(key)
            if hit is None:
                hit = self._build_cohort_padded(tuple(vols.shape[1:]),
                                                tuple(spacing_yx), modes,
                                                mesh)
                self._cache[key] = hit
                log(f'compiled padded cohort program for '
                    f'batch={vols.shape[0]} bucket={vols.shape[1:]}'
                    + (f' over mesh {dict(mesh.shape)}'
                       if mesh is not None else ''))
        fn, cmeta = hit
        params = self.params
        exts_j = np.ascontiguousarray(exts)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            data_axis = ('data' if 'data' in mesh.axis_names
                         else mesh.axis_names[0])
            vols_in = jax.device_put(
                np.ascontiguousarray(vols),
                NamedSharding(mesh, P(data_axis, None, None, None)))
            exts_in = jax.device_put(
                exts_j, NamedSharding(mesh, P(data_axis, None)))
            params = jax.device_put(
                params, jax.tree_util.tree_map(
                    lambda _: NamedSharding(mesh, P()), self.params))
        else:
            vols_in = jax.device_put(np.ascontiguousarray(vols))
            exts_in = jax.device_put(exts_j)
        out = fn(params, vols_in, exts_in)
        packed = (fetch_compact_batch(out, cmeta) if cmeta is not None
                  else np.asarray(jax.device_get(out)))
        return unpack_bits(packed, self.total_labels)

    # -- host API ------------------------------------------------------------

    def predict_array_async(self, arr: np.ndarray, spacing_yx: Sequence[float]):
        """Crop (nnU-Net crop_to_nonzero) + dispatch the fused 2D program
        without blocking; returns a handle for :meth:`finish_array`. This is
        the pipelined serving primitive: host-side projection/IO of the next
        scans overlaps with device time of the queued ones."""
        if arr.ndim == 2:
            arr = arr[..., None]
        if arr.shape[-1] != self.spec.arch.in_channels:
            raise ValueError(
                f'Input has {arr.shape[-1]} channels; the models expect '
                f'{self.spec.arch.in_channels}')
        (y0, y1), (x0, x1) = _nonzero_bbox(arr)
        cropped = np.ascontiguousarray(arr[y0:y1, x0:x1])
        needs_mask = any(self.spec.preprocess.use_mask_for_norm)
        mask = nonzero_norm_mask(cropped) if needs_mask else None
        bbox = ((y0, y1), (x0, x1))
        if self.pad_quantum is not None:
            # quantized-shape serving: place the crop FLUSH at the origin
            # of a shape bucket (next multiple of pad_quantum per axis)
            # with a valid-extent mask — the bucket program derives the
            # true (h, w) from the mask and reproduces exact-mode geometry
            # from it (tiles, symmetric pad, per-scan resample matrices),
            # so arbitrary input sizes share a bounded set of programs and
            # co-batch in the dispatcher
            q = self.pad_quantum
            h, w = cropped.shape[:2]
            qh, qw = -(-h // q) * q, -(-w // q) * q
            emb = np.zeros((qh, qw) + cropped.shape[2:], cropped.dtype)
            emb[:h, :w] = cropped
            base = mask if mask is not None else np.ones((h, w), bool)
            m = np.zeros((qh, qw), bool)
            m[:h, :w] = base
            cropped, mask = emb, m
            bbox = ((y0, y1), (x0, x1), (0, 0, h, w))
        # exactly-integral channels (CT MIP, integer X-rays) ride the wire
        # as int16 — half the upload bytes, bit-identical results (the
        # device casts back before normalization)
        wire = wire_detect(cropped)
        if self._batcher is not None:
            # micro-batching: the dispatcher thread coalesces concurrent
            # requests of the same shape into one batched device program
            return ('future',
                    self._batcher.submit(cropped, mask, spacing_yx, bbox,
                                         arr.shape[:2], wire))
        fn, meta = self._serving_program(cropped.shape[:2], spacing_yx, wire)
        args = (self.params, jax.device_put(_wire_pack(cropped, wire)))
        if mask is not None:
            args += (jax.device_put(mask),)
        return (fn(*args), bbox, arr.shape[:2], meta.get('compact'))

    def _place(self, seg_c: np.ndarray, bbox, full) -> np.ndarray:
        """Re-embed a cropped seg into the full input extent. A 3-element
        bbox carries the quantized-shape inner window (pad_quantum): slice
        the scan's true extent back out of the bucket first."""
        if len(bbox) == 3:
            (sy, sx, h, w) = bbox[2]
            seg_c = seg_c[sy:sy + h, sx:sx + w]
            bbox = bbox[:2]
        (y0, y1), (x0, x1) = bbox
        if seg_c.shape[:2] != tuple(full):
            seg = np.zeros(tuple(full) + (seg_c.shape[-1],), np.uint8)
            seg[y0:y1, x0:x1] = seg_c
            return seg
        return seg_c

    def finish_array(self, handle) -> np.ndarray:
        """Block on a predict_array_async handle; returns the full-size
        merged multilabel one-hot uint8 segmentation."""
        if handle[0] == 'future':
            batch_result, idx, bbox, full = handle[1].result()
            packed = batch_result.get()
            if idx is not None:
                packed = packed[idx]
            return self._place(unpack_bits(packed, self.total_labels),
                               bbox, full)
        out, bbox, full, cmeta = handle
        if cmeta is not None:
            packed = fetch_compact(out, cmeta)
        else:
            packed = np.asarray(jax.device_get(out))
        return self._place(unpack_bits(packed, self.total_labels),
                           bbox, full)

    def predict_array(self, arr: np.ndarray, spacing_yx: Sequence[float]
                      ) -> np.ndarray:
        """(H, W, C) float array -> (H, W, sum(labels)) merged multilabel
        one-hot uint8."""
        return self.finish_array(self.predict_array_async(arr, spacing_yx))

    def warmup(self, in_shape: Sequence[int],
               in_spacing: Optional[Sequence[float]] = None,
               wire=None) -> None:
        """Pre-compile the programs for an input shape (an all-zero dummy
        crops to the full extent). With micro-batching enabled this also
        compiles the batched program — otherwise the first concurrent burst
        would still pay the cold compile warmup exists to avoid.

        ``wire`` selects the input-wire variant to warm: None = the plain
        float32 wire; a per-channel bool tuple = that int16 wire (see
        wire_detect — requests pick their wire from content, so warm the
        variant the production stream will hit, e.g. ``(True, False)`` for
        the (MIP, AIP) CT projection of an integer volume)."""
        if in_spacing is None:
            in_spacing = self.spec.preprocess.spacing
        if wire is not None and len(wire) != self.spec.arch.in_channels:
            raise ValueError(f'wire needs {self.spec.arch.in_channels} '
                             f'channel flags; got {wire}')
        in_shape = tuple(in_shape)
        if self.pad_quantum is not None:
            # production requests land on shape buckets: warm the bucket
            q = self.pad_quantum
            in_shape = tuple(-(-d // q) * q for d in in_shape)
        dummy = np.zeros(in_shape + (self.spec.arch.in_channels,),
                         np.float32)
        needs_mask = (any(self.spec.preprocess.use_mask_for_norm)
                      or self.pad_quantum is not None)
        # drive the programs directly (predict_array would wire-detect the
        # all-integral dummy and warm the wrong variant)
        fn, _ = self._serving_program(in_shape, tuple(in_spacing), wire)
        args = (self.params, jax.device_put(_wire_pack(dummy, wire)))
        if needs_mask:
            args += (jax.device_put(np.ones(in_shape, bool)
                                    if self.pad_quantum is not None
                                    else nonzero_norm_mask(dummy)),)
        jax.block_until_ready(fn(*args))
        if self._batcher is not None:
            # jit is lazy: execute one stacked batch so the batched program
            # actually compiles now
            B = self._batcher.max_batch
            fn, _ = self._batched_program(B, in_shape,
                                          tuple(in_spacing), needs_mask,
                                          wire)
            payload = _wire_pack(dummy, wire)
            if isinstance(payload, tuple):
                xb = tuple(np.stack([p] * B) for p in payload)
            else:
                xb = np.stack([payload] * B)
            args = (self.params, jax.device_put(xb))
            if needs_mask:
                m = (np.ones(in_shape, bool)
                     if self.pad_quantum is not None
                     else nonzero_norm_mask(dummy))
                args += (jax.device_put(np.stack([m] * B)),)
            jax.block_until_ready(fn(*args))
