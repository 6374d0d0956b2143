"""End-to-end benchmark: ts2d-v2-style 5-model ensemble per CT scan.

Pipeline measured host-to-host (SURVEY.md §3.3's hot path): volume in ->
RAI orientation -> host coronal MIP/AIP projection (one memory-bound numpy
pass; uploading the 49 MB volume to the remote-attached TPU costs ~10x the
projection) -> nonzero crop -> ONE fused XLA program (nnU-Net preprocessing,
five anatomical-group 2D multilabel U-Nets at realistic scale — 117 labels
total — with tile×TTA-batched sliding-window forwards, 4-way mirror TTA,
Gaussian blending, and the on-device 117-channel merge, bit-packed) ->
uint8 masks back on host.

Workloads:
 - PRIMARY: a synthetic torso-sized CT (350x250x280 @1.5mm -> 350x280
   coronal projection, 4 sliding-window tiles/model) — the honest comparison
   against the reference's 0.5-0.9 s/scan on real TotalSegmentator CTs.
 - secondary: the bundled real CT (133x120x53, 1 tile), reported in the
   metric string.

Compute runs in 'fast' precision (bf16 conv operands and activations, fp32
accumulation/norm statistics/logits) — the same precision class as the
reference's torch fp16-autocast inference. Weights are randomly initialized
at the published architecture scale (real checkpoints need network access).

Mask realism: the COMPUTE path is weight-independent, but the result
DOWNLOAD adapts to mask content (the compacted mask wire ships only
occupied tiles, inference/ensemble_engine._compact_pack), so the synthetic
masks must carry realistic statistics or the wire measurement is wrong in
one direction or the other. Raw random init produces ~50%-dense sigmoid
masks — a regime no real segmentation model is in (real per-label anatomy
covers ~0.5-5% of a coronal projection). The seg heads therefore get a
constant -2.2 bias, calibrated once against the phantom's logit
distribution (q98.5 across the five groups, tools/perf_probe19.py) so
per-label foreground lands at 1-2.5%. The resulting masks are SPECKLE
(random weights have no spatial coherence), which compacts ~4x — a
conservative LOWER bound: real anatomy masks are coherent blobs and
compact further. TS2D_COMPACT=0 reproduces the plain-wire bench.

Prints ONE JSON line; value = pipelined sec/scan on the torso-sized
workload (async dispatch, host projection overlapped — the production
serving rate), with blocking latency and the small-sample rate in the
metric string, plus spread/run-count/device-floor/blocking-estimate/wire
fields so rounds are not compared on single tunnel moments. vs_baseline = 0.7 s (reference
RTX 4090 midpoint) / value; >1 means faster.
"""

import json
import time

import numpy as np

# synthetic regenerations of the reference's bundled samples (same
# headers/geometry, phantom content) so the bench runs without the
# read-only reference mount (tests/synth_assets.py)
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
from tests.synth_assets import asset_path as _asset_path
CT_PATH = _asset_path('sample_s0521.nrrd')
XRAY_PATH = _asset_path('sample_chexpert.nrrd')
GROUP_LABELS = {  # 117 labels total, ts2d-v2 style
    'cardiac': 24, 'muscles': 21, 'organs': 22, 'ribs': 24, 'vertebrae': 26,
}
PATCH = (256, 256)
N_STAGES = 6
REALISTIC_SHAPE = (350, 250, 280)  # (Z, Y, X) @ 1.5mm iso — torso-sized


def _sparse_heads(params, delta=-2.2):
    """Shift every seg-head bias so sigmoid foreground sits in the upper
    tail of the logit distribution: per-label fractions of 1-2.5% on the
    phantom (measured per-group q98.5 = 1.9-2.6), the statistics real
    checkpoints produce. See the module docstring."""
    for sl in params['decoder']['seg_layers']:
        sl['b'] = sl['b'] + delta
    return params


def build_engine(compact=None):
    import jax.numpy as jnp
    from totalsegmentator2d_tpu.inference import EnsembleEngine
    from totalsegmentator2d_tpu.models.plans import ModelSpec, PreprocessSpec
    from totalsegmentator2d_tpu.models.unet import init_params_np
    from __graft_entry__ import _flagship_spec

    pre = PreprocessSpec(
        spacing=(1.5, 1.5), patch_size=PATCH,
        normalization_schemes=('ZScoreNormalization',) * 2,
        use_mask_for_norm=(False, False),
        intensity_properties=(None, None))

    specs, params = [], []
    for i, (group, n_labels) in enumerate(GROUP_LABELS.items()):
        arch = _flagship_spec(out_channels=n_labels, in_channels=2,
                              n_stages=N_STAGES)
        specs.append(ModelSpec(
            arch=arch, preprocess=pre,
            labels={v + 1: f'{group}-{v}' for v in range(n_labels)},
            channel_names={0: 'max', 1: 'mean'}, multilabel=True))
        params.append([_sparse_heads(init_params_np(i, arch))])
    return EnsembleEngine(specs, params, tile_step_size=0.5,
                          use_mirroring=True, compute_dtype=jnp.bfloat16,
                          auto_batch=8, compact_wire=compact)


def build_xray_engine():
    """tsxr-style single-group native X-ray model (reference
    test_020_predict_default.py:48-52: tsxr-v2-ep1000b2_ribs on
    sample_chexpert): 1 input channel, no projection, plan spacing matching
    the asset's 1.25 mm."""
    import jax.numpy as jnp
    from totalsegmentator2d_tpu.inference import EnsembleEngine
    from totalsegmentator2d_tpu.models.plans import ModelSpec, PreprocessSpec
    from totalsegmentator2d_tpu.models.unet import init_params_np
    from __graft_entry__ import _flagship_spec

    pre = PreprocessSpec(
        spacing=(1.25, 1.25), patch_size=PATCH,
        normalization_schemes=('ZScoreNormalization',),
        use_mask_for_norm=(False,),
        intensity_properties=(None,))
    arch = _flagship_spec(out_channels=GROUP_LABELS['ribs'], in_channels=1,
                          n_stages=N_STAGES)
    spec = ModelSpec(
        arch=arch, preprocess=pre,
        labels={v + 1: f'ribs-{v}' for v in range(GROUP_LABELS['ribs'])},
        channel_names={0: 'xray'}, multilabel=True)
    return EnsembleEngine([spec], [[_sparse_heads(init_params_np(7, arch))]],
                          tile_step_size=0.5, use_mirroring=True,
                          compute_dtype=jnp.bfloat16, auto_batch=8)


def xray_rate(engine, n=16, rounds=3):
    """Pipelined sec/scan on the bundled CheXpert X-ray (native 2D path:
    no projection, the image goes straight to the fused program)."""
    from totalsegmentator2d_tpu.io import read_image
    arr = np.asarray(read_image(XRAY_PATH).array, np.float32)
    if arr.ndim == 2:
        arr = arr[..., None]
    spacing = (1.25, 1.25)
    engine.predict_array(arr, spacing)  # compile
    rates = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        handles = [engine.predict_array_async(arr, spacing)
                   for _ in range(n)]
        outs = [engine.finish_array(h) for h in handles]
        rates.append((time.perf_counter() - t0) / n)
        assert all(o.shape[-1] == GROUP_LABELS['ribs'] for o in outs)
    return float(np.min(rates))


def make_realistic_volume():
    """Structured torso phantom (body ellipsoid, lungs, spine column with
    vertebral periodicity, a liver-class blob, CT noise texture): real
    CT structure drives realistic crop extents and gives the network
    spatially structured logits — pure noise volumes are both
    unrepresentative and adversarially incompressible.

    Deliberately NOT tests/synth_assets._torso_volume (the test-asset
    phantom): this recipe is calibration-coupled to the bench engine's
    seg-head bias (-2.2, tools/perf_probe19.py — tuned so per-label
    foreground lands at the production 1-2.5%). Changing either the
    recipe or the bias requires re-running probe19 and re-recording the
    wire numbers in docs/performance.md; keeping the two generators
    separate keeps test-asset realism fixes from silently moving the
    benchmark workload between rounds."""
    Z, Y, X = REALISTIC_SHAPE
    # sparse (broadcastable) grids: dense meshgrid would materialize
    # three full float64 volumes (~590 MB) on the 1-core bench host
    z, y, x = np.meshgrid(np.linspace(-1, 1, Z), np.linspace(-1, 1, Y),
                          np.linspace(-1, 1, X), indexing='ij', sparse=True)
    vol = np.full(REALISTIC_SHAPE, -1024.0, np.float32)
    # broadcast to full shape: body is z-independent (shape (1, Y, X)
    # under sparse grids) but indexes the full volume below
    body = np.broadcast_to((y ** 2 / 0.81 + x ** 2 / 0.72) <= 1.0,
                           REALISTIC_SHAPE)
    vol[body] = 40.0
    for sx in (-0.35, 0.35):  # lungs
        lung = ((z + 0.45) ** 2 / 0.16 + y ** 2 / 0.25
                + (x - sx) ** 2 / 0.08) <= 1.0
        vol[lung & body] = -800.0
    spine = (np.abs(x) < 0.08) & (y > 0.35) & (y < 0.62) & body
    vol[spine & (np.sin(z * 24) > -0.2)] = 700.0
    liver = ((z - 0.1) ** 2 / 0.09 + (y + 0.1) ** 2 / 0.2
             + (x + 0.3) ** 2 / 0.12) <= 1.0
    vol[liver & body] = 90.0
    rng = np.random.default_rng(0)
    vol += rng.normal(0, 12, REALISTIC_SHAPE).astype(np.float32) * body
    return np.clip(vol, -1024, 3071).astype(np.int16)


def read_sample():
    from totalsegmentator2d_tpu.io import read_image
    from totalsegmentator2d_tpu.ops import reorient
    img = reorient(read_image(CT_PATH), 'RAI')
    return (np.ascontiguousarray(img.array),
            (float(img.spacing[2]), float(img.spacing[0])))


def host_project(vol):
    """Coronal MIP + AIP, the ts2d-v2 two-channel input, in one fused host
    pass (native kernel when built). (Z, Y, X) -> (Z, X, 2)."""
    from totalsegmentator2d_tpu.ops.projection import project_arrays_np
    mx, mn = project_arrays_np(vol, ('max', 'mean'), 1)
    return np.stack([np.asarray(mx[:, 0], np.float32),
                     np.asarray(mn[:, 0], np.float32)], axis=-1)


def predict_scan(engine, vol, spacing):
    return engine.predict_array(host_project(vol), spacing)


def _time_projection(vol):
    t0 = time.perf_counter()
    host_project(vol)
    return time.perf_counter() - t0


def blocking_latency(engine, vol, spacing, n=5):
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        seg = predict_scan(engine, vol, spacing)
        times.append(time.perf_counter() - t0)
    assert seg.shape[-1] == sum(GROUP_LABELS.values())
    return [round(float(t), 4) for t in times]


def device_floor(engine, vol, spacing, rounds=4, solo=False):
    """Device-local rate estimate: ONE pre-uploaded input (batch-8, or the
    solo program with ``solo=True``), several back-to-back program
    executions, a tiny output-dependent fetch as the sync
    (block_until_ready returns early through the tunnel). Excludes the
    host<->device wire — the numbers a non-tunneled deployment would see:
    the batched figure is its throughput floor, the solo figure bounds
    its BLOCKING latency (+ ~7 ms host projection + ~1 ms local PCIe).
    Reported so rounds are not compared on tunnel weather alone."""
    import jax
    from totalsegmentator2d_tpu.inference.ensemble_engine import (
        _nonzero_bbox, _wire_pack, wire_detect)
    arr = host_project(vol)
    (y0, y1), (x0, x1) = _nonzero_bbox(arr)
    cropped = np.ascontiguousarray(arr[y0:y1, x0:x1])
    wire = wire_detect(cropped)
    if not any(wire):
        wire = None
    if solo:
        B = 1
        fn, _ = engine._serving_program(cropped.shape[:2], tuple(spacing),
                                        wire)
        xb = jax.device_put(_wire_pack(cropped, wire))
    else:
        B = engine._batcher.max_batch
        fn, _ = engine._batched_program(B, cropped.shape[:2],
                                        tuple(spacing), False, wire)
        xb = jax.device_put(_wire_pack(np.stack([cropped] * B), wire))

    def sync(out):
        t = out[1] if isinstance(out, tuple) else out
        np.asarray(jax.device_get(t[:1, :8] if t.ndim > 1 else t[:8]))

    sync(fn(engine.params, xb))  # warm
    t0 = time.perf_counter()
    out = None
    for _ in range(rounds):
        out = fn(engine.params, xb)
    sync(out)
    return float((time.perf_counter() - t0) / (rounds * B))


def wire_stats(engine, vol, spacing):
    """Host-side mirror of the compacted mask wire: full vs shipped
    download bytes per scan for this workload's masks (the download wire
    is the measured pipeline floor through the tunnel)."""
    from totalsegmentator2d_tpu.inference.ensemble_engine import (
        _COMPACT_TILE, _nonzero_bbox, pick_prefix)
    arr = host_project(vol)
    (y0, y1), (x0, x1) = _nonzero_bbox(arr)
    seg = engine.predict_array(arr, spacing)
    crop = seg[y0:y1, x0:x1]
    planes = np.packbits(crop, axis=-1,
                         bitorder='little').transpose(2, 0, 1).reshape(-1)
    total = planes.size
    T = -(-total // _COMPACT_TILE)
    padded = np.zeros(T * _COMPACT_TILE, np.uint8)
    padded[:total] = planes
    occ = padded.reshape(T, _COMPACT_TILE).any(axis=1)
    k = pick_prefix(int(occ.sum()), T)
    if not engine.compact_wire:
        return {'mask_bytes_full': int(total),
                'mask_bytes_shipped': int(total)}
    return {'mask_bytes_full': int(total),
            'mask_bytes_shipped': int(k * _COMPACT_TILE + -(-T // 8)),
            'mask_fg_fraction': round(float(crop.mean()), 5)}


def pipelined_rate(engine, vol, spacing, n=48, rounds=6, threads=1,
                   linger_ms=0.0):
    """Sustained serving throughput: a stream of n scans is projected on the
    host and dispatched async; scans in flight coalesce into micro-batched
    device programs (inference/batching.py), host projection overlaps device
    time, and the drain downloads bit-packed masks. Natural batching
    (linger 0) measured best in this serial-arrival regime — the queue fills
    behind each dispatch's upload latency; holding partial batches idles the
    device for a worse trade (116 vs 265-393 ms/scan at linger 40-80,
    tools/perf_probe7.py). threads=1: concurrent host projections thrash
    memory bandwidth (123 -> 338 ms/scan at 4 threads, perf_probe6.py).
    Best round is reported: the TPU here is reached through a shared tunnel
    whose throughput varies several-fold between moments, and min is the
    contention-robust estimator of machine capability (6 rounds ≈ 40 s of
    sampling — a few independent tunnel moments). n=48 keeps the
    steady state (arrival-aware micro-batching reaches full batch-8
    occupancy after a ~3-solo burst ramp, tools/perf_probe13.py) dominant
    over the ramp-up transient."""
    from concurrent.futures import ThreadPoolExecutor
    engine.set_batch_linger(linger_ms)
    try:
        rates = []
        with ThreadPoolExecutor(threads) as pool:
            for _ in range(rounds):
                t0 = time.perf_counter()
                handles = list(pool.map(
                    lambda _: engine.predict_array_async(host_project(vol),
                                                         spacing), range(n)))
                outs = [engine.finish_array(h) for h in handles]
                rates.append((time.perf_counter() - t0) / n)
                assert all(o.shape[-1] == sum(GROUP_LABELS.values())
                           for o in outs)
        return [round(float(r), 5) for r in rates]
    finally:
        engine.set_batch_linger(0.0)


def probe_backend(timeout_s=300.0):
    """Bounded backend-availability check in a subprocess.

    The TPU here is reached through a relay that can be down for hours, in
    which case jax backend init blocks forever — a bare hang tells the
    driver nothing. Probe in a child (backend state is per-process, so the
    parent can still init cleanly afterwards) and return
    (platform, error_string)."""
    import subprocess
    import sys
    code = 'import jax; print(jax.devices()[0].platform)'
    try:
        out = subprocess.run([sys.executable, '-c', code], text=True,
                             capture_output=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return None, f'backend init timed out after {int(timeout_s)}s'
    if out.returncode == 0 and out.stdout.strip():
        return out.stdout.strip().splitlines()[-1], None
    tail = (out.stderr.strip().splitlines() or ['backend init failed'])[-1]
    return None, tail[:200]


def main():
    from totalsegmentator2d_tpu.utils.logging import log_silent
    log_silent(True)  # exactly one JSON line on stdout

    platform, err = probe_backend()
    if platform is None:
        # value -1 (not 0): a numeric lower-is-better consumer must never
        # read the failure line as an infinitely fast scan
        print(json.dumps({
            'metric': ('sec/scan UNMEASURED: accelerator backend '
                       f'unavailable ({err}); the TPU relay tunnel is down '
                       '— see ROADMAP.md environment note for the last '
                       'measured on-device figures'),
            'value': -1.0, 'unit': 's', 'vs_baseline': 0.0,
            'unmeasured': True,
        }))
        return

    engine = build_engine()

    # PRIMARY: torso-sized realistic workload (honest vs the reference's
    # 0.5-0.9 s/scan on full-size CTs)
    vol_r = make_realistic_volume()
    sp_r = (1.5, 1.5)
    predict_scan(engine, vol_r, sp_r)  # compile
    lat_all = blocking_latency(engine, vol_r, sp_r)
    lat_r = min(lat_all)
    pipe_all = pipelined_rate(engine, vol_r, sp_r)
    pipe_r = min(pipe_all)
    try:
        floor = round(device_floor(engine, vol_r, sp_r), 5)
        floor_solo = round(device_floor(engine, vol_r, sp_r, rounds=6,
                                        solo=True), 5)
        # device-local blocking ESTIMATE: measured host projection +
        # measured solo program + ~1 ms local (non-relay) wire, summed on
        # paper — what a directly-attached TPU VM would see per blocking
        # predict. An estimate, not one end-to-end run (no non-tunneled
        # host exists here); versioned per round so the README's claim
        # stays auditable.
        proj_t = min(_time_projection(vol_r) for _ in range(3))
        blocking_est = round(proj_t + floor_solo + 0.001, 5)
        # per-execution dispatch+fetch overhead through the relay (round-5
        # stage0_probe2 discovery: ~25 ms, which single-program
        # measurements absorb whole; device_floor amortizes it over
        # rounds*B enqueues but the SOLO figure still carries ~1/rounds of
        # it). Versioned so floors are comparable across relay weather.
        import jax as _jax
        _one = _jax.device_put(np.float32(1.0))
        _null = _jax.jit(lambda s: s + 1.0)
        float(np.asarray(_jax.device_get(_null(_one))))  # compile
        _nt = []
        for _ in range(6):
            _t0 = time.perf_counter()
            float(np.asarray(_jax.device_get(_null(_one))))
            _nt.append(time.perf_counter() - _t0)
        dispatch_overhead = round(float(np.min(_nt)), 5)
    except Exception as ex:  # pragma: no cover
        floor = floor_solo = f'unavailable ({type(ex).__name__})'
        blocking_est = dispatch_overhead = floor
    try:
        wire = wire_stats(engine, vol_r, sp_r)
    except Exception as ex:  # pragma: no cover
        wire = f'unavailable ({type(ex).__name__})'

    # secondary (best effort): the bundled real TotalSegmentator CT
    try:
        vol_s, sp_s = read_sample()
        predict_scan(engine, vol_s, sp_s)  # compile
        sample = f'{round(min(pipelined_rate(engine, vol_s, sp_s)), 4)}s/scan'
    except Exception as ex:  # pragma: no cover
        sample = f'unavailable ({type(ex).__name__})'

    # secondary (best effort): the native X-ray workload class (tsxr) —
    # the reference's second published config (test_020:48-52)
    try:
        engine.close()  # one resident batcher at a time
        xeng = build_xray_engine()
        xray = f'{round(xray_rate(xeng), 4)}s/scan'
        xeng.close()
    except Exception as ex:  # pragma: no cover
        xray = f'unavailable ({type(ex).__name__})'

    # plain-wire device floors: what a NON-tunneled deployment would run —
    # it has no reason to pay the compact pack's device cost (~2.8 ms/scan
    # post-gather-rewrite; the compacted wire exists to beat the relay's
    # 16-20 MB/s download). Measured, not derived (VERDICT r4 item 5).
    # The solo plain figure feeds the device-local blocking estimate;
    # rounds=8 keeps the ~25 ms dispatch overhead share to ~3 ms.
    try:
        peng = build_engine(compact=False)
        floor_plain = round(device_floor(peng, vol_r, sp_r), 5)
        floor_solo_plain = round(device_floor(peng, vol_r, sp_r, rounds=8,
                                              solo=True), 5)
        peng.close()
        blocking_est = round(proj_t + floor_solo_plain + 0.001, 5)
    except Exception as ex:  # pragma: no cover
        floor_plain = floor_solo_plain = f'unavailable ({type(ex).__name__})'

    print(json.dumps({
        'metric': ('sec/scan, full 5-model/117-label ts2d-v2-style ensemble '
                   'on a torso-phantom 350x250x280 CT (4 tiles/model, '
                   'realistic-sparsity masks — see module docstring), '
                   'host-projection + fused device program, pipelined '
                   f'(blocking latency {round(lat_r, 4)}s; bundled small CT '
                   f'sample_s0521 {sample}; tsxr-style native X-ray '
                   f'sample_chexpert 320x320 {xray})'),
        'value': round(pipe_r, 5),
        'unit': 's',
        'vs_baseline': round(0.7 / pipe_r, 3),
        # spread/floor context: the TPU sits behind a shared tunnel whose
        # throughput varies several-fold between moments — single-moment
        # minima are not comparable across rounds without these
        'pipelined_all_rounds': pipe_all,
        'blocking_all_runs': lat_all,
        'device_floor_s_per_scan': floor,
        'device_floor_plain_wire_s': floor_plain,
        # the solo-program device time bounds a NON-TUNNELED deployment's
        # blocking latency (+ ~7 ms host projection + ~1 ms local PCIe);
        # through this relay, upload RPC (~50 ms) + the solo program
        # already exceed 0.1 s before any download — see
        # docs/performance.md "The blocking-latency floor"
        'device_solo_s': floor_solo,
        # plain-wire solo (rounds=8): the program a local deployment would
        # run blocking — no compact pack, smaller dispatch-overhead share.
        # device_blocking_est_s = host projection + this + ~1 ms local wire.
        'device_solo_plain_s': floor_solo_plain,
        'device_blocking_est_s': blocking_est,
        'dispatch_overhead_s': dispatch_overhead,
        'wire': wire,
    }))


if __name__ == '__main__':
    main()
