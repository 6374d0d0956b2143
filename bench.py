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
at the published architecture scale (real checkpoints need network access);
timing does not depend on weight values.

Prints ONE JSON line; value = pipelined sec/scan on the torso-sized
workload (async dispatch, host projection overlapped — the production
serving rate), with blocking latency and the small-sample rate in the
metric string. vs_baseline = 0.7 s (reference RTX 4090 midpoint) / value;
>1 means faster.
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


def build_engine():
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
        params.append([init_params_np(i, arch)])
    return EnsembleEngine(specs, params, tile_step_size=0.5,
                          use_mirroring=True, compute_dtype=jnp.bfloat16,
                          auto_batch=8)


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
    return EnsembleEngine([spec], [[init_params_np(7, arch)]],
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
    rng = np.random.default_rng(0)
    vol = rng.normal(40.0, 300.0, size=REALISTIC_SHAPE)
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


def blocking_latency(engine, vol, spacing, n=5):
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        seg = predict_scan(engine, vol, spacing)
        times.append(time.perf_counter() - t0)
    assert seg.shape[-1] == sum(GROUP_LABELS.values())
    return float(np.min(times))


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
        return float(np.min(rates))
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
    lat_r = blocking_latency(engine, vol_r, sp_r)
    pipe_r = pipelined_rate(engine, vol_r, sp_r)

    # secondary (best effort): the bundled real TotalSegmentator CT
    try:
        vol_s, sp_s = read_sample()
        predict_scan(engine, vol_s, sp_s)  # compile
        sample = f'{round(pipelined_rate(engine, vol_s, sp_s), 4)}s/scan'
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

    print(json.dumps({
        'metric': ('sec/scan, full 5-model/117-label ts2d-v2-style ensemble '
                   'on a torso-sized 350x250x280 CT (4 tiles/model), '
                   'host-projection + fused device program, pipelined '
                   f'(blocking latency {round(lat_r, 4)}s; bundled small CT '
                   f'sample_s0521 {sample}; tsxr-style native X-ray '
                   f'sample_chexpert 320x320 {xray})'),
        'value': round(pipe_r, 5),
        'unit': 's',
        'vs_baseline': round(0.7 / pipe_r, 3),
    }))


if __name__ == '__main__':
    main()
