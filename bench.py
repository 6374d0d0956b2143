"""End-to-end benchmark: ts2d-v2-style 5-model ensemble on one CT scan.

Measures the full host-to-host pipeline on a real CT volume
(reference assets, SURVEY.md §4): NRRD read -> RAI reorientation -> coronal
MIP/AIP projection -> the five anatomical-group 2D multilabel U-Nets
(realistic nnU-Net scale, 117 labels total) fused into ONE stacked-ensemble
XLA program (sliding window + mirror TTA + Gaussian blending + on-device
117-channel merge) -> merged multilabel segmentation back on host.

Weights are randomly initialized at the published architecture scale (the
real Zenodo checkpoints need network access); timing is identical either
way — the compute graph does not depend on weight values.

Prints ONE JSON line:
  {"metric": "sec/scan ts2d-v2-style 5-model ensemble e2e",
   "value": <median sec>, "unit": "s", "vs_baseline": <0.7 / value>}

Baseline: the reference reports 0.5-0.9 s/scan on an RTX 4090
(README.md:43-45); vs_baseline uses the 0.7 s midpoint, >1 means faster.
"""

import json
import time

import numpy as np

CT_PATH = '/root/reference/assets/sample_s0521.nrrd'
GROUP_LABELS = {  # 117 labels total, ts2d-v2 style
    'cardiac': 24, 'muscles': 21, 'organs': 22, 'ribs': 24, 'vertebrae': 26,
}
PATCH = (256, 256)
N_STAGES = 6
N_WARMUP = 2
N_ITERS = 10


def build_engine():
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
                          use_mirroring=True)


def predict_scan(engine, path):
    """The full per-scan pipeline, host-to-host: NRRD read + RAI reorient on
    host, then ONE fused device program (projection -> preprocessing ->
    ensemble -> merge)."""
    from totalsegmentator2d_tpu.io import read_image
    from totalsegmentator2d_tpu.ops import reorient

    img = read_image(path)
    img = reorient(img, 'RAI')
    spacing_yx = (float(img.spacing[2]), float(img.spacing[0]))
    seg, _proj = engine.predict_volume(np.ascontiguousarray(img.array),
                                       spacing_yx, ('max', 'mean'))
    return seg


def throughput_scans(engine, path, n_scans: int = 20):
    """Pipelined mode: dispatch every scan asynchronously (host read + device
    program overlap), block once at the end — the production serving shape.
    Returns sec/scan."""
    import jax
    from totalsegmentator2d_tpu.io import read_image
    from totalsegmentator2d_tpu.ops import reorient

    t0 = time.perf_counter()
    pending = []
    for _ in range(n_scans):
        img = reorient(read_image(path), 'RAI')
        spacing_yx = (float(img.spacing[2]), float(img.spacing[0]))
        seg, _ = engine.predict_volume_async(
            np.ascontiguousarray(img.array), spacing_yx, ('max', 'mean'))
        pending.append(seg)
    results = [np.asarray(jax.device_get(s)) for s in pending]
    dt = time.perf_counter() - t0
    assert all(r.shape[-1] == sum(GROUP_LABELS.values()) for r in results)
    return dt / n_scans


def main():
    engine = build_engine()
    for _ in range(N_WARMUP):
        merged = predict_scan(engine, CT_PATH)

    # blocking single-scan latency (reported as secondary detail)
    times = []
    for _ in range(N_ITERS):
        t0 = time.perf_counter()
        merged = predict_scan(engine, CT_PATH)
        times.append(time.perf_counter() - t0)
    latency = float(np.median(times))
    assert merged.shape[-1] == sum(GROUP_LABELS.values())

    # pipelined steady-state sec/scan (primary: the production serving rate)
    sec = throughput_scans(engine, CT_PATH)

    print(json.dumps({
        'metric': 'sec/scan ts2d-v2-style 5-model ensemble e2e (pipelined; '
                  f'blocking latency {round(latency, 5)}s)',
        'value': round(sec, 5),
        'unit': 's',
        'vs_baseline': round(0.7 / sec, 3),
    }))


if __name__ == '__main__':
    main()
