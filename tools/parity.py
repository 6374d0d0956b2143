"""Real-checkpoint parity harness (VERDICT round-1, item 3).

Quantifies mask parity between this framework and the reference
(risc-mi/totalsegmentator2D + nnunetv2, reference prediction_worker.py:204-221,
nnu.py:149-166) on the four bundled assets.

This sandbox has no network, so the published Zenodo checkpoints cannot be
fetched here; the harness is built to run the moment a model database (or
reference-produced goldens) is supplied, and in the meantime runs an offline
mode that pins down the semantics the real comparison depends on.

Modes
-----
real
    ``python tools/parity.py --models <root> [--key ts2d] [--golden <dir>]``
    Loads the real checkpoints from a local model database (copy the
    extracted Zenodo zips into <root>), predicts every bundled asset, writes
    our segmentations to --out, and — when --golden holds the reference's
    outputs (files named <asset>.seg.nrrd, produced by running the reference
    CLI elsewhere) — reports per-label Dice + voxel agreement per asset.

offline (default, no --models)
    Semantic sub-checks that must hold for reference parity, each
    root-causeable on its own:
      * gaussian-window: our importance map vs the nnU-Net construction
        (scipy gaussian_filter of a center delta, sigma = patch/8,
        clipped to its positive minimum)
      * crop-roundtrip: predict_array == manual crop -> predict -> re-embed
        on a sparse (zero-background) input
      * volume-crop: the fused volume path equals the projected-2D path on
        a zero-background volume (crop semantics restored in round 2)
      * resample-order: segmentation == threshold(order-1-upsampled logits)
        — nnU-Net resamples LOGITS, then thresholds
      * fused-vs-permodel: the fused ensemble equals per-model engines on
        a synthetic zoo across the bundled assets

Output: one JSON report (--out parity_report.json) with a per-check verdict.
"""

import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ASSETS = ('sample_s0521', 'sample_s0332', 'sample_s0616', 'sample_chexpert')


def _asset_path(name):
    # synthetic regenerations of the reference's bundled samples (same
    # headers/geometry, phantom content; tests/synth_assets.py)
    from tests.synth_assets import asset_path
    return asset_path(f'{name}.nrrd')


# ---------------------------------------------------------------------------
# real mode
# ---------------------------------------------------------------------------

def run_real(models_root: str, key: str, golden_dir, out_dir: str) -> dict:
    from totalsegmentator2d_tpu.api import TS2D
    from totalsegmentator2d_tpu.eval import dice_per_label
    from totalsegmentator2d_tpu.io import read_image

    os.makedirs(out_dir, exist_ok=True)
    report = {'mode': 'real', 'key': key, 'assets': {}}
    with TS2D(key=key, use_remote=False, fetch_remote=False,
              local=models_root) as tool:
        for name in ASSETS:
            path = _asset_path(name)
            if not os.path.exists(path):
                continue
            entry = {}
            try:
                res = tool.predict(path)
                res.save(out_dir, name=name, models='final',
                         targets='segmentation', content='file')
                entry['predicted'] = True
                golden_path = (os.path.join(golden_dir, f'{name}.seg.nrrd')
                               if golden_dir else None)
                if golden_path and os.path.exists(golden_path):
                    pred = res.get_segmentation()
                    gold = read_image(golden_path)
                    scores = dice_per_label(pred, gold)
                    agree = _voxel_agreement(pred, gold)
                    entry['per_label_dice'] = scores
                    entry['mean_dice'] = float(np.mean(list(scores.values())))
                    entry['voxel_agreement'] = agree
                    entry['diverging_labels'] = sorted(
                        n for n, s in scores.items() if s < 0.999)
            except Exception as ex:  # keep going; report per asset
                entry['error'] = f'{type(ex).__name__}: {ex}'
            report['assets'][name] = entry
    return report


def _voxel_agreement(pred, gold) -> float:
    a, b = pred.array, gold.array
    if a.shape != b.shape:
        return 0.0
    return float((a == b).mean())


# ---------------------------------------------------------------------------
# offline sub-checks
# ---------------------------------------------------------------------------

def check_gaussian_window() -> dict:
    """Our Gaussian importance map vs nnU-Net's construction."""
    import scipy.ndimage as ndi
    from totalsegmentator2d_tpu.ops.gaussian import gaussian_map

    patch = (256, 256)
    ours = np.asarray(gaussian_map(patch))
    delta = np.zeros(patch, np.float32)
    delta[tuple(p // 2 for p in patch)] = 1.0
    ref = ndi.gaussian_filter(delta, sigma=[p / 8 for p in patch], mode='constant')
    ref /= ref.max()
    ref[ref == 0] = ref[ref != 0].min()
    err = float(np.abs(ours - ref).max())
    return {'ok': err < 1e-5, 'max_abs_err': err}


def _synthetic_tool(tmp):
    from tests.model_fixtures import build_group_set
    from totalsegmentator2d_tpu.api import TS2D
    root = os.path.join(tmp, 'models')
    build_group_set(root, model='ts2d-v9-test', groups=('cardiac', 'ribs'))
    return TS2D(key='ts2d-v9-test', use_remote=False, local=root)


def check_crop_roundtrip() -> dict:
    """Sparse 2D input: engine crop == manual crop + re-embed (nnU-Net
    crop_to_nonzero, reference prediction_worker.py:194-200)."""
    from tests.model_fixtures import make_dataset_json, make_plans
    from totalsegmentator2d_tpu.inference import InferenceEngine
    from totalsegmentator2d_tpu.models.plans import parse_model_spec
    from totalsegmentator2d_tpu.models.unet import init_params_np

    spec = parse_model_spec(make_plans(patch=(64, 64)),
                            make_dataset_json(('heart', 'aorta')))
    eng = InferenceEngine(spec, [init_params_np(0, spec.arch)])
    rng = np.random.default_rng(0)
    arr = np.zeros((120, 100, 2), np.float32)
    arr[20:90, 15:80] = rng.standard_normal((70, 65, 2)) + 2
    full = eng.predict_array(arr, (1.5, 1.5))
    inner = eng.predict_array(arr[20:90, 15:80], (1.5, 1.5))
    embedded = np.zeros_like(full)
    embedded[20:90, 15:80] = inner
    agree = float((full == embedded).mean())
    outside_clean = not full[:20].any() and not full[:, :15].any()
    return {'ok': agree > 0.9999 and outside_clean,
            'agreement': agree, 'outside_clean': bool(outside_clean)}


def check_volume_crop() -> dict:
    """Zero-background volume: fused volume path == host-projection 2D path."""
    from tests.model_fixtures import make_dataset_json, make_plans
    from totalsegmentator2d_tpu.inference import EnsembleEngine
    from totalsegmentator2d_tpu.models.plans import parse_model_spec
    from totalsegmentator2d_tpu.models.unet import init_params_np
    from totalsegmentator2d_tpu.ops.projection import project_array_np

    specs, params = [], []
    for i, labels in enumerate((('heart', 'aorta'), ('r1', 'r2', 'r3'))):
        spec = parse_model_spec(make_plans(patch=(64, 64)),
                                make_dataset_json(labels))
        specs.append(spec)
        params.append([init_params_np(i, spec.arch)])
    ens = EnsembleEngine(specs, params)
    rng = np.random.default_rng(1)
    vol = np.zeros((60, 30, 50), np.float32)
    vol[10:50, 5:25, 8:40] = rng.standard_normal((40, 20, 32)) * 100 + 50
    seg_vol, _ = ens.predict_volume(vol, (1.5, 1.5), ('max', 'mean'))
    proj = np.concatenate([
        project_array_np(vol, 'max', 1),
        project_array_np(vol, 'mean', 1)], axis=1).transpose(0, 2, 1)
    seg_2d = ens.predict_array(np.ascontiguousarray(proj, np.float32),
                               (1.5, 1.5))
    agree = float((seg_vol == seg_2d).mean())
    return {'ok': agree > 0.9999, 'agreement': agree}


def check_resample_order() -> dict:
    """nnU-Net thresholds AFTER resampling logits to the input grid."""
    import jax
    import jax.numpy as jnp
    from tests.model_fixtures import make_dataset_json, make_plans
    from totalsegmentator2d_tpu.inference import InferenceEngine
    from totalsegmentator2d_tpu.models.plans import parse_model_spec
    from totalsegmentator2d_tpu.models.unet import init_params_np

    spec = parse_model_spec(make_plans(patch=(64, 64), spacing=(1.5, 1.5)),
                            make_dataset_json(('heart', 'aorta')))
    eng = InferenceEngine(spec, [init_params_np(0, spec.arch)])
    rng = np.random.default_rng(2)
    arr = (rng.standard_normal((80, 70, 2)) + 2).astype(np.float32)
    # spacing 3.0 -> engine resamples 2x internally
    seg, logits, bbox = eng.predict_array(arr, (3.0, 3.0), return_logits=True)
    expect = np.asarray(jax.device_get(
        (jax.nn.sigmoid(jnp.asarray(logits)) > 0.5).astype(jnp.uint8)))
    (y0, y1), (x0, x1) = bbox
    agree = float((seg[y0:y1, x0:x1] == expect).mean())
    full_res = logits.shape[:2] == (y1 - y0, x1 - x0)
    return {'ok': agree == 1.0 and full_res,
            'agreement': agree, 'logits_at_input_grid': bool(full_res)}


def check_fused_vs_permodel() -> dict:
    """Fused ensemble == per-model engines across the bundled assets."""
    from totalsegmentator2d_tpu.io import read_image

    results = {}
    with tempfile.TemporaryDirectory() as tmp:
        tool = _synthetic_tool(tmp)
        try:
            fused_ok = tool._fused is not None
            for name in ('sample_s0332', 'sample_s0616'):
                path = _asset_path(name)
                if not os.path.exists(path):
                    continue
                res = tool.predict(read_image(path))
                fused = res.get_segmentation()
                tool._fused, saved = None, tool._fused
                for m in tool.models.values():
                    m.start(wait=True)
                res2 = tool.predict(read_image(path))
                tool._fused = saved
                permodel = res2.get_segmentation()
                results[name] = float(
                    (fused.array == permodel.array).mean())
        finally:
            tool.close()
    ok = bool(results) and all(v > 0.9999 for v in results.values())
    return {'ok': ok and fused_ok, 'fused_path_active': fused_ok,
            'agreement': results}


def check_full_chain() -> dict:
    """The composed engine path vs the independent numpy/scipy/torch oracle
    (tests/reference_chain.py — a from-scratch reimplementation of the
    reference chain, prediction_worker.py:194-221) end-to-end: float logits
    AND final masks, across {multilabel, softmax, masked-norm, resampling,
    multi-fold, ct-norm} configs plus the four bundled assets.

    Tolerances: 5e-3 max-abs logit error on synthetic configs (1e-2 on the
    larger real assets) covers two independent conv stacks (torch vs XLA)
    and resamplers drifting by float-accumulation order over 4 U-Net
    stages; mask agreement >= 99.9% bounds decision flips to pixels whose
    sigmoid sits within that drift of 0.5.

    The check runs on the CPU backend even when a TPU is attached: it pins
    SEMANTIC parity, which must be hardware-independent. On TPU the same
    programs additionally carry XLA's default conv precision (~1e-2 logit
    drift, the documented borderline-pixel flips of docs/performance.md) —
    asserting through that would conflate precision with semantics."""
    import jax

    from tests import reference_chain as RC
    from totalsegmentator2d_tpu.inference import InferenceEngine

    rng = np.random.default_rng(21)
    with jax.default_device(jax.devices('cpu')[0]):
        return _full_chain_body(RC, InferenceEngine, rng)


def _full_chain_body(RC, InferenceEngine, rng) -> dict:
    configs = {}
    ok = True
    for name in ('multilabel', 'softmax', 'masked-norm', 'resampling',
                 'multifold', 'ct-norm'):
        arr, spacing = RC.config_input(name, rng)
        spec, nets, fold_params = RC.build_config(name)
        eng = InferenceEngine(spec, fold_params)
        seg, logits, bbox = eng.predict_array(arr, spacing,
                                              return_logits=True)
        ref_seg, ref_logits, ref_bbox = RC.predict(arr, spacing, spec, nets)
        entry = {
            'max_abs_logit_err': float(np.abs(logits - ref_logits).max()),
            'mask_agreement': float((seg == ref_seg).mean()),
            'bbox_match': bbox == ref_bbox,
        }
        entry['ok'] = (entry['bbox_match']
                       and entry['max_abs_logit_err'] < 5e-3
                       and entry['mask_agreement'] >= 0.999)
        ok = ok and entry['ok']
        configs[name] = entry

    assets = {}
    import tests.test_019_full_chain_parity as T19
    helper = T19.TestFullChainOnAssets()
    for name in ASSETS:
        if not os.path.exists(_asset_path(name)):
            continue
        arr, spacing = helper._asset_2d(name)
        channels = ('max', 'mean') if arr.shape[-1] == 2 else ('xray',)
        spec, nets, fold_params = RC.build_config('multilabel',
                                                  channels=channels)
        eng = InferenceEngine(spec, fold_params)
        seg, logits, bbox = eng.predict_array(arr, spacing,
                                              return_logits=True)
        ref_seg, ref_logits, _ = RC.predict(arr, spacing, spec, nets)
        entry = {
            'max_abs_logit_err': float(np.abs(logits - ref_logits).max()),
            'mask_agreement': float((seg == ref_seg).mean()),
        }
        entry['ok'] = (entry['max_abs_logit_err'] < 1e-2
                       and entry['mask_agreement'] >= 0.999)
        ok = ok and entry['ok']
        assets[name] = entry
    return {'ok': ok, 'configs': configs, 'assets': assets}


def _oracle_onehot(ref_seg: np.ndarray, spec) -> np.ndarray:
    """The oracle's full-size seg in the engine's packed one-hot layout:
    multilabel groups are already (H, W, L); softmax groups pack
    out_channels - 1 channels (background dropped on device)."""
    if spec.multilabel:
        return ref_seg
    L = spec.arch.out_channels - 1
    return np.stack([(ref_seg == v + 1) for v in range(L)],
                    axis=-1).astype(np.uint8)


def _mask_vs_oracle(seg, ref_seg, ref_logits, bbox, spec,
                    margin: float) -> dict:
    """Compare an engine's full-size packed seg against the oracle:
    agreement + the borderline-only-flips criterion (every disagreeing
    pixel's ORACLE decision sits within ``margin`` of the threshold —
    |logit| for sigmoid, top-2 gap for argmax; disagreements OUTSIDE the
    crop are background-vs-background and never borderline)."""
    seg = np.asarray(seg)
    ref = _oracle_onehot(np.asarray(ref_seg), spec)
    agree = float((seg == ref).mean())
    dis = seg != ref
    (y0, y1), (x0, x1) = bbox
    outside = dis.copy()
    outside[y0:y1, x0:x1] = False
    dis = dis[y0:y1, x0:x1]
    if spec.multilabel:
        flips = bool(np.all(np.abs(ref_logits[dis]) <= margin))
    else:
        part = np.partition(ref_logits, ref_logits.shape[-1] - 2, axis=-1)
        top2 = part[..., -1] - part[..., -2]
        flips = bool(np.all(top2[np.any(dis, axis=-1)] <= 2.0 * margin))
    return {'mask_agreement': agree,
            'flips_borderline_only': flips and not outside.any()}


#: borderline-flip margin for the load-path checks (batched / quantized):
#: covers the solo path's 5e-3 cross-stack logit drift plus the
#: batch-size-dependent conv scheduling the batched program adds
#: (docs/performance.md determinism note)
_LOAD_MARGIN = 2e-2

_CONFIGS = ('multilabel', 'softmax', 'masked-norm', 'resampling',
            'multifold', 'ct-norm')


def check_full_chain_batched() -> dict:
    """The MICRO-BATCHED program (B > 1) vs the oracle (VERDICT r3 item 5):
    the production serving path coalesces concurrent scans into one
    vmapped program whose conv scheduling differs from the solo
    program's — previously bounded only by synthetic-weight agreement
    with the solo engine (test_008), now compared end-to-end against
    tests/reference_chain.py like the solo path. Each config submits
    max_batch concurrent scans under a linger so they provably ride ONE
    batched dispatch (occupancy asserted)."""
    import jax

    from tests import reference_chain as RC
    from totalsegmentator2d_tpu.inference import EnsembleEngine

    B = 4
    rng = np.random.default_rng(33)
    configs = {}
    ok = True
    with jax.default_device(jax.devices('cpu')[0]):
        for name in _CONFIGS:
            spec, nets, fold_params = RC.build_config(name)
            eng = EnsembleEngine([spec], [fold_params], auto_batch=B)
            try:
                eng.set_batch_linger(30_000.0)  # force a full batch
                pairs = [RC.config_input(name, rng) for _ in range(B)]
                handles = [eng.predict_array_async(a, sp)
                           for a, sp in pairs]
                segs = [eng.finish_array(h) for h in handles]
                occ = eng._batcher.stats()['batch_occupancy']
            finally:
                eng.close()
            entry = {'batched_scans': sum((i + 1) * c
                                          for i, c in enumerate(occ)
                                          if i > 0)}
            worst = None
            for (arr, sp), seg in zip(pairs, segs):
                ref_seg, ref_logits, bbox = RC.predict(arr, sp, spec, nets)
                m = _mask_vs_oracle(seg, ref_seg, ref_logits, bbox, spec,
                                    _LOAD_MARGIN)
                if (worst is None
                        or m['mask_agreement'] < worst['mask_agreement']):
                    worst = m
            entry.update(worst)
            entry['ok'] = (entry['batched_scans'] >= 2
                           and entry['mask_agreement'] >= 0.999
                           and entry['flips_borderline_only'])
            ok = ok and entry['ok']
            configs[name] = entry
    return {'ok': ok, 'max_batch': B, 'configs': configs}


def check_full_chain_quantized() -> dict:
    """The QUANTIZED-SHAPE serving program (pad_quantum geometry-as-data
    buckets) vs the oracle (VERDICT r3 item 5): the bucket program derives
    the scan's true extent from a valid mask and must reproduce exact-mode
    geometry — previously bounded only by agreement with the exact program
    (test_008), now against the independent oracle end-to-end."""
    import jax

    from tests import reference_chain as RC
    from totalsegmentator2d_tpu.inference import EnsembleEngine

    rng = np.random.default_rng(34)
    configs = {}
    ok = True
    with jax.default_device(jax.devices('cpu')[0]):
        for name in _CONFIGS:
            arr, spacing = RC.config_input(name, rng)
            spec, nets, fold_params = RC.build_config(name)
            eng = EnsembleEngine([spec], [fold_params], pad_quantum=32)
            seg = eng.predict_array(arr, spacing)
            ref_seg, ref_logits, bbox = RC.predict(arr, spacing, spec, nets)
            entry = _mask_vs_oracle(seg, ref_seg, ref_logits, bbox, spec,
                                    _LOAD_MARGIN)
            entry['ok'] = (entry['mask_agreement'] >= 0.999
                           and entry['flips_borderline_only'])
            ok = ok and entry['ok']
            configs[name] = entry
    return {'ok': ok, 'pad_quantum': 32, 'configs': configs}


def check_full_chain_bench_arch() -> dict:
    """The composed chain at the BENCH-SCALE architecture (6 stages,
    256^2 patch, features 32..512, 26 labels, 350x280 torso-projection
    input — the program shape bench.py actually runs) vs the oracle
    (VERDICT r3 item 5: 'lift the oracle configs to the bench-scale
    6-stage architecture'). One config; heavier than the 4-stage matrix
    (a few hundred GFLOP of torch on the host)."""
    import jax

    from tests import reference_chain as RC
    from totalsegmentator2d_tpu.inference import InferenceEngine

    rng = np.random.default_rng(35)
    with jax.default_device(jax.devices('cpu')[0]):
        arr, spacing = RC.config_input('bench-arch', rng)
        spec, nets, fold_params = RC.build_config('bench-arch')
        eng = InferenceEngine(spec, fold_params)
        seg, logits, bbox = eng.predict_array(arr, spacing,
                                              return_logits=True)
        ref_seg, ref_logits, ref_bbox = RC.predict(arr, spacing, spec, nets)
        entry = {
            'max_abs_logit_err': float(np.abs(logits - ref_logits).max()),
            'mask_agreement': float((seg == ref_seg).mean()),
            'bbox_match': bbox == ref_bbox,
        }
        # deeper stack than the 4-stage matrix: two independent conv
        # stacks drift further over 6 stages; masks stay the criterion
        entry['ok'] = (entry['bbox_match']
                       and entry['max_abs_logit_err'] < 2e-2
                       and entry['mask_agreement'] >= 0.999)
    return entry


def check_device_full_chain() -> dict:
    """The same composed chain, run on the DEFAULT backend (the real TPU
    when one is attached) against the host oracle — quantifies what the
    CPU-pinned `full-chain` check deliberately excludes: XLA's default
    conv precision on the accelerator (~1e-2 logit drift, the documented
    borderline-pixel flips of docs/performance.md). Synthetic configs
    only (90x80 inputs): asset-sized programs take minutes to compile
    through the relay tunnel for no extra semantic coverage.

    Tolerances: 2e-2 max-abs logit error (device conv precision on top of
    the 5e-3 cross-stack drift). A fixed mask-agreement percentage would
    be dishonest here — the synthetic random-weight nets put orders of
    magnitude more pixels at the decision boundary than trained
    checkpoints do — so the mask criterion is *borderline-only flips*:
    every disagreeing pixel's ORACLE decision must sit within 3x the
    measured logit drift of the decision threshold (|logit| for
    channelwise sigmoid>0.5, top-2 margin for argmax). Agreement is
    still reported for the record."""
    import jax

    from tests import reference_chain as RC
    from totalsegmentator2d_tpu.inference import InferenceEngine

    platform = jax.devices()[0].platform
    rng = np.random.default_rng(21)
    configs = {}
    ok = True
    for name in ('multilabel', 'softmax', 'masked-norm', 'resampling',
                 'multifold', 'ct-norm'):
        arr, spacing = RC.config_input(name, rng)
        spec, nets, fold_params = RC.build_config(name)
        eng = InferenceEngine(spec, fold_params)
        seg, logits, bbox = eng.predict_array(arr, spacing,
                                              return_logits=True)
        ref_seg, ref_logits, ref_bbox = RC.predict(arr, spacing, spec, nets)
        drift = float(np.abs(logits - ref_logits).max())
        # seg/ref_seg live on the FULL input grid (predict_array re-embeds
        # the crop) while logits stay at crop resolution — restrict the
        # disagreement map to the crop before indexing the oracle logits.
        # Anything disagreeing OUTSIDE the crop is background vs background
        # and can never be a borderline flip.
        dis = np.asarray(seg) != np.asarray(ref_seg)
        (y0, y1), (x0, x1) = bbox
        outside = dis.copy()
        outside[y0:y1, x0:x1] = False
        dis = dis[y0:y1, x0:x1]
        margin = 3.0 * max(drift, 1e-4)
        if spec.multilabel:
            # channelwise sigmoid > 0.5: threshold is logit 0
            flips_borderline = bool(
                np.all(np.abs(ref_logits[dis]) <= margin))
        else:
            # argmax: borderline iff the oracle's top-2 margin is small
            part = np.partition(ref_logits, ref_logits.shape[-1] - 2,
                                axis=-1)
            top2 = part[..., -1] - part[..., -2]
            while dis.ndim > top2.ndim:  # labelmap with a channel axis
                dis = np.any(dis, axis=-1)
            flips_borderline = bool(np.all(top2[dis] <= 2.0 * margin))
        flips_borderline = flips_borderline and not outside.any()
        entry = {
            'max_abs_logit_err': drift,
            'mask_agreement': float((seg == ref_seg).mean()),
            'flips_borderline_only': flips_borderline,
            'bbox_match': bbox == ref_bbox,
        }
        entry['ok'] = (entry['bbox_match'] and drift < 2e-2
                       and flips_borderline)
        ok = ok and entry['ok']
        configs[name] = entry
    return {'ok': ok, 'platform': platform, 'configs': configs}


def run_device(out_path: str) -> dict:
    """Run the device-backend full-chain check and merge it into an
    existing offline report (so parity_report.json accumulates both)."""
    from bench import probe_backend
    platform, err = probe_backend()
    if platform in (None, 'cpu'):
        check = {'ok': False,
                 'error': f'no accelerator backend ({err or platform})'}
    else:
        try:
            check = check_device_full_chain()
        except Exception as ex:
            check = {'ok': False, 'error': f'{type(ex).__name__}: {ex}'}
    print(f'full-chain-device: {check}', file=sys.stderr)

    report = {'mode': 'offline', 'checks': {}}
    if os.path.exists(out_path):
        try:
            with open(out_path) as f:
                prior = json.load(f)
            if isinstance(prior.get('checks'), dict):
                report = prior
        except Exception:
            pass
    report['checks']['full-chain-device'] = check
    report['ok'] = all(c.get('ok') for c in report['checks'].values())
    return report


def run_offline() -> dict:
    checks = {
        'gaussian-window': check_gaussian_window,
        'crop-roundtrip': check_crop_roundtrip,
        'volume-crop': check_volume_crop,
        'resample-order': check_resample_order,
        'fused-vs-permodel': check_fused_vs_permodel,
        'full-chain': check_full_chain,
        'full-chain-batched': check_full_chain_batched,
        'full-chain-quantized': check_full_chain_quantized,
        'full-chain-bench-arch': check_full_chain_bench_arch,
    }
    report = {'mode': 'offline', 'checks': {}}
    for name, fn in checks.items():
        try:
            report['checks'][name] = fn()
        except Exception as ex:
            report['checks'][name] = {'ok': False,
                                      'error': f'{type(ex).__name__}: {ex}'}
        print(f'{name}: {report["checks"][name]}', file=sys.stderr)
    report['ok'] = all(c.get('ok') for c in report['checks'].values())
    return report


def main():
    ap = argparse.ArgumentParser(description=__doc__.split('\n')[0])
    ap.add_argument('--models', default=None,
                    help='local model database root with real checkpoints')
    ap.add_argument('--key', default='ts2d')
    ap.add_argument('--golden', default=None,
                    help='directory of reference-produced <asset>.seg.nrrd')
    ap.add_argument('--out', default='parity_report.json')
    ap.add_argument('--outdir', default='parity_out',
                    help='where to write our segmentations (real mode)')
    ap.add_argument('--device', action='store_true',
                    help='run the full chain on the attached accelerator '
                         'backend and merge a full-chain-device check '
                         'into --out (device conv-precision drift vs the '
                         'host oracle)')
    args = ap.parse_args()

    if args.models:
        report = run_real(args.models, args.key, args.golden, args.outdir)
    elif args.device:
        report = run_device(args.out)
    else:
        # offline checks pin SEMANTIC parity and must run on CPU even with
        # an accelerator attached. jax.default_device is thread-local and
        # does not reach the micro-batch dispatcher thread (the batched
        # check), so pin the whole process before the backend initializes.
        import jax
        os.environ['JAX_PLATFORMS'] = 'cpu'
        # never share the persistent compilation cache with TPU/bench
        # runs: AOT CPU entries written through the tunnel target a
        # different host's CPU features and load with SIGILL-risk
        # warnings (same guard as tests/conftest.py)
        os.environ.setdefault('TS2D_COMPILE_CACHE', '0')
        try:
            jax.config.update('jax_platforms', 'cpu')
        except Exception:
            pass  # backend already up (e.g. imported by a caller): the
            #       per-check default_device still covers the solo paths
        report = run_offline()
    with open(args.out, 'w') as f:
        json.dump(report, f, indent=2)
    print(json.dumps({'ok': report.get('ok', True), 'report': args.out}))
    return 0 if report.get('ok', True) else 1


if __name__ == '__main__':
    sys.exit(main())
