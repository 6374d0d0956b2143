"""Full-chain offline parity: the composed InferenceEngine/EnsembleEngine
path vs the independent numpy/scipy/torch oracle (tests/reference_chain.py)
that reimplements the reference's nnU-Net predict chain from its published
semantics (reference prediction_worker.py:194-221).

Tolerances: the oracle shares NO code with the engines — logits pass
through two independent conv stacks (torch vs XLA, different accumulation
orders: ~1e-4 drift over 4 U-Net stages) and two independent resamplers
(scipy map_coordinates vs weight-matrix matmuls; identical except float
associativity), so float logits agree to ~1e-3 and masks may flip only
where |sigmoid(logit) - 0.5| is within that drift — bounded at 0.1% of
pixels on synthetic weights (real checkpoints are far more saturated)."""

import numpy as np
import pytest

from tests import reference_chain as RC
from totalsegmentator2d_tpu.inference import EnsembleEngine, InferenceEngine

CONFIGS = ('multilabel', 'softmax', 'masked-norm', 'resampling',
           'multifold', 'ct-norm')


@pytest.fixture
def rng():
    return np.random.default_rng(21)


def _compare(name, arr, spacing):
    spec, nets, fold_params = RC.build_config(name)
    eng = InferenceEngine(spec, fold_params)
    seg, logits, bbox = eng.predict_array(arr, spacing, return_logits=True)
    ref_seg, ref_logits, ref_bbox = RC.predict(arr, spacing, spec, nets)
    assert bbox == ref_bbox
    logit_err = float(np.abs(logits - ref_logits).max())
    agree = float((seg == ref_seg).mean())
    return logit_err, agree


class TestFullChain:
    @pytest.mark.parametrize('name', CONFIGS)
    def test_engine_matches_reference_chain(self, rng, name):
        arr, spacing = RC.config_input(name, rng)
        logit_err, agree = _compare(name, arr, spacing)
        assert logit_err < 5e-3, f'{name}: max logit err {logit_err}'
        assert agree >= 0.999, f'{name}: mask agreement {agree}'

    def test_multi_tile_grid(self, rng):
        """An input large enough for a 3x3+ tile grid exercises the
        Gaussian overlap-add across many overlapping tiles."""
        arr = np.zeros((150, 140, 2), np.float32)
        arr[5:-5, 5:-5] = rng.standard_normal((140, 130, 2)) + 2
        logit_err, agree = _compare('multilabel', arr, (1.5, 1.5))
        assert logit_err < 5e-3
        assert agree >= 0.999

    def test_no_mirroring(self, rng):
        spec, nets, fold_params = RC.build_config('multilabel')
        arr, spacing = RC.config_input('multilabel', rng)
        eng = InferenceEngine(spec, fold_params, use_mirroring=False)
        seg, logits, _ = eng.predict_array(arr, spacing, return_logits=True)
        _, ref_logits, _ = RC.predict(arr, spacing, spec, nets,
                                      use_mirroring=False)
        assert float(np.abs(logits - ref_logits).max()) < 5e-3

    def test_ensemble_merge_matches_per_group_oracle(self, rng):
        """The fused EnsembleEngine's merged multilabel output equals the
        channel-concat of per-group oracle runs (reference merge semantics,
        tool.py:114-122 + combine_segmentations)."""
        import torch
        from tests.model_fixtures import make_dataset_json, make_plans
        from tests.torch_mirror import TorchPlainConvUNet, make_spec
        from totalsegmentator2d_tpu.models.convert import state_dict_to_params
        from totalsegmentator2d_tpu.models.plans import parse_model_spec

        label_sets = [('heart', 'aorta'), ('rib-1', 'rib-2', 'rib-3')]
        plans = make_plans(patch=(64, 64))
        specs, nets, params = [], [], []
        for i, labels in enumerate(label_sets):
            spec = parse_model_spec(plans, make_dataset_json(labels))
            torch.manual_seed(50 + i)
            net = TorchPlainConvUNet(make_spec(in_channels=2,
                                               out_channels=len(labels)))
            net.eval()
            specs.append(spec)
            nets.append(net)
            params.append([state_dict_to_params(
                {k: v.numpy() for k, v in net.state_dict().items()},
                spec.arch)])

        arr, spacing = RC.config_input('multilabel', rng)
        ens = EnsembleEngine(specs, params)
        merged = ens.predict_array(arr, spacing)
        parts = [RC.predict(arr, spacing, s, [n])[0]
                 for s, n in zip(specs, nets)]
        ref = np.concatenate(parts, axis=-1)
        assert merged.shape == ref.shape
        agree = float((merged == ref).mean())
        assert agree >= 0.999, f'ensemble merge agreement {agree}'


class TestFullChainOnAssets:
    pytestmark = pytest.mark.slow
    """The same oracle over the four bundled reference assets — the real
    data shapes/geometry (2-ch projections, true-2D rotated geometry,
    3D CT needing projection, native X-ray)."""

    def _asset_2d(self, name):
        from tests.conftest import asset_path
        from totalsegmentator2d_tpu.io import read_image
        from totalsegmentator2d_tpu.ops.geometry import reorient

        img = read_image(asset_path(f'{name}.nrrd'))
        sp = img.spacing  # ITK order (x, y, z)
        if name == 'sample_s0521':
            # 3D CT: independent numpy coronal MIP + AIP projection
            img = reorient(img, 'RAI')
            vol = np.asarray(img.array, np.float32)
            arr = np.stack([vol.max(axis=1), vol.mean(axis=1)], axis=-1)
            spacing = (img.spacing[2], img.spacing[0])  # (z, x) array order
        else:
            arr = np.asarray(img.array, np.float32)
            if arr.ndim == 4:
                # size-1 projected coronal axis (sample_s0332): keep (z, x)
                arr = arr.reshape([s for s in arr.shape[:-1] if s != 1]
                                  + [arr.shape[-1]])
                spacing = (sp[2], sp[0])
            else:
                if arr.ndim == 2:
                    arr = arr[..., None]
                spacing = (sp[1], sp[0])  # (y, x) array order
        return np.ascontiguousarray(arr.astype(np.float32)), spacing

    @pytest.mark.parametrize('name', ['sample_s0332', 'sample_s0616',
                                      'sample_chexpert', 'sample_s0521'])
    def test_asset_full_chain(self, name):
        arr, spacing = self._asset_2d(name)
        channels = ('max', 'mean') if arr.shape[-1] == 2 else ('xray',)
        spec, nets, fold_params = RC.build_config('multilabel',
                                                  channels=channels)
        eng = InferenceEngine(spec, fold_params)
        seg, logits, bbox = eng.predict_array(arr, spacing,
                                              return_logits=True)
        ref_seg, ref_logits, ref_bbox = RC.predict(arr, spacing, spec, nets)
        assert bbox == ref_bbox
        logit_err = float(np.abs(logits - ref_logits).max())
        agree = float((seg == ref_seg).mean())
        assert logit_err < 1e-2, f'{name}: logit err {logit_err}'
        assert agree >= 0.999, f'{name}: agreement {agree}'
