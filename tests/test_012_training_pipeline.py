"""Training data pipeline: fingerprint, planner, preprocessing, sampler —
and the full loop: plan -> train -> export -> predict."""

import numpy as np
import pytest

from totalsegmentator2d_tpu.io import MedicalImage
from totalsegmentator2d_tpu.models.plans import parse_model_spec
from totalsegmentator2d_tpu.training import (PatchSampler, TrainConfig,
                                             Trainer, compute_fingerprint,
                                             plan_experiment, preprocess_case)


# full tier: heavy integration on a 1-core CPU box (run with pytest -m '')
pytestmark = pytest.mark.slow


def _case(rng, h=90, w=80, spacing=(1.5, 1.2), n_labels=2):
    img = MedicalImage(
        array=(rng.standard_normal((h, w, 2)) * 200 + 50).astype(np.float32),
        spacing=spacing, is_vector=True)
    tgt = np.zeros((h, w, n_labels), np.uint8)
    tgt[h // 4:h // 2, w // 4:w // 2, 0] = 1
    tgt[h // 2:h - 10, w // 2:w - 10, 1] = 1
    seg = MedicalImage(array=tgt, spacing=spacing, is_vector=True)
    return img, seg


class TestPlanner:
    def test_fingerprint_and_plan(self, rng):
        cases = [_case(rng, h=80 + 8 * i, w=70 + 6 * i) for i in range(4)]
        fp = compute_fingerprint([c[0] for c in cases], [c[1] for c in cases])
        assert fp.n_channels == 2
        assert fp.spacings.shape == (4, 2)
        assert fp.intensity_std[0] > 0

        plans, ds = plan_experiment(
            fp, channel_names={0: 'max', 1: 'mean'},
            labels={'heart': 1, 'aorta': 2}, modality='CT')
        spec = parse_model_spec(plans, ds)
        assert spec.multilabel
        assert spec.arch.in_channels == 2
        assert spec.arch.out_channels == 2
        # patch is a power of two >= 64, covering the median shape direction
        assert all(p >= 64 and (p & (p - 1)) == 0
                   for p in spec.preprocess.patch_size)
        # spacing is array-order (y, x): ITK (x=1.5, y=1.2) -> (1.2, 1.5)
        assert spec.preprocess.spacing == pytest.approx((1.2, 1.5))
        # CT normalization carries the fingerprint statistics
        assert 'ct' in spec.preprocess.normalization_schemes[0].lower()
        assert spec.preprocess.intensity_properties[0]['std'] > 0

    def test_preprocess_case_resamples(self, rng):
        img, seg = _case(rng, spacing=(3.0, 3.0))
        fp = compute_fingerprint([img], [seg])
        plans, ds = plan_experiment(fp, {0: 'max', 1: 'mean'},
                                    {'a': 1, 'b': 2})
        spec = parse_model_spec(plans, ds)
        data, tgt = preprocess_case(img, seg, spec)
        assert data.shape[:2] == tgt.shape[:2]
        assert data.dtype == np.float32 and tgt.dtype == np.uint8
        assert set(np.unique(tgt)) <= {0, 1}


class TestPatchSampler:
    def test_batch_shapes_and_oversampling(self, rng):
        img, seg = _case(rng, h=200, w=180)
        data = img.array
        sampler = PatchSampler([(data, seg.array)], patch_size=(64, 64),
                               oversample_foreground=1.0, seed=0)
        batch = sampler.sample_batch(6)
        assert batch['image'].shape == (6, 64, 64, 2)
        assert batch['target'].shape == (6, 64, 64, 2)
        # with 100% oversampling every patch must contain foreground
        assert all(batch['target'][i].any() for i in range(6))

    def test_small_case_padding(self, rng):
        img, seg = _case(rng, h=40, w=30)
        sampler = PatchSampler([(img.array, seg.array)], patch_size=(64, 64))
        batch = sampler.sample_batch(2)
        assert batch['image'].shape == (2, 64, 64, 2)


class TestPackedTargetWire:
    """The training-batch wire discipline: one-hot targets ship as packed
    bit-planes (data.pack_target_np, 8x fewer bytes) and unpack on device
    bit-identically (train.unpack_target)."""

    @pytest.mark.parametrize('L', [1, 7, 8, 24, 33])
    def test_pack_unpack_roundtrip(self, rng, L):
        import jax.numpy as jnp
        from totalsegmentator2d_tpu.training.data import pack_target_np
        from totalsegmentator2d_tpu.training.train import unpack_target

        tgt = (rng.random((3, 20, 18, L)) > 0.7).astype(np.uint8)
        packed = pack_target_np(tgt)
        assert packed.dtype == np.uint8
        assert packed.shape == (3, 20, 18, -(-L // 8))
        back = np.asarray(unpack_target(jnp.asarray(packed), L))
        np.testing.assert_array_equal(back, tgt)

    def test_sampler_pack_flag(self, rng):
        img, seg = _case(rng)
        sampler = PatchSampler([(img.array, seg.array)], patch_size=(32, 32),
                               seed=0)
        batch = sampler.sample_batch(4, pack_targets=True)
        assert 'target' not in batch and 'target_packed' in batch
        assert batch['target_packed'].shape == (4, 32, 32, 1)

    @pytest.mark.parametrize('augment', [False, True])
    def test_trainer_step_packed_equals_unpacked(self, rng, augment):
        """Same seed + same batch through two Trainers, one fed packed:
        bit-identical losses (the wire is lossless and the unpack feeds
        the very same programs)."""
        import jax
        from totalsegmentator2d_tpu.models.plans import ArchSpec
        from totalsegmentator2d_tpu.training.data import pack_target_np

        spec = ArchSpec(n_stages=3, features_per_stage=(8, 16, 32),
                        kernel_sizes=((3, 3),) * 3,
                        strides=((1, 1), (2, 2), (2, 2)),
                        n_conv_per_stage=(1, 1, 1),
                        n_conv_per_stage_decoder=(1, 1),
                        in_channels=2, out_channels=9)
        cfg = TrainConfig(lr=1e-2, total_steps=4, multilabel=True,
                          augment=augment)
        batch = {
            'image': rng.standard_normal((8, 32, 32, 2)).astype(np.float32),
            'target': (rng.random((8, 32, 32, 9)) > 0.85).astype(np.uint8)}
        packed = {'image': batch['image'],
                  'target_packed': pack_target_np(batch['target'])}
        l_plain = float(np.asarray(Trainer(spec, cfg, seed=3).step(batch)))
        l_packed = float(np.asarray(Trainer(spec, cfg, seed=3).step(packed)))
        assert l_plain == l_packed


class TestEndToEndTrainingLoop:
    def test_plan_train_export_predict(self, rng, tmp_path):
        """The full circle: fingerprint -> plans -> trainer -> export ->
        zoo -> predict."""
        import jax
        from totalsegmentator2d_tpu.inference import Zoo
        from totalsegmentator2d_tpu.models.export import export_model_dir

        cases = [_case(rng, h=96, w=96, spacing=(1.5, 1.5)) for _ in range(2)]
        fp = compute_fingerprint([c[0] for c in cases], [c[1] for c in cases])
        plans, ds = plan_experiment(fp, {0: 'max', 1: 'mean'},
                                    {'heart': 1, 'aorta': 2}, modality='CT',
                                    max_patch=64)
        spec = parse_model_spec(plans, ds)
        pre = [preprocess_case(img, seg, spec) for img, seg in cases]
        sampler = PatchSampler(pre, spec.preprocess.patch_size, seed=0)

        cfg = TrainConfig(lr=1e-2, total_steps=8, multilabel=True)
        tr = Trainer(spec.arch, cfg, seed=0)
        fixed = sampler.sample_batch(2)  # fixed batch: deterministic descent
        losses = [float(tr.step(fixed)) for _ in range(8)]
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]

        mid = export_model_dir(str(tmp_path), 'ts2d-v9-loop', 'cardiac',
                               spec, [jax.device_get(tr.params)], epoch=8)
        model = Zoo(remote=False, local=str(tmp_path)).load(mid)
        seg = model.apply(cases[0][0])
        assert seg.ncomponents == 2
        assert seg.size == cases[0][0].size


class TestMixedPrecisionTraining:
    def test_bf16_compute_trains(self, rng):
        """compute_dtype='bfloat16' (the torch-AMP analogue): params and
        loss stay fp32, the loss is finite and descends, and the result
        tracks the fp32 run on the same fixed batch."""
        import jax
        from totalsegmentator2d_tpu.training import TrainConfig, Trainer
        from __graft_entry__ import _flagship_spec

        spec = _flagship_spec(out_channels=3, in_channels=2, n_stages=3)
        batch = {
            'image': (rng.standard_normal((2, 32, 32, 2))).astype(np.float32),
            'target': (rng.random((2, 32, 32, 3)) > 0.7).astype(np.uint8),
        }
        losses = {}
        for name, cdt in (('fp32', None), ('bf16', 'bfloat16')):
            cfg = TrainConfig(lr=1e-2, total_steps=6, multilabel=True,
                              deep_supervision=True, compute_dtype=cdt)
            tr = Trainer(spec, cfg, seed=0)
            ls = [float(tr.step(batch)) for _ in range(6)]
            assert np.isfinite(ls).all()
            assert ls[-1] < ls[0]
            # params must remain fp32 regardless of compute dtype
            leaf = jax.tree_util.tree_leaves(tr.params)[0]
            assert leaf.dtype == np.float32
            losses[name] = ls
        assert abs(losses['bf16'][0] - losses['fp32'][0]) \
            < 0.05 * abs(losses['fp32'][0]) + 0.05

    def test_bf16_with_remat(self, rng):
        from totalsegmentator2d_tpu.training import TrainConfig, Trainer
        from __graft_entry__ import _flagship_spec
        spec = _flagship_spec(out_channels=2, in_channels=2, n_stages=3)
        cfg = TrainConfig(lr=1e-2, total_steps=3, multilabel=True,
                          deep_supervision=True, compute_dtype='bf16',
                          remat=True)
        tr = Trainer(spec, cfg, seed=0)
        batch = {
            'image': rng.standard_normal((2, 32, 32, 2)).astype(np.float32),
            'target': (rng.random((2, 32, 32, 2)) > 0.7).astype(np.uint8),
        }
        loss = float(tr.step(batch))
        assert np.isfinite(loss)

    def test_invalid_compute_dtype_rejected(self):
        from totalsegmentator2d_tpu.training import TrainConfig
        import pytest
        with pytest.raises(ValueError, match='bfloat16'):
            TrainConfig(compute_dtype='float16')


class TestStatsForm:
    """TrainConfig.stats: training defaults to one-pass InstanceNorm
    statistics (no bitwise-parity contract on the training path —
    unet._one_pass_stats); '2pass' restores torch-identical statistics."""

    def test_default_is_1pass_and_validated(self):
        from totalsegmentator2d_tpu.training import TrainConfig
        import pytest
        assert TrainConfig().stats == '1pass'
        with pytest.raises(ValueError, match='1pass'):
            TrainConfig(stats='onepass')

    def test_both_forms_train_and_agree(self, rng, monkeypatch):
        """Both statistics forms descend on the same fixed batch and track
        each other closely (the forms differ only in fp32 rounding of the
        variance). The env override must not leak in."""
        from totalsegmentator2d_tpu.training import TrainConfig, Trainer
        from __graft_entry__ import _flagship_spec

        monkeypatch.delenv('TS2D_STATS', raising=False)
        spec = _flagship_spec(out_channels=2, in_channels=2, n_stages=3)
        batch = {
            'image': rng.standard_normal((2, 32, 32, 2)).astype(np.float32),
            'target': (rng.random((2, 32, 32, 2)) > 0.7).astype(np.uint8),
        }
        losses = {}
        for form in ('1pass', '2pass'):
            cfg = TrainConfig(lr=1e-2, total_steps=4, multilabel=True,
                              deep_supervision=True, stats=form)
            tr = Trainer(spec, cfg, seed=0)
            ls = [float(tr.step(batch)) for _ in range(4)]
            assert np.isfinite(ls).all()
            assert ls[-1] < ls[0]
            losses[form] = ls
        np.testing.assert_allclose(losses['1pass'], losses['2pass'],
                                   rtol=1e-4, atol=1e-5)
