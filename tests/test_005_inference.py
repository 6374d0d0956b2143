"""Inference stack: key grammar, databases, zoo, tiling, engine, hosted model."""

import os

import numpy as np
import pytest

from tests.model_fixtures import build_group_set, build_model_dir
from totalsegmentator2d_tpu.inference import (FileDataBase, HostedModel,
                                              URLDataBase, Zoo,
                                              decompose_model_key)
from totalsegmentator2d_tpu.inference.engine import (InferenceEngine,
                                                     _nonzero_bbox,
                                                     compute_new_shape)
from totalsegmentator2d_tpu.inference.tiling import (compute_steps_1d,
                                                     tile_positions)
from totalsegmentator2d_tpu.io.image import MedicalImage


class TestKeyGrammar:
    def test_decompose(self):
        assert decompose_model_key('ts2d-v2-ep4000b2_cardiac') == \
            ('ts2d-v2-ep4000b2', 'cardiac')
        assert decompose_model_key('ts2d-v2') == ('ts2d-v2', None)

    def test_component_prefix_match(self):
        from totalsegmentator2d_tpu.inference.database import match_model_name
        assert match_model_name('ts2d-v2', 'ts2d-v2-ep4000b2')
        assert match_model_name('ts2d', 'ts2d-v2-ep4000b2')
        assert not match_model_name('ts2d-v1', 'ts2d-v2-ep4000b2')
        assert not match_model_name('tsxr', 'ts2d-v2-ep4000b2')
        # surplus NON-EMPTY components reject (typo guard)...
        assert not match_model_name('ts2d-v2-ep4000b2-bogus',
                                    'ts2d-v2-ep4000b2')
        # ...but surplus EMPTY ones keep the empty-parts-match-anything
        # rule (a trailing dash from scripted key construction)
        assert match_model_name('ts2d-v2-ep4000b2-', 'ts2d-v2-ep4000b2')
        assert match_model_name('ts2d-v2-', 'ts2d-v2-ep4000b2')
        assert match_model_name(None, 'anything')
        # a pattern with MORE components than the model must not match: a
        # typoed/nonexistent longer key must raise 'no models resolved',
        # not silently load the shorter model (documented divergence from
        # the reference's _match_model_str)
        assert not match_model_name('ts2d-v2-ep4000b2-bogus',
                                    'ts2d-v2-ep4000b2')
        assert not match_model_name('ts2d-v2-x', 'ts2d-v2')


class TestDatabases:
    def test_url_database_queries(self):
        from totalsegmentator2d_tpu.utils.config import get_shared_urls
        db = URLDataBase(get_shared_urls())
        assert db.has(key='ts2d-v2-ep4000b2')
        assert db.latest(key='ts2d-v2-ep4000b2_cardiac') == 1
        ids = db.ids(key='ts2d-v2')
        assert 'ts2d-v2-ep4000b2_cardiac' in ids and len(ids) == 5
        assert db.groups(model='ts2d-v1-ep10000b2') == ['bones', 'soft']

    def test_file_database(self, tmp_path):
        build_group_set(str(tmp_path))
        db = FileDataBase(str(tmp_path), readonly=False)
        assert db.has(key='ts2d-v9-test_cardiac')
        assert db.ids(key='ts2d-v9-test') == ['ts2d-v9-test_cardiac',
                                              'ts2d-v9-test_ribs']
        info = db.get(key='ts2d-v9-test_cardiac')
        assert info['revision'] == 1
        assert os.path.exists(info['path'])

    def test_file_database_copy_and_clear(self, tmp_path):
        src = tmp_path / 'src'
        dst = tmp_path / 'dst'
        build_model_dir(str(src))
        db = FileDataBase(str(src), readonly=False)
        db.copy(str(dst), key='ts2d-v9-test_cardiac')
        db2 = FileDataBase(str(dst), readonly=False)
        assert db2.has(key='ts2d-v9-test_cardiac')
        db2.clear(key='ts2d-v9-test_cardiac')
        assert not db2.has(key='ts2d-v9-test_cardiac')
        assert not os.path.exists(dst / 'ts2d-v9-test_cardiac')

    def test_readonly_guard(self, tmp_path):
        db = FileDataBase(str(tmp_path))
        with pytest.raises(PermissionError):
            db.clear(key='x')


class TestZoo:
    def test_resolve_alias_chain(self, tmp_path, monkeypatch):
        build_group_set(str(tmp_path))
        monkeypatch.setattr(
            'totalsegmentator2d_tpu.inference.zoo.get_model_resolve_map',
            lambda: {'synth': 'ts2d-v9', 'ts2d-v9': 'ts2d-v9-test'})
        zoo = Zoo(remote=False, local=str(tmp_path))
        ids = zoo.resolve('synth')
        assert ids == ['ts2d-v9-test_cardiac', 'ts2d-v9-test_ribs']

    def test_unique_model_selection(self, tmp_path):
        build_group_set(str(tmp_path), model='ts2d-v9-aaa', groups=('cardiac',),
                        labels_per_group={'cardiac': ('heart',)})
        build_group_set(str(tmp_path), model='ts2d-v9-bbb',
                        groups=('cardiac', 'ribs'))
        zoo = Zoo(remote=False, local=str(tmp_path))
        # 'ts2d-v9' matches both base models; unique_model picks the first
        # sorted base model and returns ALL of its groups
        ids = zoo.resolve('ts2d-v9', unique_model=True)
        assert ids == ['ts2d-v9-aaa_cardiac']

    def test_access_local(self, tmp_path):
        build_model_dir(str(tmp_path))
        zoo = Zoo(remote=False, local=str(tmp_path))
        info = zoo.access('ts2d-v9-test_cardiac')
        assert info['revision'] == 1
        assert os.path.isdir(info['root'])

    def test_access_missing_raises(self, tmp_path):
        zoo = Zoo(remote=False, local=str(tmp_path))
        with pytest.raises(LookupError):
            zoo.access('ts2d-nonexistent_cardiac')

    def test_resolve_falls_back_to_local(self, tmp_path):
        # a locally-present model absent from the remote registry (e.g.
        # trained with ts2d-train) must resolve with a remote configured —
        # without requiring use_remote=False (documented divergence)
        build_model_dir(str(tmp_path), model='ts2d-v9-mine')
        zoo = Zoo(local=str(tmp_path))  # remote=None -> URL registry
        assert zoo.resolve('ts2d-v9-mine') == ['ts2d-v9-mine_cardiac']
        # registry-known keys still resolve via the remote
        assert zoo.resolve('ts2d-v2-ep4000b2_cardiac') == \
            ['ts2d-v2-ep4000b2_cardiac']


class TestTiling:
    def test_steps_cover_image(self):
        steps = compute_steps_1d(200, 64, 0.5)
        assert steps[0] == 0 and steps[-1] == 200 - 64
        assert all(b - a <= 32 for a, b in zip(steps, steps[1:]))

    def test_single_tile(self):
        assert compute_steps_1d(64, 64, 0.5) == [0]

    def test_grid(self):
        grid = tile_positions((128, 64), (64, 64), 0.5)
        assert grid.shape == (3, 2)
        assert (grid[:, 1] == 0).all()

    def test_compute_new_shape(self):
        assert compute_new_shape((100, 200), (1.0, 1.0), (2.0, 2.0)) == (50, 100)
        assert compute_new_shape((100,), (1.5,), (1.5,)) == (100,)


class TestEngine:
    @pytest.fixture(scope='class')
    def engine(self):
        import jax
        from tests.torch_mirror import TorchPlainConvUNet, make_spec as tspec
        from totalsegmentator2d_tpu.models.convert import state_dict_to_params
        from totalsegmentator2d_tpu.models.plans import parse_model_spec
        from tests.model_fixtures import make_plans, make_dataset_json
        import torch

        plans = make_plans(patch=(64, 64))
        ds = make_dataset_json(('heart', 'aorta', 'vein'))
        spec = parse_model_spec(plans, ds)
        torch.manual_seed(1)
        net = TorchPlainConvUNet(tspec(in_channels=2, out_channels=3))
        sd = {k: v.numpy() for k, v in net.state_dict().items()}
        params = state_dict_to_params(sd, spec.arch)
        return InferenceEngine(spec, [params], tile_step_size=0.5)

    def test_nonzero_bbox(self):
        arr = np.zeros((10, 12, 1), np.float32)
        arr[2:5, 3:9] = 1.0
        assert _nonzero_bbox(arr) == ((2, 5), (3, 9))
        assert _nonzero_bbox(np.zeros((4, 4, 1))) == ((0, 4), (0, 4))

    def test_predict_shapes_multilabel(self, engine, rng):
        arr = rng.standard_normal((80, 70, 2)).astype(np.float32) + 2.0
        seg = engine.predict_array(arr, spacing_yx=(1.5, 1.5))
        assert seg.shape == (80, 70, 3)
        assert seg.dtype == np.uint8
        assert set(np.unique(seg)) <= {0, 1}

    def test_predict_with_resampling(self, engine, rng):
        # spacing 3.0 -> resampled to 1.5 internally, output back at input size
        arr = rng.standard_normal((50, 40, 2)).astype(np.float32) + 2.0
        seg = engine.predict_array(arr, spacing_yx=(3.0, 3.0))
        assert seg.shape == (50, 40, 3)

    def test_program_cache(self, engine, rng):
        arr = rng.standard_normal((80, 70, 2)).astype(np.float32) + 2.0
        engine.predict_array(arr, spacing_yx=(1.5, 1.5))
        n = len(engine._cache)
        engine.predict_array(arr, spacing_yx=(1.5, 1.5))
        assert len(engine._cache) == n

    def test_mirror_tta_consistency(self, rng):
        """With mirror TTA over both axes the prediction of a flipped input
        must be the flip of the prediction."""
        import torch
        from tests.torch_mirror import TorchPlainConvUNet, make_spec as tspec
        from totalsegmentator2d_tpu.models.convert import state_dict_to_params
        from totalsegmentator2d_tpu.models.plans import parse_model_spec
        from tests.model_fixtures import make_plans, make_dataset_json

        plans = make_plans(patch=(32, 32))
        ds = make_dataset_json(('a',), channels=('max',))
        spec = parse_model_spec(plans, ds)
        torch.manual_seed(2)
        net = TorchPlainConvUNet(tspec(in_channels=1, out_channels=1))
        params = state_dict_to_params(
            {k: v.numpy() for k, v in net.state_dict().items()}, spec.arch)
        eng = InferenceEngine(spec, [params])
        arr = np.abs(rng.standard_normal((32, 32, 1))).astype(np.float32) + 1.0
        _, logits, _ = eng.predict_array(arr, (1.5, 1.5), return_logits=True)
        _, logits_f, _ = eng.predict_array(arr[::-1, ::-1], (1.5, 1.5),
                                           return_logits=True)
        np.testing.assert_allclose(logits, logits_f[::-1, ::-1], rtol=1e-3,
                                   atol=1e-4)

    def test_wrong_channels_rejected(self, engine, rng):
        with pytest.raises(ValueError):
            engine.predict_array(rng.standard_normal((64, 64, 1)), (1.5, 1.5))


class TestHostedModel:
    @pytest.fixture(scope='class')
    def model(self, tmp_path_factory):
        root = str(tmp_path_factory.mktemp('models'))
        build_model_dir(root, patch=(64, 64))
        zoo = Zoo(remote=False, local=root)
        m = zoo.load('ts2d-v9-test_cardiac',
                     param={'nnu.result.colors': {'heart': '#ff0000',
                                                  'aorta': '#00ff00',
                                                  'pulmonary-artery': '#0000ff'}})
        return m

    def test_identity(self, model):
        assert model.id == 'ts2d-v9-test_cardiac'
        assert model.group == 'cardiac'
        assert model.multilabel
        assert model.channels == {0: 'max', 1: 'mean'}
        assert model.labels == {1: 'heart', 2: 'aorta', 3: 'pulmonary-artery'}
        assert model.folds == [0]

    def test_async_startup(self, model):
        model.start(wait=False)
        model.await_startup()
        assert model.started

    def test_apply(self, model, rng):
        arr = (rng.standard_normal((72, 60, 2)) + 3.0).astype(np.float32)
        img = MedicalImage(array=arr, spacing=(1.5, 1.5), is_vector=True)
        seg = model.apply(img)
        assert seg.ncomponents == 3
        assert seg.size == img.size
        assert seg.meta.get('Segment0_Name') == 'heart'
        assert seg.meta.get('Segment2_Name') == 'pulmonary-artery'
        assert seg.meta.get('Segment0_Color') == '1 0 0'

    def test_apply_wrong_channels(self, model, rng):
        img = MedicalImage(array=rng.standard_normal((64, 64)).astype(np.float32),
                           spacing=(1.5, 1.5))
        with pytest.raises(ValueError, match='channel'):
            model.apply(img)

    def test_mirror_axes_from_checkpoint(self, model):
        assert model.spec.allowed_mirroring_axes == (0, 1)

    def test_single_startup_under_races(self, tmp_path, monkeypatch):
        # start(wait=False) then apply()/start(wait=True) before the async
        # boot completes must join the pending startup, not run a SECOND
        # weight load + compile; stop() during a pending startup must not
        # resurrect the model
        import threading
        root = str(tmp_path)
        build_model_dir(root, patch=(64, 64), model='ts2d-v9-race')
        zoo = Zoo(remote=False, local=root)
        m = zoo.load('ts2d-v9-race_cardiac')
        boots, gate = [], threading.Event()
        real = type(m)._load_engine

        def slow_boot(self):
            boots.append(1)
            gate.wait(10.0)
            return real(self)

        monkeypatch.setattr(type(m), '_load_engine', slow_boot)
        m.start(wait=False)
        t = threading.Thread(target=lambda: m.start(wait=True))
        t.start()
        gate.set()
        t.join(30.0)
        m.await_startup()
        assert m.started and len(boots) == 1
        # stop() while a fresh startup is pending: engine must stay down
        m.stop()
        gate.clear()
        m.start(wait=False)
        gate.set()
        m.stop()
        assert not m.started


class TestNonMultilabel:
    def test_softmax_labelmap_model(self, tmp_path, rng):
        """Classic (non-multilabel) nnU-Net models produce labelmaps through
        the same hosted path; TS2D warns but proceeds (reference
        tool.py:49-50)."""
        from tests.model_fixtures import build_model_dir
        root = str(tmp_path)
        build_model_dir(root, model='ts2d-v9-cls', group='organs',
                        labels=('liver', 'spleen'), multilabel=False,
                        patch=(64, 64))
        zoo = Zoo(remote=False, local=root)
        model = zoo.load('ts2d-v9-cls_organs')
        assert not model.multilabel
        assert model.spec.arch.out_channels == 3  # background + 2
        img = MedicalImage(
            array=(rng.standard_normal((70, 60, 2)) + 2).astype(np.float32),
            spacing=(1.5, 1.5), is_vector=True)
        seg = model.apply(img)
        assert seg.ncomponents == 1
        assert set(np.unique(seg.array)) <= {0, 1, 2}
        assert seg.meta.get('Segment0_LabelValue') is not None
