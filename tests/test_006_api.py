"""End-to-end API + CLI tests on the synthetic model database, mirroring the
reference test stages (predict on 3 asset types -> result matrix -> CLI)."""

import os

import numpy as np
import pytest

from tests.conftest import asset_path
from tests.model_fixtures import build_group_set, build_model_dir
from totalsegmentator2d_tpu.api import TS2D
from totalsegmentator2d_tpu.cli import _enumerate_cases, ts2d_run
from totalsegmentator2d_tpu.io import MedicalImage, read_image
from totalsegmentator2d_tpu.ops.annotations import get_annotation_labels


@pytest.fixture(scope='module')
def model_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('zoo'))
    # CT-style 2-channel (max+mean projection) models, two groups
    build_group_set(root, model='ts2d-v9-test', groups=('cardiac', 'ribs'))
    # native-2D single-channel X-ray model
    build_model_dir(root, model='tsxr-v9-test', group='ribs',
                    labels=('rib-left-1', 'rib-right-1'), channels=('xr',),
                    task_id=300)
    return root


@pytest.fixture(scope='module')
def tool(model_root):
    with TS2D(key='ts2d-v9-test', use_remote=False, local=model_root) as t:
        yield t


class TestPredict:
    def test_predict_3d_ct(self, tool):
        """Real 3D CT: reorient -> project max/mean -> 2-group ensemble."""
        res = tool.predict(asset_path('sample_s0521.nrrd'))
        seg = res.get_segmentation()
        assert isinstance(seg, MedicalImage)
        # merged multilabel: 2 cardiac + 3 ribs labels
        assert seg.ncomponents == 5
        names = list(get_annotation_labels(seg))
        assert 'heart' in names and 'rib-left-1' in names
        # 3D geometry restored with size-1 coronal axis
        assert seg.dim == 3
        assert seg.size[1] == 1
        proj = res.get_projection()
        assert set(proj) == {'max', 'mean'}

    @pytest.mark.slow
    def test_predict_preprojected_2ch(self, tool):
        """Pre-projected 2-channel image (size-1 axis): skips projection."""
        res = tool.predict(asset_path('sample_s0332.nrrd'))
        seg = res.get_segmentation()
        assert seg.ncomponents == 5
        assert set(res.get_projection()) == {'ch0', 'ch1'}

    @pytest.mark.slow  # the 337x644 true-2D asset forces the suite's
    # largest program compile (~11 s, the single slowest fast-tier test);
    # the 2D-input API path stays fast-covered by test_predict_xray and
    # the rotated-direction geometry by test_001/test_002
    def test_predict_true_2d(self, tool):
        res = tool.predict(asset_path('sample_s0616.nrrd'))
        seg = res.get_segmentation()
        assert seg.dim == 2
        assert seg.size == (337, 644)

    def test_predict_collapse(self, tool):
        res = tool.predict(asset_path('sample_s0521.nrrd'), collapse=True)
        seg = res.get_segmentation()
        assert seg.dim == 2

    def test_predict_no_merge(self, tool):
        res = tool.predict(asset_path('sample_s0332.nrrd'), merge=False)
        assert res.get_segmentation() is None
        assert len(res.models) == 2
        per_model = res.get_segmentation(res.models[0])
        assert per_model.ncomponents == 2

    def test_predict_xray(self, model_root):
        """Native 2D X-ray through a single-channel tsxr-style model."""
        with TS2D(key='tsxr-v9-test', use_remote=False, local=model_root) as t:
            res = t.predict(asset_path('sample_chexpert.nrrd'))
            seg = res.get_segmentation()
            assert isinstance(seg, MedicalImage)
            assert seg.dim == 2
            assert seg.ncomponents == 2
            assert set(res.get_projection()) == {'ch0'}

    def test_unknown_key_raises(self, model_root):
        with pytest.raises(RuntimeError):
            TS2D(key='ts2d-nope', use_remote=False, local=model_root)


class TestResultSave:
    def test_full_export_matrix(self, tool, tmp_path):
        """targets=all, models=all, content=all (reference test_022)."""
        res = tool.predict(asset_path('sample_s0332.nrrd'))
        res.save(str(tmp_path), name='test', models='all', targets='all',
                 content='all')
        expected = [
            'test.nrrd', 'test.seg.nrrd', 'test.seg.png',
            'test-cardiac.nrrd', 'test-cardiac.seg.nrrd',
            'test-ribs.seg.nrrd', 'test-ribs.seg.png',
            'test_ch0.nrrd', 'test_ch0.png', 'test_ch1.nrrd', 'test_ch1.png',
        ]
        for fn in expected:
            assert (tmp_path / fn).exists(), f'missing {fn}'
        # input visuals are exported per channel for the 2-channel input
        assert (tmp_path / 'test-ch0.png').exists()

    def test_final_only(self, tool, tmp_path):
        res = tool.predict(asset_path('sample_s0332.nrrd'))
        res.save(str(tmp_path), name='x', models='final',
                 targets=['segmentation'], content='file')
        assert (tmp_path / 'x.seg.nrrd').exists()
        assert not (tmp_path / 'x-cardiac.seg.nrrd').exists()
        assert not (tmp_path / 'x.png').exists()

    def test_saved_segmentation_reloads_with_labels(self, tool, tmp_path):
        res = tool.predict(asset_path('sample_s0332.nrrd'))
        res.save(str(tmp_path), name='y', targets=['segmentation'],
                 content='file')
        back = read_image(str(tmp_path / 'y.seg.nrrd'))
        labels = get_annotation_labels(back)
        assert set(labels) == {'heart', 'aorta',
                               'rib-left-1', 'rib-right-1', 'rib-left-2'}
        assert all(v['color'] is not None for v in labels.values())

    def test_png_rejected_as_file_ext(self, tool):
        res = tool.predict(asset_path('sample_s0332.nrrd'))
        with pytest.raises(AssertionError):
            res.save('/tmp', ext='png')


class TestCLI:
    pytestmark = pytest.mark.slow
    def test_enumerate_cases_single(self):
        cases = list(_enumerate_cases(asset_path('sample_s0521.nrrd')))
        assert cases == [('sample_s0521', asset_path('sample_s0521.nrrd'))]

    def test_enumerate_cases_directory_filters(self, tmp_path):
        import shutil
        shutil.copy(asset_path('sample_s0521.nrrd'), tmp_path / 'a.nrrd')
        (tmp_path / 'notes.txt').write_text('skip me')
        cases = list(_enumerate_cases(str(tmp_path)))
        assert [n for n, _ in cases] == ['a']

    def test_enumerate_disambiguates_same_stem(self, tmp_path, capsys):
        # scan.nrrd + scan.nii would both save as 'scan.*' in dest, the
        # second silently replacing the first patient's segmentation
        import shutil
        from totalsegmentator2d_tpu.io import read_image, write_image
        shutil.copy(asset_path('sample_s0521.nrrd'), tmp_path / 'scan.nrrd')
        write_image(read_image(asset_path('sample_s0521.nrrd')),
                    str(tmp_path / 'scan.nii'))
        names = [n for n, _ in _enumerate_cases(str(tmp_path))]
        assert sorted(names) == ['scan', 'scan-2']
        assert 'duplicate case name' in capsys.readouterr().err

    def test_enumerate_rejects_bad_single(self, tmp_path):
        bad = tmp_path / 'x.txt'
        bad.write_text('nope')
        with pytest.raises(ValueError):
            list(_enumerate_cases(str(bad)))

    def test_run_end_to_end(self, model_root, tmp_path, capsys):
        out = tmp_path / 'out'
        ts2d_run(src=asset_path('sample_s0332.nrrd'), dest=str(out),
                 model='ts2d-v9-test', use_remote=False, fetch_remote=False,
                 visualize=True, save_all=True, silent=False,
                 local=model_root)
        for fn in ['sample_s0332.seg.nrrd', 'sample_s0332.seg.png',
                   'sample_s0332-cardiac.seg.nrrd', 'sample_s0332-ribs.seg.nrrd',
                   'sample_s0332_ch0.nrrd', 'sample_s0332_ch0.png']:
            assert (out / fn).exists(), f'missing {fn}'
        captured = capsys.readouterr()
        assert 'NOT validated for clinical use' in captured.out

    def test_run_directory_input(self, model_root, tmp_path):
        import shutil
        src = tmp_path / 'src'
        src.mkdir()
        shutil.copy(asset_path('sample_s0332.nrrd'), src / 'case1.nrrd')
        shutil.copy(asset_path('sample_s0616.nrrd'), src / 'case2.nrrd')
        out = tmp_path / 'out'
        ts2d_run(src=str(src), dest=str(out), model='ts2d-v9-test',
                 use_remote=False, fetch_remote=False, visualize=False,
                 silent=True, local=model_root)
        assert (out / 'case1.seg.nrrd').exists()
        assert (out / 'case2.seg.nrrd').exists()


class TestCLIParsing:
    pytestmark = pytest.mark.slow
    def test_entry_point_flags(self, model_root, tmp_path, monkeypatch):
        import sys
        from totalsegmentator2d_tpu.cli import ts2d_entry_point
        out = tmp_path / 'out'
        monkeypatch.setattr(sys, 'argv', [
            'ts2d', '-i', asset_path('sample_s0332.nrrd'), '-o', str(out),
            '--model', 'ts2d-v9-test', '--no-remote', '--no-fetch',
            '--silent', '--local', model_root])
        ts2d_entry_point()
        assert (out / 'sample_s0332.seg.nrrd').exists()

    def test_trace_flag_writes_profile(self, model_root, tmp_path):
        from totalsegmentator2d_tpu.cli import ts2d_run
        trace_dir = tmp_path / 'trace'
        ts2d_run(src=asset_path('sample_s0332.nrrd'), dest=str(tmp_path / 'o'),
                 model='ts2d-v9-test', use_remote=False, fetch_remote=False,
                 visualize=False, silent=True, local=model_root,
                 trace=str(trace_dir))
        assert any(trace_dir.rglob('*'))


class TestStatistics:
    def test_get_statistics(self, tool):
        res = tool.predict(asset_path('sample_s0332.nrrd'))
        stats = res.get_statistics()
        assert len(stats) == 5
        seg = res.get_segmentation()
        voxel_mm = float(np.prod(seg.spacing))  # 3D seg: 1.5 * 403.5 * 1.5
        for name, info in stats.items():
            assert set(info) >= {'value', 'count', 'mm', 'color', 'exists'}
            assert info['mm'] == pytest.approx(info['count'] * voxel_mm)
        per_model = res.get_statistics(res.models[0])
        assert len(per_model) == 2


class TestFusedUnfusedConsistency:
    pytestmark = pytest.mark.slow
    def test_paths_agree(self, model_root):
        """The fused ensemble path and the per-model fallback path must
        produce identical masks, metadata, and projections."""
        with TS2D(key='ts2d-v9-test', use_remote=False, local=model_root) as t:
            assert t._fused is not None
            res_f = t.predict(asset_path('sample_s0521.nrrd'))
            # force the unfused (reference-shaped) path
            t._fused = None
            for m in t.models.values():
                m.start(wait=False)
            for m in t.models.values():
                m.await_startup()
            res_u = t.predict(asset_path('sample_s0521.nrrd'))

        seg_f = res_f.get_segmentation()
        seg_u = res_u.get_segmentation()
        assert seg_f.size == seg_u.size
        assert seg_f.ncomponents == seg_u.ncomponents
        agree = (seg_f.array == seg_u.array).mean()
        assert agree > 0.9999, f'mask agreement {agree}'
        from totalsegmentator2d_tpu.ops.annotations import get_annotation_labels
        lf = get_annotation_labels(seg_f)
        lu = get_annotation_labels(seg_u)
        assert set(lf) == set(lu)
        assert all(lf[n]['value'] == lu[n]['value'] for n in lf)
        # projections match too
        pf = res_f.get_projection('max')
        pu = res_u.get_projection('max')
        np.testing.assert_allclose(pf.array, pu.array, rtol=1e-5, atol=1e-5)
        assert pf.spacing == pu.spacing
        # per-model segs agree
        for mid in res_f.models:
            a = res_f.get_segmentation(mid)
            b = res_u.get_segmentation(mid)
            assert (a.array == b.array).mean() > 0.9999


class TestBatchingKnob:
    pytestmark = pytest.mark.slow
    def test_no_batching_disables_batcher(self, model_root):
        with TS2D(key='ts2d-v9-test', use_remote=False, local=model_root,
                  batching=False) as t:
            assert t._fused is not None
            assert t._fused._batcher is None
        with TS2D(key='ts2d-v9-test', use_remote=False,
                  local=model_root) as t:
            assert t._fused is not None
            assert t._fused._batcher is not None

    def test_single_model_fused_matches_unfused(self, model_root):
        """Single-group sets (tsxr) now run the fused engine too; masks
        must match the per-model fallback path exactly."""
        with TS2D(key='tsxr-v9-test', use_remote=False,
                  local=model_root) as t:
            assert t._fused is not None, 'single-model sets should fuse'
            res_f = t.predict(asset_path('sample_chexpert.nrrd'))
            # close the fused engine (stops its batcher thread) before
            # forcing the unfused path
            t._fused.close()
            t._fused = None
            for m in t.models.values():
                m.start(wait=False)
            for m in t.models.values():
                m.await_startup()
            res_u = t.predict(asset_path('sample_chexpert.nrrd'))
        a = res_f.get_segmentation().array
        b = res_u.get_segmentation().array
        np.testing.assert_array_equal(a, b)
