"""Full-scale ensemble: 5 groups, 117 real TS2D label names, real CT in,
merged segmentation saved + reloaded with names and registry colors."""

import numpy as np
import pytest

from tests.conftest import asset_path
from tests.model_fixtures import build_model_dir
from totalsegmentator2d_tpu.api import TS2D
from totalsegmentator2d_tpu.io import read_image
from totalsegmentator2d_tpu.ops.annotations import get_annotation_labels
from totalsegmentator2d_tpu.utils.config import get_label_colors

GROUP_SIZES = {'cardiac': 24, 'muscles': 21, 'organs': 22, 'ribs': 24,
               'vertebrae': 26}


# full tier: heavy integration on a 1-core CPU box (run with pytest -m '')
pytestmark = pytest.mark.slow


@pytest.fixture(scope='module')
def full_zoo(tmp_path_factory):
    """Five groups labeled with 117 real names from the packaged registry."""
    root = str(tmp_path_factory.mktemp('fullzoo'))
    names = list(get_label_colors())
    assert len(names) >= sum(GROUP_SIZES.values())
    offset = 0
    for i, (group, n) in enumerate(GROUP_SIZES.items()):
        build_model_dir(root, model='ts2d-v9-full', group=group,
                        labels=tuple(names[offset:offset + n]),
                        task_id=400 + i, seed=i, patch=(64, 64))
        offset += n
    return root


class TestFullEnsemble:
    def test_117_label_merge_on_real_ct(self, full_zoo, tmp_path):
        with TS2D(key='ts2d-v9-full', use_remote=False, local=full_zoo) as t:
            assert len(t.models) == 5
            assert t._fused is not None, 'fused ensemble expected'
            res = t.predict(asset_path('sample_s0521.nrrd'))
            seg = res.get_segmentation()
            assert seg.ncomponents == 117
            # every channel annotated with its real name + registry color
            labels = get_annotation_labels(seg)
            assert len(labels) == 117
            colors = get_label_colors()
            for name, info in labels.items():
                assert name in colors
                assert info['color'] is not None

            res.save(str(tmp_path), name='full', targets=['segmentation'],
                     content='file')
        back = read_image(str(tmp_path / 'full.seg.nrrd'))
        assert back.ncomponents == 117
        reloaded = get_annotation_labels(back)
        assert set(reloaded) == set(labels)

    def test_per_group_slices_match_merge(self, full_zoo):
        with TS2D(key='ts2d-v9-full', use_remote=False, local=full_zoo) as t:
            res = t.predict(asset_path('sample_s0332.nrrd'))
            merged = res.get_segmentation()
            offset = 0
            for mid in res.models:
                seg = res.get_segmentation(mid)
                n = seg.ncomponents
                np.testing.assert_array_equal(
                    np.squeeze(seg.array),
                    np.squeeze(merged.array[..., offset:offset + n]))
                offset += n
            assert offset == 117


class TestAllBundledSamples:
    def test_key_switching_and_all_assets(self, full_zoo, tmp_path):
        """BASELINE config #4: switch model keys in one process and predict
        every bundled sample (3 CT-type through the projection models, the
        X-ray through a tsxr-style model)."""
        from tests.model_fixtures import build_model_dir
        build_model_dir(full_zoo, model='tsxr-v9-full', group='ribs',
                        labels=('rib-left-1', 'rib-right-1'),
                        channels=('xr',), task_id=450)

        ct_assets = ['sample_s0521.nrrd', 'sample_s0332.nrrd',
                     'sample_s0616.nrrd']
        with TS2D(key='ts2d-v9-full', use_remote=False, local=full_zoo) as t:
            for name in ct_assets:
                res = t.predict(asset_path(name))
                seg = res.get_segmentation()
                assert seg.ncomponents == 117, name

        # key switch: a fresh tool on the X-ray model family
        with TS2D(key='tsxr-v9-full', use_remote=False, local=full_zoo) as t:
            res = t.predict(asset_path('sample_chexpert.nrrd'))
            assert res.get_segmentation().ncomponents == 2
