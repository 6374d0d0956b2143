"""Model export: trained params -> nnU-Net layout -> zoo round-trip."""

import numpy as np
import pytest

from totalsegmentator2d_tpu.inference import Zoo
from totalsegmentator2d_tpu.io.image import MedicalImage
from totalsegmentator2d_tpu.models.export import export_model_dir
from totalsegmentator2d_tpu.models.plans import ModelSpec, PreprocessSpec, ArchSpec
from totalsegmentator2d_tpu.models.unet import init_params_np


@pytest.fixture(scope='module')
def spec():
    arch = ArchSpec(
        n_stages=3, features_per_stage=(8, 16, 16),
        kernel_sizes=((3, 3),) * 3, strides=((1, 1), (2, 2), (2, 2)),
        n_conv_per_stage=(2, 2, 2), n_conv_per_stage_decoder=(2, 2),
        in_channels=2, out_channels=2)
    pre = PreprocessSpec(
        spacing=(1.5, 1.5), patch_size=(32, 32),
        normalization_schemes=('ZScoreNormalization',) * 2,
        use_mask_for_norm=(False, False), intensity_properties=(None, None))
    return ModelSpec(arch=arch, preprocess=pre,
                     labels={1: 'heart', 2: 'aorta'},
                     channel_names={0: 'max', 1: 'mean'}, multilabel=True)


@pytest.mark.slow
def test_export_and_reload_through_zoo(tmp_path, spec, rng):
    fold_params = [init_params_np(s, spec.arch) for s in (0, 1)]
    mid = export_model_dir(str(tmp_path), 'ts2d-v9-exp', 'cardiac', spec,
                           fold_params, epoch=4000)
    assert mid == 'ts2d-v9-exp_cardiac'

    zoo = Zoo(remote=False, local=str(tmp_path))
    model = zoo.load(mid)
    assert model.folds == [0, 1]
    assert model.labels == {1: 'heart', 2: 'aorta'}
    assert model.channels == {0: 'max', 1: 'mean'}
    assert model.multilabel
    assert model.spec.preprocess.patch_size == (32, 32)

    # weights survive the round trip exactly
    back = model.load_fold_params()
    a = fold_params[0]['encoder']['stages'][0][0]['conv']['w']
    b = back[0]['encoder']['stages'][0][0]['conv']['w']
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # and the model actually predicts
    img = MedicalImage(
        array=(rng.standard_normal((40, 30, 2)) + 2).astype(np.float32),
        spacing=(1.5, 1.5), is_vector=True)
    seg = model.apply(img)
    assert seg.ncomponents == 2
    assert seg.meta['Segment0_Name'] == 'heart'


def test_export_mirroring_axes_roundtrip(tmp_path, spec):
    import dataclasses
    spec1 = dataclasses.replace(spec, allowed_mirroring_axes=(1,))
    export_model_dir(str(tmp_path), 'ts2d-v9-mx', 'ribs', spec1,
                     [init_params_np(0, spec1.arch)])
    zoo = Zoo(remote=False, local=str(tmp_path))
    model = zoo.load('ts2d-v9-mx_ribs')
    model.load_fold_params()
    assert model.spec.allowed_mirroring_axes == (1,)
