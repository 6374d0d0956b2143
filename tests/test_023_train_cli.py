"""ts2d-train: the turnkey training CLI (training/cli.py).

Builds a real nnU-Net-raw-layout dataset on disk (NRRD via our own codec),
runs the full plan -> preprocess -> train -> export pipeline through the
CLI surface, and checks the exported model loads through the zoo and
predicts held-out cases (the validation path the CLI itself reports)."""

import os

import numpy as np
import pytest

from totalsegmentator2d_tpu.io import write_image
from totalsegmentator2d_tpu.io.image import MedicalImage
from totalsegmentator2d_tpu.utils.files import write_json


# full tier: heavy integration on a 1-core CPU box (run with pytest -m '')
pytestmark = pytest.mark.slow


def _make_dataset(root, n_cases=4, per_channel=False, labelmap=False,
                  multilabel=True):
    """dataset.json + imagesTr/ + labelsTr/ with 2-channel 72x64 cases."""
    rng = np.random.default_rng(5)
    img_dir = os.path.join(root, 'imagesTr')
    lbl_dir = os.path.join(root, 'labelsTr')
    os.makedirs(img_dir)
    os.makedirs(lbl_dir)
    write_json(os.path.join(root, 'dataset.json'), {
        'channel_names': {'0': 'max', '1': 'mean'},
        'labels': {'background': 0, 'heart': 1, 'aorta': 2},
        'numTraining': n_cases,
        'file_ending': '.nrrd',
        'multilabel': multilabel,
    })
    for i in range(n_cases):
        h, w = 72, 64
        arr = (rng.standard_normal((h, w, 2)) * 150 + 30).astype(np.float32)
        tgt = np.zeros((h, w, 2), np.uint8)
        tgt[10 + i:30 + i, 8:28, 0] = 1
        tgt[40:60, 30 + i:50 + i, 1] = 1
        # brighten the labeled structures so there is signal to learn
        arr[..., 0] += 300.0 * tgt[..., 0]
        arr[..., 1] += 300.0 * tgt[..., 1]
        if per_channel:
            for c in range(2):
                write_image(MedicalImage(array=arr[..., c],
                                         spacing=(1.0, 1.0)),
                            os.path.join(img_dir, f'case{i:02d}_{c:04d}.nrrd'))
        else:
            write_image(MedicalImage(array=arr, spacing=(1.0, 1.0),
                                     is_vector=True),
                        os.path.join(img_dir, f'case{i:02d}.nrrd'))
        if labelmap:
            lm = (tgt[..., 0] * 1 + tgt[..., 1] * 2).astype(np.uint8)
            write_image(MedicalImage(array=lm, spacing=(1.0, 1.0)),
                        os.path.join(lbl_dir, f'case{i:02d}.nrrd'))
        else:
            write_image(MedicalImage(array=tgt, spacing=(1.0, 1.0),
                                     is_vector=True),
                        os.path.join(lbl_dir, f'case{i:02d}.nrrd'))


class TestLoadRawDataset:
    def test_vector_files(self, tmp_path):
        from totalsegmentator2d_tpu.training import load_raw_dataset
        _make_dataset(str(tmp_path))
        cases, chans, labels, ml, ending = load_raw_dataset(str(tmp_path))
        assert len(cases) == 4
        assert chans == {0: 'max', 1: 'mean'}
        assert labels == {'heart': 1, 'aorta': 2}
        assert ml and ending == '.nrrd'
        img, seg = cases[0]
        assert img.array.shape == (72, 64, 2)
        assert seg.array.shape == (72, 64, 2)

    def test_per_channel_files_compose(self, tmp_path):
        from totalsegmentator2d_tpu.training import load_raw_dataset
        _make_dataset(str(tmp_path), per_channel=True)
        cases, *_ = load_raw_dataset(str(tmp_path))
        assert cases[0][0].array.shape == (72, 64, 2)

    def test_labelmap_one_hots(self, tmp_path):
        from totalsegmentator2d_tpu.training import load_raw_dataset
        _make_dataset(str(tmp_path), labelmap=True)
        cases, *_ = load_raw_dataset(str(tmp_path))
        seg = cases[0][1].array
        assert seg.shape == (72, 64, 2)
        assert set(np.unique(seg)) <= {0, 1}
        assert seg[..., 0].any() and seg[..., 1].any()

    def test_missing_label_raises(self, tmp_path):
        from totalsegmentator2d_tpu.training import load_raw_dataset
        _make_dataset(str(tmp_path))
        os.remove(os.path.join(tmp_path, 'labelsTr', 'case01.nrrd'))
        with pytest.raises(FileNotFoundError, match='case01'):
            load_raw_dataset(str(tmp_path))

    def test_channel_count_mismatch_raises(self, tmp_path):
        from totalsegmentator2d_tpu.training import load_raw_dataset
        _make_dataset(str(tmp_path), per_channel=True)
        os.remove(os.path.join(tmp_path, 'imagesTr', 'case02_0001.nrrd'))
        with pytest.raises(ValueError, match='case02'):
            load_raw_dataset(str(tmp_path))


class TestTrainCLI:
    def test_end_to_end(self, tmp_path):
        """Full circle through the console surface: dataset dir in, zoo-
        loadable model out, holdout Dice computed on the real inference
        path."""
        from totalsegmentator2d_tpu.inference import Zoo
        from totalsegmentator2d_tpu.training.cli import main
        from totalsegmentator2d_tpu.utils import logging as tlog

        data = tmp_path / 'Dataset501_toy'
        data.mkdir()
        _make_dataset(str(data))
        out = tmp_path / 'models'

        lines = []

        def sink(*a, **k):
            lines.append(' '.join(str(x) for x in a))

        tlog.add_log_sink(sink)
        try:
            main(['-d', str(data), '-o', str(out),
                  '--model', 'ts2d-toy', '--group', 'cardiac',
                  '--steps', '6', '--batch-size', '2', '--max-patch', '64',
                  '--val-fraction', '0.25', '--log-every', '3',
                  '--seed', '1'])
        finally:
            tlog.remove_log_sink(sink)

        text = '\n'.join(str(x) for x in lines)
        assert 'loss' in text
        assert 'holdout Dice' in text

        mid = 'ts2d-toy_cardiac'
        base = out / mid / 'r001'
        assert (base / 'model.json').exists()
        results = list(base.glob('Dataset*/nnUNetTrainer__nnUNetPlans__2d'))
        assert results, list(base.iterdir())
        assert (results[0] / 'plans.json').exists()
        assert (results[0] / 'dataset.json').exists()
        assert (results[0] / 'fold_0' / 'checkpoint_final.pth').exists()

        model = Zoo(remote=False, local=str(out)).load(mid)
        from totalsegmentator2d_tpu.io import read_image
        img = read_image(str(data / 'imagesTr' / 'case00.nrrd'))
        seg = model.apply(img)
        assert seg.ncomponents == 2
        assert seg.size == img.size

    def test_augment_rejected_for_softmax(self, tmp_path):
        from totalsegmentator2d_tpu.training import ts2d_train
        _make_dataset(str(tmp_path), labelmap=True, multilabel=False)
        with pytest.raises(ValueError, match='augment'):
            ts2d_train(str(tmp_path), str(tmp_path / 'out'), steps=1,
                       augment=True)


class TestValidationCorrectness:
    def test_one_hot_labelmap_vs_channels(self):
        from totalsegmentator2d_tpu.training.cli import _one_hot
        lm = np.zeros((4, 4, 1), np.uint8)
        lm[0, 0, 0] = 1
        lm[1, 1, 0] = 2
        oh = _one_hot(lm, 2)
        assert oh.shape == (4, 4, 2)
        assert oh[0, 0, 0] and not oh[0, 0, 1]
        assert oh[1, 1, 1] and not oh[1, 1, 0]
        # already-channelled targets pass through binarized
        ch = np.zeros((4, 4, 2), np.uint8)
        ch[2, 2, 1] = 1
        out = _one_hot(ch, 2)
        assert out[2, 2, 1] and out.sum() == 1

    def test_kfold_validates_with_per_fold_weights(self, tmp_path):
        """--folds 2: each fold's holdout Dice must come from that fold's
        checkpoint alone (the all-folds ensemble would leak the other
        fold's training cases into the metric)."""
        from totalsegmentator2d_tpu.training.cli import main
        from totalsegmentator2d_tpu.utils import logging as tlog

        data = tmp_path / 'ds'
        data.mkdir()
        _make_dataset(str(data))
        out = tmp_path / 'models'
        lines = []

        def sink(*a, **k):
            lines.append(' '.join(str(x) for x in a))

        tlog.add_log_sink(sink)
        try:
            main(['-d', str(data), '-o', str(out), '--model', 'ts2d-kf',
                  '--group', 'g', '--steps', '2', '--batch-size', '2',
                  '--max-patch', '64', '--folds', '2', '--log-every', '0'])
        finally:
            tlog.remove_log_sink(sink)
        text = '\n'.join(lines)
        assert 'fold-0 weights only' in text
        assert 'fold-1 weights only' in text
        base = out / 'ts2d-kf_g' / 'r001'
        results = list(base.glob('Dataset*/nnUNetTrainer__nnUNetPlans__2d'))
        assert (results[0] / 'fold_0' / 'checkpoint_final.pth').exists()
        assert (results[0] / 'fold_1' / 'checkpoint_final.pth').exists()

    def test_mixed_case_model_id_normalizes_before_training(self, tmp_path):
        """FileDataBase lookups lowercase keys while export writes verbatim:
        a mixed-case --model must normalize up front, not fail after the
        training run."""
        from totalsegmentator2d_tpu.training import ts2d_train
        data = tmp_path / 'ds'
        data.mkdir()
        _make_dataset(str(data))
        out = tmp_path / 'models'
        mid = ts2d_train(str(data), str(out), model='TS2D-Case',
                         group='Organs', steps=1, batch_size=2,
                         max_patch=64, log_every=0)
        assert mid == 'ts2d-case_organs'
        assert (out / mid / 'r001' / 'model.json').exists()
