"""Dice evaluation utility."""

import json
import subprocess
import sys

import numpy as np

from totalsegmentator2d_tpu.eval import dice_per_label, evaluate
from totalsegmentator2d_tpu.io import MedicalImage, write_image
from totalsegmentator2d_tpu.ops.annotations import set_annotation_meta


def _seg(mask_a, mask_b, names=('heart', 'aorta')):
    arr = np.stack([mask_a, mask_b], axis=-1).astype(np.uint8)
    img = MedicalImage(array=arr, spacing=(1.0, 1.0), is_vector=True)
    set_annotation_meta(img, names={1: names[0], 2: names[1]},
                        colors={n: '#ff0000' for n in names})
    return img


def test_dice_exact_and_partial():
    a = np.zeros((10, 10), bool); a[2:6, 2:6] = True
    b = np.zeros((10, 10), bool); b[2:6, 2:8] = True
    pred = _seg(a, a)
    gt = _seg(a, b)
    scores = dice_per_label(pred, gt)
    assert scores['heart'] == 1.0
    expected = 2 * 16 / (16 + 24)
    assert abs(scores['aorta'] - expected) < 1e-6


def test_dice_missing_label():
    a = np.zeros((4, 4), bool); a[0, 0] = True
    pred = _seg(a, np.zeros((4, 4), bool))
    gt = _seg(a, a)
    scores = dice_per_label(pred, gt)
    assert scores['aorta'] == 0.0   # empty prediction vs non-empty gt


def test_evaluate_files_and_cli(tmp_path):
    a = np.zeros((8, 8), bool); a[1:5, 1:5] = True
    pred = _seg(a, a)
    p1 = str(tmp_path / 'pred.nrrd'); p2 = str(tmp_path / 'gt.nrrd')
    write_image(pred, p1); write_image(pred, p2)
    res = evaluate(p1, p2)
    assert res['mean_dice'] == 1.0 and res['n_labels'] == 2
    out = subprocess.run(
        [sys.executable, '-m', 'totalsegmentator2d_tpu.eval', p1, p2],
        capture_output=True, text=True, cwd='/root/repo',
        env={'PATH': '/usr/bin:/bin', 'JAX_PLATFORMS': 'cpu',
             'PYTHONPATH': '/root/repo', 'HOME': '/root'})
    data = json.loads(out.stdout)
    assert data['mean_dice'] == 1.0
