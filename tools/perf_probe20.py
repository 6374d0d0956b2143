"""probe20: InstanceNorm statistics A/B on the real TPU.

TS2D_STATS=1pass merges the mean and variance reductions into one HBM
traversal of the conv output (models/unet._one_pass_stats — saves 1 of 6
traversals per conv-norm-act unit, tools/roofline.py). This probe
measures the batch-8 fused ensemble program both ways with the
device-floor method (pre-uploaded input, back-to-back executions, tiny
dependent fetch as sync) and prints per-scan device time + the logit
agreement of the two programs' masks.

Run: python tools/perf_probe20.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def floor_with(stats_mode: str, vol, rounds=6):
    os.environ['TS2D_STATS'] = stats_mode
    eng = bench.build_engine()
    try:
        t = bench.device_floor(eng, vol, (1.5, 1.5), rounds=rounds)
        seg = eng.predict_array(bench.host_project(vol), (1.5, 1.5))
    finally:
        eng.close()
    return t, seg


def main():
    from totalsegmentator2d_tpu.utils.logging import log_silent
    log_silent(True)
    vol = bench.make_realistic_volume()
    t2, seg2 = floor_with('2pass', vol)
    t1, seg1 = floor_with('1pass', vol)
    agree = float((seg1 == seg2).mean())
    print(f'2pass device floor: {t2*1e3:.1f} ms/scan')
    print(f'1pass device floor: {t1*1e3:.1f} ms/scan  ({t2/t1:.3f}x)')
    print(f'mask agreement 1pass vs 2pass: {agree:.6f}')


if __name__ == '__main__':
    main()
