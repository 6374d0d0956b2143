"""Bill the NON-forward share of the fused serving program.

stage_bill.py (round 5, corrected) prices the bare forwards at 28.4 ms
per M=64 chunk; the batch-8 program runs 10 chunks (5 groups x 8 scans x
4 tiles x 4 TTA / 64) = 284 ms of forwards against ~395 ms of measured
device execution — ~111 ms/batch (~14 ms/scan) of preprocessing resample,
tile gather/scatter, TTA mirror inverses, Gaussian-weighted accumulation,
sigmoid/threshold and wire packing. This probe decomposes that share by
differencing engine variants at the device floor (rounds=8 back-to-back
executions amortize the ~25 ms dispatch overhead to ~3 ms/batch):

  baseline      auto_batch=8, mirroring on, compacted wire (the shipped
                serving config; floor matches bench's device_floor)
  no-TTA        use_mirroring=False: forwards drop 4x (16 -> 4 per
                scan-group). measured_delta - predicted_forward_delta =
                the mirror/inverse/blend overhead TTA adds beyond its
                forwards
  plain wire    TS2D_COMPACT=0: the compaction pack's device cost
  solo          the one-scan program: per-scan fixed work that batching
                amortizes (vs 1/8 of the batch floor)

Usage: python tools/nonforward_bill.py   (alone on the box; ONE JAX process)
"""

import json
import os
import sys

sys.path.insert(0, '/root/repo')

CHUNK_MS_DEFAULT = 28.43  # stage_bill.py round-5 corrected (2pass, M=64)


def floors(rounds=8, use_mirroring=None):
    import bench
    import numpy as np
    from totalsegmentator2d_tpu.inference.ensemble_engine import (
        _nonzero_bbox, wire_detect)

    eng = bench.build_engine()
    if use_mirroring is not None:
        # consumed lazily at program build (ensemble_engine.py:512/709);
        # no program exists yet on a fresh engine
        eng.use_mirroring = bool(use_mirroring)
    vol = bench.make_realistic_volume()
    try:
        # grab the real tile/mirror counts from the solo program's meta
        # (device_floor(solo=True) reuses it from the engine cache)
        arr = bench.host_project(vol)
        (y0, y1), (x0, x1) = _nonzero_bbox(arr)
        cropped = np.ascontiguousarray(arr[y0:y1, x0:x1])
        wire = wire_detect(cropped)
        _, meta = eng._serving_program(cropped.shape[:2], (1.5, 1.5),
                                       wire if any(wire) else None)
        nt = meta.get('n_tiles', meta.get('n_tiles_max'))
        nm = meta.get('n_mirror', 4)
        fb = bench.device_floor(eng, vol, (1.5, 1.5), rounds=rounds)
        fs = bench.device_floor(eng, vol, (1.5, 1.5), rounds=rounds,
                                solo=True)
    finally:
        eng.close()
    return fb, fs, nt, nm


def main():
    from totalsegmentator2d_tpu.utils.logging import log_silent
    log_silent(True)

    rows = {}
    fb, fs, nt, nm = floors()
    rows['baseline'] = {'batched_s_per_scan': round(fb, 5),
                        'solo_s': round(fs, 5), 'n_tiles': nt,
                        'n_mirror': nm}
    print(f'baseline   batched {fb*1e3:7.2f} ms/scan   solo {fs*1e3:7.2f} ms'
          f'   ({nt} tiles x {nm} mirrors)', flush=True)

    fb2, fs2, nt2, nm2 = floors(use_mirroring=False)
    rows['no_tta'] = {'batched_s_per_scan': round(fb2, 5),
                      'solo_s': round(fs2, 5), 'n_mirror': nm2}
    print(f'no-TTA     batched {fb2*1e3:7.2f} ms/scan   solo '
          f'{fs2*1e3:7.2f} ms', flush=True)

    os.environ['TS2D_COMPACT'] = '0'
    fb3, fs3, _, _ = floors()
    del os.environ['TS2D_COMPACT']
    rows['plain_wire'] = {'batched_s_per_scan': round(fb3, 5),
                          'solo_s': round(fs3, 5)}
    print(f'plain-wire batched {fb3*1e3:7.2f} ms/scan   solo '
          f'{fs3*1e3:7.2f} ms', flush=True)

    # the bill: forwards predicted from the stage_bill chunk price,
    # scaled linearly by forward count (chunk cap 64)
    chunk_ms = float(os.environ.get('TS2D_CHUNK_MS', CHUNK_MS_DEFAULT))
    n_groups = 5
    fwd_full = n_groups * nt * nm * chunk_ms / 64.0      # ms/scan, TTA on
    fwd_nott = n_groups * nt * nm2 * chunk_ms / 64.0     # mirroring off
    tta_delta = (fb - fb2) * 1e3
    tta_overhead = tta_delta - (fwd_full - fwd_nott)
    pack_cost = (fb - fb3) * 1e3         # negative = compaction is a WIN
    nonfwd = fb * 1e3 - fwd_full
    print(json.dumps({
        'chunk_ms': chunk_ms,
        'rows': rows,
        'per_scan_ms': {
            'forwards_predicted': round(fwd_full, 2),
            'nonforward_total': round(nonfwd, 2),
            'tta_delta_measured': round(tta_delta, 2),
            'tta_overhead_beyond_forwards': round(tta_overhead, 2),
            'compact_pack_cost': round(pack_cost, 2),
        },
    }, indent=1))


if __name__ == '__main__':
    main()
