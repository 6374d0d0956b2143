"""probe19: bench-workload mask-statistics calibration + compaction ratio.

Two questions this probe answered (results baked into bench.py and
docs/performance.md):

1. WHERE to put the seg-head bias so the synthetic checkpoints produce
   realistic mask sparsity. Per-group logit distributions on the torso
   phantom (6-stage bench arch, random init): std 0.76-0.97, q98.5 =
   1.9-2.6 -> a constant -2.2 bias lands per-label foreground at 1-2.5%
   (published-model coronal-projection statistics). Raw random init
   yields ~50%-dense sigmoid masks (fg bit fraction 0.527 measured,
   99.8% of packed bytes nonzero) — a regime no real model is in and one
   that makes the download wire measurement adversarially pessimal.

2. WHAT the compacted wire ships on those masks. Random weights produce
   SPECKLE (no spatial coherence), so this is a lower bound vs real
   anatomy blobs. Measured on the phantom masks (fg 1.9%):
     plane-major  8B tiles: 22.4% occupied -> 4.2x fewer wire bytes
     plane-major 32B tiles: 38.4% occupied -> 2.6x
     pixel-major  8B tiles: 28.0% occupied -> 3.4x  (layout matters)
   The production tile size is 8 bytes (ensemble_engine._COMPACT_TILE);
   with the 5-fraction prefix buckets the bench ships 390 KB of the
   1.47 MB full masks (3.8x).

Run (CPU ok, ~10 min: five 6-stage group programs):
    python tools/perf_probe19.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
    import jax.numpy as jnp

    from totalsegmentator2d_tpu.inference import InferenceEngine
    from totalsegmentator2d_tpu.models.plans import ModelSpec, PreprocessSpec
    from totalsegmentator2d_tpu.models.unet import init_params_np
    from __graft_entry__ import _flagship_spec

    vol = bench.make_realistic_volume()
    proj = bench.host_project(vol)
    pre = PreprocessSpec(
        spacing=(1.5, 1.5), patch_size=bench.PATCH,
        normalization_schemes=('ZScoreNormalization',) * 2,
        use_mask_for_norm=(False, False), intensity_properties=(None, None))
    all_bits = []
    for i, (group, n_labels) in enumerate(bench.GROUP_LABELS.items()):
        arch = _flagship_spec(out_channels=n_labels, in_channels=2,
                              n_stages=bench.N_STAGES)
        spec = ModelSpec(
            arch=arch, preprocess=pre,
            labels={v + 1: f'{group}-{v}' for v in range(n_labels)},
            channel_names={0: 'max', 1: 'mean'}, multilabel=True)
        eng = InferenceEngine(spec, [init_params_np(i, arch)],
                              compute_dtype=jnp.bfloat16)
        _, logits, _ = eng.predict_array(proj, (1.5, 1.5),
                                         return_logits=True)
        logits = np.asarray(logits)
        qs = np.quantile(logits, [0.5, 0.9, 0.985, 0.999])
        print(f'{group}: logit mean={logits.mean():.3f} '
              f'std={logits.std():.3f} q50/q90/q98.5/q99.9='
              f'{np.round(qs, 3)} '
              f'fg@-2.2bias={(logits > 2.2).mean() * 100:.2f}%',
              flush=True)
        all_bits.append(logits > 2.2)

    seg = np.concatenate(all_bits, axis=-1).astype(np.uint8)
    packed = np.packbits(seg, axis=-1, bitorder='little')
    print(f'masks: fg bits {100 * seg.mean():.2f}%, nonzero packed bytes '
          f'{100 * (packed != 0).mean():.1f}%')
    planes = np.ascontiguousarray(packed.transpose(2, 0, 1)).reshape(-1)
    total = planes.size
    for order, flat in (('plane-major', planes),
                        ('pixel-major', packed.reshape(-1))):
        for chunk in (32, 8):
            pad = (-flat.size) % chunk
            f = np.pad(flat, (0, pad)) if pad else flat
            occ = (f.reshape(-1, chunk) != 0).any(axis=1)
            wire = occ.sum() * chunk + occ.size / 8
            print(f'{order} {chunk:2d}B tiles: occupied {occ.mean()*100:5.1f}%'
                  f' wire {wire/1e3:6.0f} KB ({total/wire:.1f}x)')


if __name__ == '__main__':
    main()
