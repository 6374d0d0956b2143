"""Analytic roofline for the fused ensemble program on TPU v5e.

VERDICT r3 item 2 asked for either a Mosaic whole-stage win or "the
roofline proof that ~24% MFU is the ceiling for this architecture".
This script IS that arithmetic: it walks the exact bench architecture
(6-stage nnU-Net 2D, features 32..512, 256^2 patches, 2 input channels,
5 groups x 1 fold, 4 tiles x 4 TTA mirrors, batch 8 scans -> 128
patch-forwards in chunks of 64) and accounts FLOPs and HBM bytes per
conv-InstanceNorm-LeakyReLU unit under three memory models:

  xla-2pass   conv reads X writes Y; the mean reduction reads Y; the
              variance reduction reads Y again (it depends on the mean,
              so XLA cannot fuse the two into one traversal);
              normalize+act read Y write Y'.
              => 6 HBM traversals of the activation per unit. This is
              what models/unet._instance_norm ships by default (torch-
              matching two-pass statistics).
  xla-1pass   TS2D_STATS=1pass: variance as E[x^2]-E[x]^2 — mean and
              sumsq reductions fuse into ONE traversal.
              => 5 traversals.
  stats-fused stats accumulate in the conv epilogue (Mosaic two-phase
              kernel; saves the dedicated stats read entirely).
              => 4 traversals.
  mosaic-min  stats in the conv epilogue AND the normalize folded into
              the NEXT conv's input read (per-channel scale/shift applied
              on the fly while loading tiles).
              => 2 traversals — the floor for InstanceNorm, which is a
              GLOBAL per-channel reduction: no single-pass scheme exists
              because normalization of pixel 0 depends on pixel N.

v5e peaks: 197 TFLOP/s bf16, 819 GB/s HBM (public spec). Run:
    python tools/roofline.py
Conclusions are written up in docs/performance.md ("Roofline closure").
"""

import json
import sys

PEAK_FLOPS = 197e12      # v5e bf16
PEAK_HBM = 819e9         # bytes/s
BF16 = 2

N_STAGES = 6
FEATURES = tuple(min(32 * 2 ** i, 512) for i in range(N_STAGES))
PATCH = 256
IN_CH = 2
GROUPS = 5
LABELS = (24, 21, 22, 24, 26)
SCANS = 8                 # micro-batch
TILES, TTA = 4, 4
CHUNK = 64                # forward_batch_cap
K = 9                     # 3x3 kernels


def conv_unit(m, h, w, cin, cout, norm=True):
    """One conv(+IN+lrelu) unit: FLOPs and HBM bytes per memory model."""
    x = m * h * w * cin * BF16
    y = m * h * w * cout * BF16
    flops = 2.0 * m * h * w * cout * K * cin
    return {
        'flops': flops,
        # conv read X + write Y (+ mean read + var read + norm read/write)
        'xla-2pass': x + y + (4 * y if norm else 0),
        'xla-1pass': x + y + (3 * y if norm else 0),
        'stats-fused': x + y + (2 * y if norm else 0),
        'mosaic-min': x + y,  # stats in epilogue, scale/shift on next read
    }


def accumulate(units, m, h, w, cin, cout, tag):
    u = conv_unit(m, h, w, cin, cout)
    u['tag'] = tag
    units.append(u)


def model():
    M = SCANS * TILES * TTA           # 128 patch-forwards per batch
    units = []
    # encoder: stride-2 entry per stage (except s0), 2 convs per stage
    h = w = PATCH
    cin = IN_CH
    enc_hw = []
    for s, c in enumerate(FEATURES):
        if s > 0:
            h //= 2
            w //= 2
        accumulate(units, M, h, w, cin, c, f'enc{s}.conv0')
        accumulate(units, M, h, w, c, c, f'enc{s}.conv1')
        enc_hw.append((h, w, c))
        cin = c
    # decoder: transpconv (no norm) + concat + 2 convs per stage
    for d in range(N_STAGES - 1):
        enc_stage = N_STAGES - 1 - d
        hb, wb, cb = enc_hw[enc_stage]          # below
        hs, ws, cs = enc_hw[enc_stage - 1]      # skip level
        # transpconv cb -> cs, upsampling 2x: flops ~ 2*M*hs*ws*cs*(4*cb)/4
        t = {'flops': 2.0 * M * hs * ws * cs * cb,
             'tag': f'dec{d}.transp'}
        xin = M * hb * wb * cb * BF16
        yout = M * hs * ws * cs * BF16
        for k in ('xla-2pass', 'xla-1pass', 'stats-fused', 'mosaic-min'):
            t[k] = xin + yout
        units.append(t)
        # concat doubles the first conv's input channels; the concat
        # itself is a copy XLA fuses into the consumer (charge the skip
        # read to the conv input)
        accumulate(units, M, hs, ws, 2 * cs, cs, f'dec{d}.conv0')
        accumulate(units, M, hs, ws, cs, cs, f'dec{d}.conv1')
    # seg heads (1x1, no norm) — only the full-res head runs at inference
    Lp = max(LABELS)
    head = {'flops': 2.0 * M * PATCH * PATCH * Lp * FEATURES[0],
            'tag': 'seg-head'}
    xin = M * PATCH * PATCH * FEATURES[0] * BF16
    yout = M * PATCH * PATCH * Lp * 4  # fp32 logits
    for k in ('xla-2pass', 'xla-1pass', 'stats-fused', 'mosaic-min'):
        head[k] = xin + yout
    units.append(head)
    return units


def main():
    units = model()
    # every unit runs once per group (lax.map over the 5 stacked nets);
    # the per-group label head width differs only marginally (24-26)
    tot = {k: GROUPS * sum(u[k] for u in units)
           for k in ('flops', 'xla-2pass', 'xla-1pass', 'stats-fused', 'mosaic-min')}
    # Gaussian overlap-add: acc (G, 350, 280, Lp) fp32 read-modify-write
    # per chunk (2 chunks) + the mirror flips (one extra activation pass
    # of the input patches per TTA variant — charged as one X read each,
    # already inside the conv0 read). Small vs the stage traffic; add the
    # accumulator RMW explicitly:
    acc_bytes = 2 * (2 * GROUPS * 350 * 280 * max(LABELS) * 4 + 350 * 280 * 4)
    for k in ('xla-2pass', 'xla-1pass', 'stats-fused', 'mosaic-min'):
        tot[k] += acc_bytes

    t_flops = tot['flops'] / PEAK_FLOPS
    out = {
        'batch_scans': SCANS,
        'tflop_per_batch': round(tot['flops'] / 1e12, 2),
        'compute_bound_ms': round(t_flops * 1e3, 1),
        'per_model_ms': {},
    }
    for k in ('xla-2pass', 'xla-1pass', 'stats-fused', 'mosaic-min'):
        t_mem = tot[k] / PEAK_HBM
        t = max(t_mem, t_flops)
        out['per_model_ms'][k] = {
            'hbm_gb': round(tot[k] / 1e9, 1),
            'memory_bound_ms': round(t_mem * 1e3, 1),
            'roofline_ms': round(t * 1e3, 1),
            'roofline_ms_per_scan': round(t * 1e3 / SCANS, 2),
            'mfu_at_roofline_pct': round(100 * t_flops / t, 1),
        }
    json.dump(out, sys.stdout, indent=2)
    print()


if __name__ == '__main__':
    main()
