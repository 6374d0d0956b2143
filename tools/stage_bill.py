"""Per-stage bill of the inference U-Net forward: measured vs roofline.

VERDICT r4 item 2: the batch-8 fused ensemble measures ~50 ms/scan
against a 21.6 ms/scan xla-2pass roofline (tools/roofline.py) — a 2.3x
"XLA realization loss" that was attributed to named suspects (reduce
fusions, small-channel early stages, scan boundaries) but never billed
per stage. This tool produces that bill:

 - builds the bench-scale flagship net (6 stages, 256x256, 2ch, 24
   labels) and PREFIX programs: encoder stages enc0..enc5, then decoder
   stages dec0..dec4, then the seg head — each jitted separately on the
   real chunk shape (64 patch-forwards, bf16, input resident).
 - measures each prefix back-to-back (min-of-N, output folded to one
   scalar inside the program) and differences consecutive prefixes:
   dT_k = stage k's cost inside a program that still contains everything
   before it (shared prefixes cancel to the extent XLA compiles them
   identically). A null program measures the per-execution dispatch
   overhead (~25-30 ms through this relay) and seeds the differencing —
   without it the first row absorbs the whole overhead (the round-5
   first run misattributed it all to enc0).
 - computes each stage's xla-2pass HBM roofline at the same shapes
   (the roofline.py memory model, M=64) and prints measured / roofline
   / realization per stage, plus the total vs the separately-measured
   full forward (consistency check: structure overhead the differencing
   cannot see, e.g. scan/map boundaries, shows up as full > sum).

Usage: python tools/stage_bill.py [--stats {2pass,1pass}]
(alone on the box; ONE JAX process)
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')

from probelib import (  # noqa: E402
    IN_CH, LABELS, N_STAGES, PATCH, PEAK_HBM)

PEAK_FLOPS = 197e12
BF16 = 2
M = 64            # the real program's forward chunk (tiles x TTA chunking)
N_REPS = 8


def stage_roofline(stats='2pass'):
    """Per-stage xla HBM bytes + FLOPs at chunk M (roofline.py's memory
    model, regrouped per stage)."""
    feats = tuple(min(32 * 2 ** i, 512) for i in range(N_STAGES))
    npass = 4 if stats == '2pass' else 3
    out = {}
    h = w = PATCH
    cin = IN_CH
    enc_hw = []
    for s, c in enumerate(feats):
        if s > 0:
            h //= 2
            w //= 2
        by = fl = 0.0
        for ci, co in ((cin, c), (c, c)):
            x = M * h * w * ci * BF16
            y = M * h * w * co * BF16
            by += x + y + npass * y
            fl += 2.0 * M * h * w * co * 9 * ci
        out[f'enc{s}'] = {'bytes': by, 'flops': fl}
        enc_hw.append((h, w, c))
        cin = c
    for d in range(N_STAGES - 1):
        es = N_STAGES - 1 - d
        hb, wb, cb = enc_hw[es]
        hs, ws, cs = enc_hw[es - 1]
        by = M * hb * wb * cb * BF16 + M * hs * ws * cs * BF16  # transp
        fl = 2.0 * M * hs * ws * cs * cb
        for ci, co in ((2 * cs, cs), (cs, cs)):
            x = M * hs * ws * ci * BF16
            y = M * hs * ws * co * BF16
            by += x + y + npass * y
            fl += 2.0 * M * hs * ws * co * 9 * ci
        out[f'dec{d}'] = {'bytes': by, 'flops': fl}
    out['head'] = {
        'bytes': M * PATCH * PATCH * (feats[0] * BF16 + LABELS * 4),
        'flops': 2.0 * M * PATCH * PATCH * LABELS * feats[0]}
    for v in out.values():
        v['roofline_ms'] = round(max(v['bytes'] / PEAK_HBM,
                                     v['flops'] / PEAK_FLOPS) * 1e3, 2)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--stats', default='2pass', choices=['2pass', '1pass'])
    args = ap.parse_args()
    os.environ['TS2D_STATS'] = args.stats

    import jax
    import jax.numpy as jnp
    from totalsegmentator2d_tpu.models import unet
    from __graft_entry__ import _flagship_spec

    print('devices:', jax.devices(), file=sys.stderr)
    spec = _flagship_spec(out_channels=LABELS, in_channels=IN_CH,
                          n_stages=N_STAGES)
    params = unet.init_params_np(0, spec)
    params = jax.device_put(params)
    rng = np.random.default_rng(0)
    x = jax.device_put(rng.standard_normal(
        (M, PATCH, PATCH, IN_CH)).astype(np.float32).astype(jnp.bfloat16))

    a = spec
    cdt = jnp.bfloat16

    def prefix_fn(n_enc, n_dec, with_head):
        """Forward through n_enc encoder stages and n_dec decoder stages
        (requires n_enc == N_STAGES when n_dec > 0)."""
        def f(p, xx):
            skips = []
            h = xx
            for s in range(n_enc):
                h = unet._conv_stack(h, p['encoder']['stages'][s],
                                     a.strides[s], a.kernel_sizes[s], a, cdt)
                skips.append(h)
            for d in range(n_dec):
                es = N_STAGES - 1 - d
                t = p['decoder']['transpconvs'][d]
                h = unet._conv_transpose(h, t['w'], t.get('b'),
                                         a.strides[es], cdt, out_dtype=cdt)
                h = jnp.concatenate(
                    [h, skips[es - 1].astype(h.dtype)], axis=-1)
                h = unet._conv_stack(h, p['decoder']['stages'][d], (1, 1),
                                     a.kernel_sizes[es - 1], a, cdt)
            if with_head:
                sl = p['decoder']['seg_layers'][N_STAGES - 2]
                h = unet._conv(h, sl['w'], sl.get('b'), (1, 1), (1, 1),
                               cdt, out_dtype=jnp.float32)
            return h
        return f

    def measure(fn):
        # fold the output to one fp32 scalar INSIDE the program: fetching a
        # slice dispatches a second program per rep, and ravel()-style syncs
        # materialize the whole output at a layout-dependent price
        # (stage0_probe round-5 artifact). The sum adds one read of the
        # prefix output (~0.3 ms) that differences out up to the small
        # delta between consecutive prefixes' output sizes.
        jfn = jax.jit(lambda p, xx: jnp.sum(fn(p, xx).astype(jnp.float32)))
        float(np.asarray(jax.device_get(jfn(params, x))))  # compile
        times = []
        for _ in range(N_REPS):
            t0 = time.perf_counter()
            float(np.asarray(jax.device_get(jfn(params, x))))
            times.append(time.perf_counter() - t0)
        return float(np.min(times))

    # per-execution dispatch+fetch overhead through the relay: measured by
    # a null program and subtracted from every prefix (it corrupted the
    # FIRST row by its full ~25-30 ms in the round-5 first run — the
    # differencing cancels it for every later row)
    one = jax.device_put(np.float32(1.0))
    null = jax.jit(lambda s: s + 1.0)
    float(np.asarray(jax.device_get(null(one))))
    null_times = []
    for _ in range(N_REPS):
        t0 = time.perf_counter()
        float(np.asarray(jax.device_get(null(one))))
        null_times.append(time.perf_counter() - t0)
    t_null = float(np.min(null_times))
    print(f'null program (dispatch+fetch overhead): {t_null*1e3:.2f} ms',
          flush=True)

    names, fns = [], []
    for s in range(1, N_STAGES + 1):
        names.append(f'enc{s - 1}')
        fns.append(prefix_fn(s, 0, False))
    for d in range(1, N_STAGES):
        names.append(f'dec{d - 1}')
        fns.append(prefix_fn(N_STAGES, d, False))
    names.append('head')
    fns.append(prefix_fn(N_STAGES, N_STAGES - 1, True))

    roof = stage_roofline(args.stats)
    rows = []
    prev = t_null  # differencing starts from the dispatch overhead
    total_roof = 0.0
    for name, fn in zip(names, fns):
        t = measure(fn)
        dt = (t - prev) * 1e3
        prev = t
        r = roof[name]['roofline_ms']
        total_roof += r
        rows.append({'stage': name, 'measured_ms': round(dt, 2),
                     'roofline_ms': r,
                     'realization_pct': round(100 * r / dt, 1) if dt > 0
                     else None})
        print(f'{name:6s} measured {dt:7.2f} ms   roofline {r:6.2f} ms   '
              f'realization {rows[-1]["realization_pct"]}%', flush=True)

    full = (prev - t_null) * 1e3
    print(json.dumps({
        'stats_mode': args.stats,
        'chunk': M,
        'dispatch_overhead_ms': round(t_null * 1e3, 2),
        'stages': rows,
        'full_forward_ms': round(full, 2),
        'sum_roofline_ms': round(total_roof, 2),
        'realization_total_pct': round(100 * total_roof / full, 1),
    }, indent=1))


if __name__ == '__main__':
    main()
