"""Shared measurement library for the tools/ probes (round-5 consolidation).

Every probe used to carry private copies of the same four idioms; return-
shape changes in the engine kept breaking them one by one (VERDICT r4
item 6). The idioms live here once:

 - ``sync(out)``: completion through the axon relay. ``block_until_ready``
   returns early through the tunnel (CLAUDE.md) — the only reliable sync
   is downloading a tiny scalar that DEPENDS on the output.
 - ``timeit(fn, reps, *args)``: compile warmup + min/median-of-N with
   sync-fetch per rep. Min is the device figure (tunnel noise is
   one-sided); median shows the weather.

CAVEATS for micro-benchmarks (round-5 findings, docs/performance.md):
every synced execution pays a ~25 ms dispatch+fetch floor through the
relay which min-of-N does NOT remove — measure a null program
(``jit(lambda s: s + 1.0)``) and subtract, or fit a slope over K
in-program repetitions. And ``sync``'s ravel dispatches a reshape whose
cost depends on the output's layout — fine for pipeline timing
(constant across reps), wrong for cross-variant comparisons: fold a
``jnp.sum`` INTO the jitted program and fetch that scalar instead.
 - analytic FLOP counters for the flagship nnU-Net arch, matching
   models/unet.forward's structure (same counting as tools/roofline.py).
 - the flagship bench-scale model constants (256x256, 2ch, 24 labels,
   6 stages) and builders, so probes measure the SAME program bench.py
   ships.

Probes are standalone scripts run ONE at a time (1-core host, relay
blocks concurrent JAX processes — CLAUDE.md).
"""

import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')

# v5e chip peaks (same figures as tools/roofline.py)
PEAK_BF16 = 197e12   # bf16 FLOP/s
PEAK_HBM = 819e9     # HBM bytes/s

# flagship bench-scale group model (bench.py / __graft_entry__.py)
PATCH = 256
N_STAGES = 6
LABELS = 24
IN_CH = 2
K = 9  # 3x3 kernels


def sync(out):
    """Force completion through the relay by fetching one dependent scalar.

    block_until_ready does not actually wait through the axon tunnel;
    returns the fetched value so callers can also use it as a checksum.
    """
    import jax
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(np.asarray(jax.device_get(leaf.ravel()[0])))


def timeit(fn, reps, *args):
    """(min_s, median_s) of ``fn(*args)`` over ``reps`` synced calls.

    The first (unmeasured) call absorbs compilation.
    """
    sync(fn(*args))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(*args))
        times.append(time.perf_counter() - t0)
    return float(np.min(times)), float(np.median(times))


def flagship_spec(**overrides):
    """The bench-scale flagship ArchSpec (6-stage, 256x256, 2ch, 24 labels)."""
    from __graft_entry__ import _flagship_spec
    kw = dict(out_channels=LABELS, in_channels=IN_CH, n_stages=N_STAGES)
    kw.update(overrides)
    return _flagship_spec(**kw)


def unet_flops(arch, h, w):
    """Conv FLOPs (mults*2) of ONE inference forward of ``arch`` at (h, w).

    Counts encoder + decoder + transpconvs + the final seg head only
    (inference uses one head) — the counter perf_probe.py's MFU figures
    were computed with.
    """
    total = 0
    sh, sw = h, w
    cin = arch.in_channels
    enc_hw = []
    for s in range(arch.n_stages):
        st = arch.strides[s]
        sh //= st[0]
        sw //= st[1]
        enc_hw.append((sh, sw))
        k = arch.kernel_sizes[s][0] * arch.kernel_sizes[s][1]
        for c in range(arch.n_conv_per_stage[s]):
            ci = cin if c == 0 else arch.features_per_stage[s]
            total += 2 * sh * sw * ci * arch.features_per_stage[s] * k
        cin = arch.features_per_stage[s]
    n_dec = arch.n_stages - 1
    for d in range(n_dec):
        enc_stage = n_dec - d
        hh, ww = enc_hw[enc_stage - 1]
        cbelow = arch.features_per_stage[enc_stage]
        cskip = arch.features_per_stage[enc_stage - 1]
        total += 2 * hh * ww * cbelow * cskip * 1  # transpconv (k=s)
        k = (arch.kernel_sizes[enc_stage - 1][0]
             * arch.kernel_sizes[enc_stage - 1][1])
        for c in range(arch.n_conv_per_stage_decoder[d]):
            ci = 2 * cskip if c == 0 else cskip
            total += 2 * hh * ww * ci * cskip * k
        total += 2 * hh * ww * cskip * arch.out_channels  # seg head
    return total


def flagship_train_flops(b):
    """Analytic forward FLOPs of one TRAINING batch of the flagship model
    (deep-supervision 1x1 heads at every decoder level included; training
    FLOPs are conventionally 3x this — backward ~2x forward)."""
    feats = tuple(min(32 * 2 ** i, 512) for i in range(N_STAGES))
    total = 0.0
    h = w = PATCH
    cin = IN_CH
    enc_hw = []
    for s, c in enumerate(feats):
        if s > 0:
            h //= 2
            w //= 2
        total += 2.0 * b * h * w * c * K * cin   # conv0
        total += 2.0 * b * h * w * c * K * c     # conv1
        enc_hw.append((h, w, c))
        cin = c
    for d in range(N_STAGES - 1):
        enc_stage = N_STAGES - 1 - d
        hb, wb, cb = enc_hw[enc_stage]
        hs, ws, cs = enc_hw[enc_stage - 1]
        total += 2.0 * b * hs * ws * cs * cb          # transpconv
        total += 2.0 * b * hs * ws * cs * K * 2 * cs  # conv0 (concat in)
        total += 2.0 * b * hs * ws * cs * K * cs      # conv1
        total += 2.0 * b * hs * ws * LABELS * cs      # deep-supervision head
    return total


def make_train_batch(rng, b):
    """A device-shaped random training batch for the flagship model."""
    return {
        'image': rng.standard_normal(
            (b, PATCH, PATCH, IN_CH)).astype(np.float32),
        'target': (rng.random((b, PATCH, PATCH, LABELS)) < 0.04
                   ).astype(np.float32),
    }
