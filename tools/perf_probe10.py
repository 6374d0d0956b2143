"""Probe 10 — InstanceNorm epilogue headroom (VERDICT round-2, item 1).

Measures, on the real chip at the bench's working shapes, how much of a
U-Net stage's time InstanceNorm actually costs under XLA's schedule, and
whether cheap restructurings close it:

  a. chain: conv3x3 -> IN -> lrelu (x2 blocks)   — current implementation
  b. conv-only chain (norm+act deleted)           — the ceiling for ANY
     norm fusion: no kernel can beat removing the passes entirely
  c. one-pass stats: var = E[x^2] - E[x]^2 so the stats reduction reads x
     once instead of twice (two fused reductions over one read)
  d. (when present) the Pallas fused block from ops/pallas/fused_block.py

Timing through the tunnel: block_until_ready returns early, so each run is
synchronized by fetching a scalar that depends on the output
(tools/perf_probe.py convention); min over repeats.
"""

import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')

import os

# these probes decompose the PLAIN mask wire; the compacted wire
# (round 4, default on) returns (buf, occ) tuples from the raw
# programs and has its own probes (perf_probe19/20)
os.environ.setdefault('TS2D_COMPACT', '0')

import jax
import jax.numpy as jnp

SHAPES = [
    # (batch, H, W, Cin, Cout) — the bench program's stage working set:
    # tilexTTA batch 16 per scan (cap 64), 8-scan micro-batch
    (64, 256, 256, 32, 32),
    (64, 128, 128, 64, 64),
    (64, 64, 64, 128, 128),
    (16, 256, 256, 32, 32),
]
EPS = 1e-5


def sync(x):
    return float(jnp.sum(x[..., 0, 0]))


def timed(fn, *args, n=6):
    fn(*args)  # compile
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def block(x, w, b, g, be, mode):
    # measured and rejected (2026-08-17, v5e): 'hier-stats' and
    # 'split-stats' below — restructuring the spatial reduce (hierarchical
    # reshape / explicit W-then-H split) is within noise of the plain
    # two-pass at the dominant shapes (256^2C32: 6.42 -> 6.06/6.21 ms,
    # 0.94/0.97x; 128^2C64: 0.93/0.94x); only the cheap 64^2C128 stage
    # improved (0.64x of a 0.46 ms block). The cost is the serialization on
    # the statistics, not the reduce emitter's op shape.
    # measured and rejected (2025-08-17): 'pl-stats' (standalone Pallas
    # stats kernel: 18.2/3.0/0.6/2.9 ms per block top-to-bottom shape —
    # XLA<->Mosaic layout conversion per call eats the win) and 'mm-stats'
    # (ones-matmul reduction behind an optimization_barrier: 11.9/4.0 ms —
    # the M=1 matmul is slower than XLA's reduce; without the barrier the
    # simplifier folds it back into that reduce). Kept out of the mode
    # list; the winning path is the all-Pallas fused stack ('pl-chain').
    if mode == 'hier-stats':
        # hierarchical reduce: reshape (N,H,W,C)->(N,HW/G,G,C), reduce the
        # middle dims in two steps — probing whether XLA's slow spatial
        # reduce is an emitter choice that a different op shape fixes
        from totalsegmentator2d_tpu.ops.pallas.fused_block import fold_stats
        out = jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=jnp.bfloat16) + b.astype(jnp.bfloat16)
        N, H, W, C = out.shape
        G = 256
        r = out.astype(jnp.float32).reshape(N, (H * W) // G, G, C)
        p1 = jnp.sum(r, axis=2)
        p2 = jnp.sum(r * r, axis=2)
        st = jnp.stack([jnp.sum(p1, axis=1), jnp.sum(p2, axis=1)], axis=1)
        sc, sh = fold_stats(st, H * W, g, be, EPS)
        y = out.astype(jnp.float32) * sc[:, None, None, :] \
            + sh[:, None, None, :]
        y = jnp.where(y >= 0, y, y * 0.01)
        return y.astype(jnp.bfloat16)
    if mode == 'split-stats':
        # explicit two-step spatial reduce (W first, then H) — same probe
        # as hier-stats but without the reshape, in case the reshape
        # itself defeats the emitter choice
        from totalsegmentator2d_tpu.ops.pallas.fused_block import fold_stats
        out = jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=jnp.bfloat16) + b.astype(jnp.bfloat16)
        N, H, W, C = out.shape
        o32 = out.astype(jnp.float32)
        p1 = jnp.sum(o32, axis=2)
        p2 = jnp.sum(o32 * o32, axis=2)
        st = jnp.stack([jnp.sum(p1, axis=1), jnp.sum(p2, axis=1)], axis=1)
        sc, sh = fold_stats(st, H * W, g, be, EPS)
        y = o32 * sc[:, None, None, :] + sh[:, None, None, :]
        y = jnp.where(y >= 0, y, y * 0.01)
        return y.astype(jnp.bfloat16)
    if mode == 'pl-chain':
        from totalsegmentator2d_tpu.models.plans import ArchSpec
        from totalsegmentator2d_tpu.models import unet as U
        C = x.shape[-1]
        spec = ArchSpec(n_stages=1, features_per_stage=(C,),
                        kernel_sizes=((3, 3),), strides=((1, 1),),
                        n_conv_per_stage=(2,), n_conv_per_stage_decoder=(),
                        in_channels=C, out_channels=1)
        blocks = [{'conv': {'w': w, 'b': b},
                   'norm': {'scale': g, 'bias': be}}] * 2
        return U._conv_stack_fused(x, blocks, (1, 1), spec)
    out = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=jnp.bfloat16) + b.astype(jnp.bfloat16)
    if mode == 'conv':
        return out
    x32 = out.astype(jnp.float32)
    if mode == 'two-pass':
        mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=(1, 2), keepdims=True)
    else:  # one-pass
        mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
        meansq = jnp.mean(jnp.square(x32), axis=(1, 2), keepdims=True)
        var = jnp.maximum(meansq - jnp.square(mean), 0.0)
    y = (x32 - mean) * jax.lax.rsqrt(var + EPS) * g + be
    y = jnp.where(y >= 0, y, y * 0.01)
    return y.astype(jnp.bfloat16)


# a 2-block chain is dispatch-latency-dominated through the tunnel
# (~10-20 ms RPC per sync); amplify to NB blocks inside ONE program so the
# per-block compute dominates, and report per-block time
NB = 16


def chain(mode, n_blocks=NB):
    @jax.jit
    def fn(x, w, b, g, be):
        h = x
        for _ in range(n_blocks):
            h = block(h, w, b, g, be, mode)
        return h
    return fn


def main():
    print(f'devices: {jax.devices()}', file=sys.stderr)
    noop = timed(jax.jit(lambda x: x * 1.0), jnp.zeros((8, 8, 8, 8)))
    print(f'dispatch+sync baseline: {noop * 1e3:.2f} ms')
    for (B, H, W, Ci, Co) in SHAPES:
        rng = np.random.default_rng(0)
        x = jax.device_put(rng.standard_normal((B, H, W, Ci)).astype(np.float32)).astype(jnp.bfloat16)
        w = jax.device_put(rng.standard_normal((3, 3, Ci, Co)).astype(np.float32) * 0.05).astype(jnp.bfloat16)
        b = jax.device_put(np.zeros(Co, np.float32))
        g = jax.device_put(np.ones(Co, np.float32))
        be = jax.device_put(np.zeros(Co, np.float32))

        res = {}
        for mode in ('two-pass', 'conv', 'hier-stats', 'split-stats'):
            t = (timed(chain(mode), x, w, b, g, be) - noop) / NB
            if mode == 'pl-chain':
                t /= 2  # each pl-chain iteration is a 2-block stack
            res[mode] = t

        # unit comparison (kept for the record; measured 2025-08-17:
        # xla-unit ~= conv — folded normalize+act is FREE under XLA fusion;
        # pl-unit (fused norm+act+conv+stats kernel) 1.7-2.6x vs two-pass
        # at the 256^2/128^2 shapes). Re-enable with --units.
        if '--units' in sys.argv:
            from totalsegmentator2d_tpu.ops.pallas.fused_block import (
                fused_norm_act_conv, reference)
            scale = jax.device_put(np.ones((B, Ci), np.float32))
            shift = jax.device_put(np.zeros((B, Ci), np.float32))

            @jax.jit
            def xla_unit(x, scale, shift, w, b):
                h = x
                for _ in range(NB):
                    h, _ = reference(h, scale, shift, w, b)
                return h

            @jax.jit
            def pl_unit(x, scale, shift, w, b):
                h = x
                for _ in range(NB):
                    h, _ = fused_norm_act_conv(h, scale, shift, w, b)
                return h

            res['xla-unit'] = (timed(xla_unit, x, scale, shift, w, b)
                               - noop) / NB
            try:
                res['pl-unit'] = (timed(pl_unit, x, scale, shift, w, b)
                                  - noop) / NB
            except Exception as ex:
                print(f'  pallas failed: {type(ex).__name__}: {ex}',
                      file=sys.stderr)
        base = res['two-pass']
        line = ' '.join(f'{k}={v * 1e3:6.2f}ms({v / base:4.2f}x)'
                        for k, v in res.items())
        gb = B * H * W * max(Ci, Co) * 2 / 1e9  # bf16 activation/block
        print(f'B{B} {H}x{W} C{Ci}->{Co}: {line}  '
              f'[IN cost {(base - res["conv"]) / base:5.1%}, '
              f'act GB/block {gb:.2f}]')


if __name__ == '__main__':
    main()
