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


def chain(mode, n_blocks=2):
    @jax.jit
    def fn(x, w, b, g, be):
        h = x
        for _ in range(n_blocks):
            h = block(h, w, b, g, be, mode)
        return h
    return fn


def main():
    print(f'devices: {jax.devices()}', file=sys.stderr)
    for (B, H, W, Ci, Co) in SHAPES:
        rng = np.random.default_rng(0)
        x = jax.device_put(rng.standard_normal((B, H, W, Ci)).astype(np.float32)).astype(jnp.bfloat16)
        w = jax.device_put(rng.standard_normal((3, 3, Ci, Co)).astype(np.float32) * 0.05).astype(jnp.bfloat16)
        b = jax.device_put(np.zeros(Co, np.float32))
        g = jax.device_put(np.ones(Co, np.float32))
        be = jax.device_put(np.zeros(Co, np.float32))

        res = {}
        for mode in ('two-pass', 'conv', 'one-pass'):
            res[mode] = timed(chain(mode), x, w, b, g, be)

        # unit comparison: normalize+act+conv+stats as XLA ops vs the fused
        # Pallas kernel (the exact work the kernel replaces per block)
        from totalsegmentator2d_tpu.ops.pallas.fused_block import (
            fused_norm_act_conv, reference)
        scale = jax.device_put(np.ones((B, Ci), np.float32))
        shift = jax.device_put(np.zeros((B, Ci), np.float32))
        res['xla-unit'] = timed(
            jax.jit(lambda *a: reference(*a)[0]), x, scale, shift, w, b)
        try:
            res['pl-unit'] = timed(
                lambda *a: fused_norm_act_conv(*a)[0],
                x, scale, shift, w, b)
        except Exception as ex:
            print(f'  pallas failed: {type(ex).__name__}: {ex}',
                  file=sys.stderr)
        base = res['two-pass']
        line = ' '.join(f'{k}={v * 1e3:7.2f}ms({v / base:4.2f}x)'
                        for k, v in res.items())
        gb = 2 * B * H * W * max(Ci, Co) * 2 / 1e9  # bf16 activation, 2 blocks
        print(f'B{B} {H}x{W} C{Ci}->{Co}: {line}  '
              f'[IN cost {(base - res["conv"]) / base:5.1%}, '
              f'act GB/chain {gb:.2f}]')


if __name__ == '__main__':
    main()
