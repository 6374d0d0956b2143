"""Probe 15 — int8 inference headroom (round-3 session 3).

Question: does an int8 conv path beat the production bf16 path at the
bench's working shapes, given that

  - TPU v5e's MXU runs int8 at 2x the bf16 rate, and
  - int8 activations halve HBM traffic in the bandwidth-bound top stages,
  - InstanceNorm is per-channel scale-invariant (IN(a_c x) = IN(x), a_c>0)
    and LeakyReLU positively homogeneous, so the dequant multiplies cancel
    inside every block: the int32 conv accumulator can feed the IN stats
    directly; only the conv bias needs rescaling into accumulator units,
    and the quantize step is one round/clamp fused into the act epilogue.

Modes per shape:
  conv-bf16    conv3x3 bf16 operands, bf16 out      (production conv cost)
  conv-int8    conv3x3 int8 operands, int32 out     (MXU int8 ceiling)
  block-bf16   conv + IN + lrelu (production block)
  block-int8   quant(act) + conv int8 + IN-over-acc + lrelu
               (what the quantized engine's inner block would run)

Timing through the tunnel: sync by fetching a scalar that depends on the
output (tools/perf_probe.py convention); min over repeats; NB-block chains
inside one program so per-block compute dominates dispatch latency.
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
    # (batch, H, W, Cin, Cout) — bench program stage working set
    (64, 256, 256, 32, 32),
    (64, 128, 128, 64, 64),
    (64, 64, 64, 128, 128),
    (16, 256, 256, 32, 32),
]
EPS = 1e-5
NB = 16
ACT_SCALE = 127.0 / 6.0  # post-IN+lrelu activations are ~unit-variance


def sync(x):
    return float(jnp.sum(x[..., 0, 0].astype(jnp.float32)))


def timed(fn, *args, n=6):
    fn(*args)  # compile
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def _conv(x, w, out_dtype):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=out_dtype)


def _in_lrelu(x32, g, be):
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=(1, 2), keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + EPS) * g + be
    return jnp.where(y >= 0, y, y * 0.01)


def block(h, wq, wb, b, g, be, mode):
    if mode == 'conv-bf16':
        return _conv(h.astype(jnp.bfloat16), wb, jnp.bfloat16)
    if mode == 'conv-int8':
        q = jnp.clip(jnp.round(h.astype(jnp.float32) * ACT_SCALE),
                     -127, 127).astype(jnp.int8) if h.dtype != jnp.int8 else h
        return _conv(q, wq, jnp.int32)
    if mode == 'block-bf16':
        out = _conv(h.astype(jnp.bfloat16), wb, jnp.bfloat16) \
            + b.astype(jnp.bfloat16)
        return _in_lrelu(out.astype(jnp.float32), g, be).astype(jnp.bfloat16)
    if mode == 'block-int8':
        # h arrives int8 (previous block's quantized output); conv in int8,
        # IN eats the scale factors, requantize on the way out.
        acc = _conv(h, wq, jnp.int32).astype(jnp.float32) + b  # b pre-scaled
        y = _in_lrelu(acc, g, be)
        return jnp.clip(jnp.round(y * ACT_SCALE), -127, 127).astype(jnp.int8)
    raise ValueError(mode)


def chain(mode):
    @jax.jit
    def fn(h, wq, wb, b, g, be):
        if mode in ('conv-int8', 'block-int8'):
            h = jnp.clip(jnp.round(h.astype(jnp.float32) * ACT_SCALE),
                         -127, 127).astype(jnp.int8)
        for _ in range(NB):
            h = block(h, wq, wb, b, g, be, mode)
        return h
    return fn


def main():
    print(f'devices: {jax.devices()}', file=sys.stderr)
    noop = timed(jax.jit(lambda x: x * 1.0), jnp.zeros((8, 8, 8, 8)))
    print(f'dispatch+sync baseline: {noop * 1e3:.2f} ms')
    for (B, H, W, Ci, Co) in SHAPES:
        if Ci != Co:
            continue
        rng = np.random.default_rng(0)
        x = jax.device_put(
            rng.standard_normal((B, H, W, Ci)).astype(np.float32))
        x = x.astype(jnp.bfloat16)
        wf = rng.standard_normal((3, 3, Ci, Co)).astype(np.float32) * 0.05
        wb = jax.device_put(wf).astype(jnp.bfloat16)
        # per-output-channel weight quantization
        wscale = 127.0 / np.maximum(np.abs(wf).max(axis=(0, 1, 2)), 1e-8)
        wq = jax.device_put(
            np.clip(np.round(wf * wscale), -127, 127).astype(np.int8))
        b = jax.device_put(np.zeros(Co, np.float32))
        g = jax.device_put(np.ones(Co, np.float32))
        be = jax.device_put(np.zeros(Co, np.float32))

        res = {}
        for mode in ('conv-bf16', 'conv-int8', 'block-bf16', 'block-int8'):
            try:
                res[mode] = (timed(chain(mode), x, wq, wb, b, g, be)
                             - noop) / NB
            except Exception as ex:
                print(f'  {mode} failed: {type(ex).__name__}: {ex}',
                      file=sys.stderr)
                res[mode] = float('nan')
        base = res['block-bf16']
        line = ' '.join(f'{k}={v * 1e3:6.2f}ms({v / base:4.2f}x)'
                        for k, v in res.items())
        print(f'B{B} {H}x{W} C{Ci}->{Co}: {line}')


if __name__ == '__main__':
    main()
