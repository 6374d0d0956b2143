"""Clean re-measurement of the full-res stages: slope method.

stage0_probe.py's first run exposed two artifacts that also invalidate
stage_bill.py's enc0 attribution:
  1. a large per-program-execution overhead through the relay (every
     variant clustered at 29-41 ms, even a bare InstanceNorm), which the
     stage bill's FIRST prefix row (enc0) absorbed entirely because
     differencing only cancels it for later rows;
  2. the ravel()[0] sync idiom costs a full output materialization whose
     price depends on the output's layout (lane-padded C=32 vs packed
     C=128), polluting cross-variant comparisons.

Method here:
  - every program folds its output to ONE fp32 scalar (jnp.sum) inside
    the jit; sync fetches that scalar (4 bytes, no reshape program).
  - a null program (scalar add) measures the pure dispatch+fetch floor.
  - each stage variant is measured at K = 1, 2, 4, 8 in-program
    repetitions (lax.fori_loop carrying the activation); the fitted
    slope is the true per-iteration device cost, the intercept is
    overhead. Repetition feeds the output back through a cheap channel
    slice so shapes close.

Variants: enc0 plain / enc0 s2d / norm-only plain / norm-only grouped
(s2d layout) / dec4 pair plain / dec4 pair s2d.

Usage: python tools/stage0_probe2.py   (alone on the box; ONE JAX process)
"""

import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')

from probelib import IN_CH, PATCH, flagship_spec  # noqa: E402
from stage0_probe import s2d, s2d_kernel  # noqa: E402

M = 64
N_REPS = 6
KS = (1, 2, 4, 8)


def main():
    import jax
    import jax.numpy as jnp
    from totalsegmentator2d_tpu.models import unet

    print('devices:', jax.devices(), file=sys.stderr)
    spec = flagship_spec()
    a = spec
    params = unet.init_params_np(0, spec)
    enc0 = params['encoder']['stages'][0]
    rng = np.random.default_rng(0)
    cdt = jnp.bfloat16

    def fetch(x):
        return float(np.asarray(jax.device_get(x)))

    def timeit_scalar(jfn, *args):
        fetch(jfn(*args))  # compile
        ts = []
        for _ in range(N_REPS):
            t0 = time.perf_counter()
            fetch(jfn(*args))
            ts.append(time.perf_counter() - t0)
        return float(np.min(ts))

    # ---- null program: dispatch + fetch floor -----------------------------
    one = jax.device_put(np.float32(1.0))
    null = jax.jit(lambda s: s + 1.0)
    t_null = timeit_scalar(null, one)
    print(f'null program: {t_null*1e3:8.2f} ms  (dispatch+fetch floor)',
          flush=True)

    # ---- stage bodies ------------------------------------------------------
    w0s = jnp.asarray(s2d_kernel(enc0[0]['conv']['w']))
    w1s = jnp.asarray(s2d_kernel(enc0[1]['conv']['w']))
    c0 = enc0[0]['conv']['w'].shape[-1]

    def in_group(x, eps, c_orig):
        m, hh, ww, c4 = x.shape
        xg = x.astype(jnp.float32).reshape(m, hh, ww, 4, c_orig)
        mean = jnp.mean(xg, axis=(1, 2, 3), keepdims=True)
        var = jnp.mean(jnp.square(xg - mean), axis=(1, 2, 3), keepdims=True)
        y = (xg - mean) * jax.lax.rsqrt(var + eps)
        return y.reshape(m, hh, ww, c4).astype(x.dtype)

    def enc0_plain_body(h2ch):
        h = unet._block(h2ch, enc0[0], (1, 1), (3, 3), a, cdt)
        h = unet._block(h, enc0[1], (1, 1), (3, 3), a, cdt)
        return h[..., :IN_CH]  # close the loop: 2ch view feeds the next rep

    def enc0_s2d_body(h8ch):
        h = unet._conv(h8ch, w0s, None, (1, 1), (3, 3), cdt, out_dtype=cdt)
        h = in_group(h, a.norm_eps, c0)
        h = unet._leaky_relu(h, a.nonlin_slope)
        h = unet._conv(h, w1s, None, (1, 1), (3, 3), cdt, out_dtype=cdt)
        h = in_group(h, a.norm_eps, c0)
        h = unet._leaky_relu(h, a.nonlin_slope)
        return h[..., :4 * IN_CH]

    def norm_plain_body(h32):
        return unet._instance_norm(h32, None, None, a.norm_eps)

    def norm_group_body(h128):
        return in_group(h128, a.norm_eps, 32)

    wd0 = jnp.asarray(
        rng.standard_normal((3, 3, 64, 32)).astype(np.float32) * 0.05)
    wd1 = jnp.asarray(
        rng.standard_normal((3, 3, 32, 32)).astype(np.float32) * 0.05)
    wdp = jnp.asarray(
        rng.standard_normal((3, 3, 32, 64)).astype(np.float32) * 0.05)
    pd = [{'conv': {'w': wd0}, 'norm': {}}, {'conv': {'w': wd1}, 'norm': {}}]
    wd0s = jnp.asarray(s2d_kernel(wd0))
    wd1s = jnp.asarray(s2d_kernel(wd1))
    wdps = jnp.asarray(s2d_kernel(wdp))

    def dec4_plain_body(h64):
        h = unet._block(h64, pd[0], (1, 1), (3, 3), a, cdt)
        h = unet._block(h, pd[1], (1, 1), (3, 3), a, cdt)
        # widen back to 64 ch so the loop closes (cheap 3x3, counted —
        # identical in both variants)
        return unet._conv(h, wdp, None, (1, 1), (3, 3), cdt, out_dtype=cdt)

    def dec4_s2d_body(h256):
        h = unet._conv(h256, wd0s, None, (1, 1), (3, 3), cdt, out_dtype=cdt)
        h = in_group(h, a.norm_eps, 32)
        h = unet._leaky_relu(h, a.nonlin_slope)
        h = unet._conv(h, wd1s, None, (1, 1), (3, 3), cdt, out_dtype=cdt)
        h = in_group(h, a.norm_eps, 32)
        h = unet._leaky_relu(h, a.nonlin_slope)
        return unet._conv(h, wdps, None, (1, 1), (3, 3), cdt, out_dtype=cdt)

    # ---- inputs ------------------------------------------------------------
    x2 = rng.standard_normal((M, PATCH, PATCH, IN_CH)).astype(np.float32)
    x2j = jax.device_put(x2.astype(np.float32)).astype(cdt)
    x8j = jax.device_put(np.ascontiguousarray(s2d(x2))).astype(cdt)
    x32j = jax.device_put(rng.standard_normal(
        (M, PATCH, PATCH, 32)).astype(np.float32)).astype(cdt)
    x128j = jax.device_put(np.ascontiguousarray(s2d(np.asarray(
        rng.standard_normal((M, PATCH, PATCH, 32), ).astype(
            np.float32))))).astype(cdt)
    x64 = rng.standard_normal((M, PATCH, PATCH, 64)).astype(np.float32)
    x64j = jax.device_put(x64).astype(cdt)
    x256j = jax.device_put(np.ascontiguousarray(s2d(x64))).astype(cdt)

    cases = [
        ('enc0 plain', enc0_plain_body, x2j),
        ('enc0 s2d', enc0_s2d_body, x8j),
        ('norm plain (256,256,32)', norm_plain_body, x32j),
        ('norm grouped (128,128,128)', norm_group_body, x128j),
        ('dec4 plain (+64ch widen)', dec4_plain_body, x64j),
        ('dec4 s2d (+64ch widen)', dec4_s2d_body, x256j),
    ]

    for name, body, x0 in cases:
        times = []
        for k in KS:
            def prog(xx, _k=k, _body=body):
                h = jax.lax.fori_loop(
                    0, _k, lambda i, hh: _body(hh).astype(xx.dtype), xx)
                return jnp.sum(h.astype(jnp.float32))
            t = timeit_scalar(jax.jit(prog), x0)
            times.append(t)
        ks = np.asarray(KS, np.float64)
        ts = np.asarray(times, np.float64)
        slope, intercept = np.polyfit(ks, ts, 1)
        print(f'{name:28s} slope {slope*1e3:7.2f} ms/iter   intercept '
              f'{intercept*1e3:7.2f} ms   raw '
              f'{[round(t*1e3, 1) for t in times]}', flush=True)


if __name__ == '__main__':
    main()
