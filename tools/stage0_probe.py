"""Attack the enc0/dec4 realization gap: space-to-depth channel packing.

stage_bill.py (round 5) attributed the 2.3x XLA realization loss almost
entirely to the full-resolution, small-channel stages: enc0 measures
32.35 ms vs a 3.63 ms roofline (11%), dec4 11.1 vs 4.75 (43%). The
suspected cause is lane padding: C=32 (and C_in=2) activations occupy a
quarter (or less) of the TPU's 128-wide lane dimension, so every HBM
tile moves 4x the useful bytes and the VPU/MXU run quarter-filled.

The candidate fix is EXACT space-to-depth (s2d): fold each 2x2 spatial
block into channels — (M, H, W, C) -> (M, H/2, W/2, 4C) — and convolve
with structured kernels that reproduce the original 3x3 arithmetic
identically (a 3x3 conv in image space is a 3x3 conv in block space
whose (4C, 4C') kernel scatters the original taps; zero-padding maps to
zero-padding). 4x the nominal FLOPs (the structured kernel is 25%
dense), but the stages are memory-bound and the traffic stops being
lane-padded. InstanceNorm statistics group the 4 block positions per
original channel (same element set, different summation tree -> ~1e-7
relative drift, NOT bitwise).

Variants measured on the real chip at the enc0/dec4 shapes (M=64):
  A enc0 shipped            B enc0 1pass-stats       C enc0 conv+act only
  D norm-only (256,256,32)  E enc0 s2d (incl. input s2d inside program)
  F dec4 pair shipped       G dec4 pair s2d
plus an exactness check E-vs-A / G-vs-F (max |delta| fp32, M=4).

Usage: python tools/stage0_probe.py   (alone on the box; ONE JAX process)
"""

import sys

import numpy as np

sys.path.insert(0, '/root/repo')

from probelib import IN_CH, PATCH, sync, timeit, flagship_spec  # noqa: E402

M = 64
N_REPS = 8


def s2d(x):
    """(M, H, W, C) -> (M, H/2, W/2, 4C), block-position-major channels."""
    m, h, w, c = x.shape
    x = x.reshape(m, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(m, h // 2, w // 2, 4 * c)


def d2s(x):
    m, hh, ww, c4 = x.shape
    c = c4 // 4
    x = x.reshape(m, hh, ww, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(m, 2 * hh, 2 * ww, c)


def s2d_kernel(w):
    """(3,3,Ci,Co) HWIO -> (3,3,4Ci,4Co) block-space kernel, exact.

    Output block position (boi,boj) at block (I,J) is original pixel
    (2I+boi, 2J+boj); its tap (di,dj) reads original row 2I+boi+di-1 =
    2(I+Di)+bi, so the block-space kernel scatters w[di,dj] into
    (Di+1, Dj+1, (bi*2+bj)*Ci:, (boi*2+boj)*Co:). 25% dense.
    """
    kh, kw, ci, co = w.shape
    assert (kh, kw) == (3, 3)
    out = np.zeros((3, 3, 4 * ci, 4 * co), np.asarray(w).dtype)
    wn = np.asarray(w)
    for boi in range(2):
        for boj in range(2):
            for di in range(3):
                for dj in range(3):
                    ri, rj = boi + di - 1, boj + dj - 1
                    Di, bi = ri // 2 + 1, ri % 2
                    Dj, bj = rj // 2 + 1, rj % 2
                    p_in = bi * 2 + bj
                    p_out = boi * 2 + boj
                    out[Di, Dj, p_in * ci:(p_in + 1) * ci,
                        p_out * co:(p_out + 1) * co] = wn[di, dj]
    return out


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

    def blockf(x, p, cin_override=None):
        return unet._block(x, p, (1, 1), (3, 3), a, cdt)

    # ---- plain enc0 -----------------------------------------------------
    def enc0_plain(p, x):
        h = unet._block(x, p[0], (1, 1), (3, 3), a, cdt)
        h = unet._block(h, p[1], (1, 1), (3, 3), a, cdt)
        return h

    def enc0_convs_only(p, x):
        h = unet._conv(x, p[0]['conv']['w'], p[0]['conv'].get('b'),
                       (1, 1), (3, 3), cdt, out_dtype=cdt)
        h = unet._leaky_relu(h, a.nonlin_slope)
        h = unet._conv(h, p[1]['conv']['w'], p[1]['conv'].get('b'),
                       (1, 1), (3, 3), cdt, out_dtype=cdt)
        return unet._leaky_relu(h, a.nonlin_slope)

    def norm_only(x):
        return unet._instance_norm(x, None, None, a.norm_eps)

    # ---- s2d enc0 -------------------------------------------------------
    def in_group(x, scale, bias, eps, c_orig):
        """InstanceNorm with stats grouped over the 4 block positions."""
        m, hh, ww, c4 = x.shape
        x32 = x.astype(jnp.float32).reshape(m, hh, ww, 4, c_orig)
        mean = jnp.mean(x32, axis=(1, 2, 3), keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=(1, 2, 3), keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + eps)
        if scale is not None:
            y = y * scale
        if bias is not None:
            y = y + bias
        return y.reshape(m, hh, ww, c4).astype(x.dtype)

    w0s = jnp.asarray(s2d_kernel(enc0[0]['conv']['w']))
    w1s = jnp.asarray(s2d_kernel(enc0[1]['conv']['w']))
    b0 = enc0[0]['conv'].get('b')
    b1 = enc0[1]['conv'].get('b')
    b0s = None if b0 is None else jnp.tile(jnp.asarray(b0), 4)
    b1s = None if b1 is None else jnp.tile(jnp.asarray(b1), 4)
    c0 = enc0[0]['conv']['w'].shape[-1]
    c1 = enc0[1]['conv']['w'].shape[-1]

    def enc0_s2d(p, x):
        # s2d inside the program: the real network pays this once on the
        # tiny input and stays in block space through the full-res stages
        m, h, w, c = x.shape
        xs = x.reshape(m, h // 2, 2, w // 2, 2, c)
        xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(m, h // 2, w // 2, 4 * c)
        h1 = unet._conv(xs, w0s, b0s, (1, 1), (3, 3), cdt, out_dtype=cdt)
        n0 = p[0].get('norm') or {}
        h1 = in_group(h1, n0.get('scale'), n0.get('bias'), a.norm_eps, c0)
        h1 = unet._leaky_relu(h1, a.nonlin_slope)
        h2 = unet._conv(h1, w1s, b1s, (1, 1), (3, 3), cdt, out_dtype=cdt)
        n1 = p[1].get('norm') or {}
        h2 = in_group(h2, n1.get('scale'), n1.get('bias'), a.norm_eps, c1)
        return unet._leaky_relu(h2, a.nonlin_slope)

    # ---- dec4-like pair (64 -> 32 -> 32 at full res) ---------------------
    wd0 = jnp.asarray(rng.standard_normal((3, 3, 64, 32)).astype(np.float32)
                      * 0.05)
    wd1 = jnp.asarray(rng.standard_normal((3, 3, 32, 32)).astype(np.float32)
                      * 0.05)
    pd = [{'conv': {'w': wd0}, 'norm': {}}, {'conv': {'w': wd1}, 'norm': {}}]
    wd0s = jnp.asarray(s2d_kernel(wd0))
    wd1s = jnp.asarray(s2d_kernel(wd1))

    def dec4_plain(x):
        h = unet._block(x, pd[0], (1, 1), (3, 3), a, cdt)
        h = unet._block(h, pd[1], (1, 1), (3, 3), a, cdt)
        return h

    def dec4_s2d(xs):
        h = unet._conv(xs, wd0s, None, (1, 1), (3, 3), cdt, out_dtype=cdt)
        h = in_group(h, None, None, a.norm_eps, 32)
        h = unet._leaky_relu(h, a.nonlin_slope)
        h = unet._conv(h, wd1s, None, (1, 1), (3, 3), cdt, out_dtype=cdt)
        h = in_group(h, None, None, a.norm_eps, 32)
        return unet._leaky_relu(h, a.nonlin_slope)

    # ---- measure ---------------------------------------------------------
    import os
    x = jax.device_put(rng.standard_normal(
        (M, PATCH, PATCH, IN_CH)).astype(np.float32).astype(jnp.bfloat16))
    x32ch = jax.device_put(rng.standard_normal(
        (M, PATCH, PATCH, 32)).astype(np.float32).astype(jnp.bfloat16))
    x64ch = jax.device_put(rng.standard_normal(
        (M, PATCH, PATCH, 64)).astype(np.float32).astype(jnp.bfloat16))
    x64s = jax.device_put(jnp.asarray(s2d(np.asarray(x64ch))))

    runs = [
        ('A enc0 shipped', jax.jit(enc0_plain), (enc0, x)),
        ('C enc0 conv+act only', jax.jit(enc0_convs_only), (enc0, x)),
        ('D norm-only (256,256,32)', jax.jit(norm_only), (x32ch,)),
        ('E enc0 s2d', jax.jit(enc0_s2d), (enc0, x)),
        ('F dec4 pair shipped', jax.jit(dec4_plain), (x64ch,)),
        ('G dec4 pair s2d', jax.jit(dec4_s2d), (x64s,)),
    ]
    for name, fn, args in runs:
        best, med = timeit(fn, N_REPS, *args)
        print(f'{name:28s} best {best*1e3:8.2f} ms   med {med*1e3:8.2f} ms',
              flush=True)

    os.environ['TS2D_STATS'] = '1pass'
    best, med = timeit(jax.jit(lambda p, xx: enc0_plain(p, xx)), N_REPS,
                       enc0, x)
    print(f'{"B enc0 1pass":28s} best {best*1e3:8.2f} ms   med '
          f'{med*1e3:8.2f} ms', flush=True)
    del os.environ['TS2D_STATS']

    # ---- exactness (M=4, fp32 compare) ------------------------------------
    x4 = jax.device_put(np.asarray(x[:4]).astype(np.float32)).astype(cdt)
    ya = np.asarray(jax.jit(enc0_plain)(enc0, x4)).astype(np.float32)
    ye = d2s(np.asarray(jax.jit(enc0_s2d)(enc0, x4)).astype(np.float32))
    print(f'enc0 s2d-vs-plain: max|d| {np.abs(ya - ye).max():.3e}  '
          f'rms {np.sqrt(np.mean((ya - ye) ** 2)):.3e}')
    x4d = jax.device_put(np.asarray(x64ch[:4]).astype(np.float32)).astype(cdt)
    yf = np.asarray(jax.jit(dec4_plain)(x4d)).astype(np.float32)
    yg = d2s(np.asarray(jax.jit(dec4_s2d)(
        jnp.asarray(s2d(np.asarray(x4d))))).astype(np.float32))
    print(f'dec4 s2d-vs-plain: max|d| {np.abs(yf - yg).max():.3e}  '
          f'rms {np.sqrt(np.mean((yf - yg) ** 2)):.3e}')


if __name__ == '__main__':
    main()
