"""Probe 25 — spatial warp as one-hot MATMULS (MXU) vs point gathers.

Probe 24 killed slice gathers (12x SLOWER: TPU lowers gather-of-slices
to serial dynamic slices) and capped the gather road at 1.2x (flat
take). This probe recasts the interpolation as matrix products so the
MXU does the data movement:

    out[p, c] = sum_i sum_j Ry[p, i] * Rx[p, j] * img[i, j, c]

where Ry/Rx are built on the fly as weighted one-hots of the (mirrored)
tap indices — 4 taps (order 3) / 2 taps (order 1) per row. Stage 1 is a
batched (CH x H) @ (H x W*C) matmul per pixel chunk; stage 2 a VPU
reduce. Mirror handling rides the one-hot build (_mirror_idx on tap
indices), so semantics match map_coordinates exactly; precision=HIGH
(bf16_3x) keeps error ~1e-6 against the fp32 point-gather path.

Also measured: M3 'row-take' (stage 1 via 4 full-row jnp.take gathers
instead of the matmul) and MP (bit-packed 24-channel one-hot target ->
4 uint32 point gathers + per-bit threshold).

Usage: python tools/train_probe4.py   (alone on the box)
"""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, '/root/repo')

B, H, W, C, L = 64, 256, 256, 2, 24
CH = 2048  # output-pixel chunk per matmul step


def main():
    import jax
    import jax.numpy as jnp

    from totalsegmentator2d_tpu.training import augment as A

    _bs = A._bspline3
    _mi = A._mirror_idx

    def tap_data(coords, order, shape):
        """Mirrored integer tap indices + weights, flattened over pixels.

        coords (B, 2, H, W) -> iy/ix (B, P, S) int32, wy/wx (B, P, S)."""
        Hh, Ww = shape
        y = coords[:, 0].reshape(B, -1)
        x = coords[:, 1].reshape(B, -1)
        y0 = jnp.floor(y).astype(jnp.int32)
        x0 = jnp.floor(x).astype(jnp.int32)
        if order == 3:
            rng_ = range(-1, 3)
            wy = jnp.stack([_bs(y - (y0 + d)) for d in rng_], -1)
            wx = jnp.stack([_bs(x - (x0 + d)) for d in rng_], -1)
        else:
            rng_ = range(0, 2)
            wy = jnp.stack([1.0 - (y - y0), y - y0], -1)
            wx = jnp.stack([1.0 - (x - x0), x - x0], -1)
        iy = jnp.stack([_mi(y0 + d, Hh) for d in rng_], -1)
        ix = jnp.stack([_mi(x0 + d, Ww) for d in rng_], -1)
        return iy, ix, wy, wx

    def warp_matmul(img_b, coords_b, order, precision):
        Bb, Hh, Ww, Cc = img_b.shape
        P = Hh * Ww
        iy, ix, wy, wx = tap_data(coords_b, order, (Hh, Ww))
        imgf = img_b.reshape(Bb, Hh, Ww * Cc)
        ii = jnp.arange(Hh, dtype=jnp.int32)
        jj = jnp.arange(Ww, dtype=jnp.int32)
        nch = P // CH

        def step(c0):
            sl = lambda a: jax.lax.dynamic_slice_in_dim(a, c0, CH, axis=1)
            iyc, ixc, wyc, wxc = sl(iy), sl(ix), sl(wy), sl(wx)
            Ry = jnp.zeros((Bb, CH, Hh), jnp.float32)
            Rx = jnp.zeros((Bb, CH, Ww), jnp.float32)
            for d in range(iyc.shape[-1]):
                Ry = Ry + wyc[..., d, None] * (
                    iyc[..., d, None] == ii).astype(jnp.float32)
                Rx = Rx + wxc[..., d, None] * (
                    ixc[..., d, None] == jj).astype(jnp.float32)
            tmp = jnp.einsum('bph,bhj->bpj', Ry, imgf, precision=precision)
            tmp = tmp.reshape(Bb, CH, Ww, Cc)
            return jnp.einsum('bpw,bpwc->bpc', Rx, tmp, precision=precision)

        outs = jax.lax.map(step, jnp.arange(nch) * CH)
        out = jnp.moveaxis(outs, 0, 1).reshape(Bb, P, Cc)
        return out.reshape(Bb, Hh, Ww, Cc)

    def warp_rowtake(img_b, coords_b, order):
        """Stage 1 via full-row gathers instead of the matmul."""
        Bb, Hh, Ww, Cc = img_b.shape
        P = Hh * Ww
        iy, ix, wy, wx = tap_data(coords_b, order, (Hh, Ww))
        imgf = img_b.reshape(Bb * Hh, Ww * Cc)
        boff = (jnp.arange(Bb, dtype=jnp.int32) * Hh)[:, None]
        nch = P // CH

        def step(c0):
            sl = lambda a: jax.lax.dynamic_slice_in_dim(a, c0, CH, axis=1)
            iyc, ixc, wyc, wxc = sl(iy), sl(ix), sl(wy), sl(wx)
            tmp = 0.0
            for d in range(iyc.shape[-1]):
                rows = jnp.take(imgf, (iyc[..., d] + boff).reshape(-1),
                                axis=0)
                tmp = tmp + rows.reshape(Bb, CH, Ww, Cc) * \
                    wyc[..., d, None, None]
            Rx = jnp.zeros((Bb, CH, Ww), jnp.float32)
            jj = jnp.arange(Ww, dtype=jnp.int32)
            for d in range(ixc.shape[-1]):
                Rx = Rx + wxc[..., d, None] * (
                    ixc[..., d, None] == jj).astype(jnp.float32)
            return jnp.einsum('bpw,bpwc->bpc', Rx, tmp)

        outs = jax.lax.map(step, jnp.arange(nch) * CH)
        out = jnp.moveaxis(outs, 0, 1).reshape(Bb, P, Cc)
        return out.reshape(Bb, Hh, Ww, Cc)

    def warp_packed(tgt_b, coords_b):
        """Bit-packed one-hot target, order 1 + 0.5 threshold, exact."""
        Bb, Hh, Ww, Ll = tgt_b.shape
        bits = (tgt_b > 0.5).astype(jnp.uint32)
        packed = jnp.zeros((Bb, Hh, Ww), jnp.uint32)
        for li in range(Ll):
            packed = packed | (bits[..., li] << li)
        iy, ix, wy, wx = tap_data(coords_b, 1, (Hh, Ww))
        flat = packed.reshape(Bb * Hh * Ww)
        boff = (jnp.arange(Bb, dtype=jnp.int32) * Hh * Ww)[:, None]
        lanes = jnp.arange(Ll, dtype=jnp.uint32)
        out = 0.0
        for dy in range(2):
            for dx in range(2):
                idx = boff + iy[..., dy] * Ww + ix[..., dx]
                v = jnp.take(flat, idx.reshape(-1), axis=0)
                tap = ((v[:, None] >> lanes) & 1).astype(jnp.float32)
                w = (wy[..., dy] * wx[..., dx]).reshape(-1)
                out = out + tap * w[:, None]
        return (out > 0.5).astype(jnp.float32).reshape(Bb, Hh, Ww, Ll)

    print('devices:', jax.devices(), file=sys.stderr)
    rng = np.random.default_rng(0)
    img = jax.device_put(rng.standard_normal((B, H, W, C)).astype(np.float32))
    tgt = jax.device_put((rng.random((B, H, W, L)) > 0.98).astype(np.float32))
    ang = jax.device_put(rng.uniform(-3, 3, (B,)).astype(np.float32))
    sc = jax.device_put(rng.uniform(0.8, 1.2, (B,)).astype(np.float32))

    def grid_b(a, s):
        return jax.vmap(lambda aa, ss: A.affine_grid((H, W), aa, ss))(a, s)

    def timed(name, fn, *args):
        f = jax.jit(fn)
        try:
            np.asarray(jax.tree_util.tree_leaves(f(*args))[0][:1, :4])
        except Exception as ex:
            print(f'{name:34s} FAILED {type(ex).__name__}: {str(ex)[:100]}',
                  flush=True)
            return None
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(jax.tree_util.tree_leaves(f(*args))[0][:1, :4])
            ts.append(time.perf_counter() - t0)
        t = float(np.median(ts)) * 1e3
        print(f'{name:34s} {t:8.1f} ms/batch  {t / B:6.3f} ms/patch',
              flush=True)
        return f

    f0 = timed('o3 img V1 current', lambda i, a, s: jax.vmap(
        lambda x, aa, ss: A.map_coordinates(
            x, A.affine_grid((H, W), aa, ss), 3, 'constant',
            prefiltered=True))(i, a, s), img, ang, sc)
    fm_hi = timed('o3 img matmul HIGH', lambda i, a, s: warp_matmul(
        i, grid_b(a, s), 3, jax.lax.Precision.HIGH), img, ang, sc)
    fm_def = timed('o3 img matmul DEFAULT', lambda i, a, s: warp_matmul(
        i, grid_b(a, s), 3, jax.lax.Precision.DEFAULT), img, ang, sc)
    fm_hst = timed('o3 img matmul HIGHEST', lambda i, a, s: warp_matmul(
        i, grid_b(a, s), 3, jax.lax.Precision.HIGHEST), img, ang, sc)
    fr = timed('o3 img row-take', lambda i, a, s: warp_rowtake(
        i, grid_b(a, s), 3), img, ang, sc)

    g0 = timed('o1 tgt24 V1 current', lambda t, a, s: jax.vmap(
        lambda x, aa, ss: A.map_coordinates(
            x, A.affine_grid((H, W), aa, ss), 1, 'constant'))(t, a, s),
        tgt, ang, sc)
    gm = timed('o1 tgt24 matmul HIGH', lambda t, a, s: warp_matmul(
        t, grid_b(a, s), 1, jax.lax.Precision.HIGH), tgt, ang, sc)
    gp = timed('o1 tgt24 packed-take', lambda t, a, s: warp_packed(
        t, grid_b(a, s)), tgt, ang, sc)

    cg = jax.jit(grid_b)
    co = np.asarray(cg(ang, sc))
    valid = ((co[:, 0] >= 0) & (co[:, 0] <= H - 1)
             & (co[:, 1] >= 0) & (co[:, 1] <= W - 1))
    r0 = np.asarray(f0(img, ang, sc))
    for name, f in [('matmul HIGH', fm_hi), ('matmul DEFAULT', fm_def),
                    ('matmul HIGHEST', fm_hst), ('row-take', fr)]:
        if f is None:
            continue
        r = np.asarray(f(img, ang, sc))
        print(f'o3 {name} max|d| valid: {np.abs(r - r0)[valid].max():.2e}',
              flush=True)
    s0 = np.asarray(g0(tgt, ang, sc))
    if gm is not None:
        r = np.asarray(gm(tgt, ang, sc))
        print(f'o1 matmul max|d| valid: {np.abs(r - s0)[valid].max():.2e}',
              flush=True)
    if gp is not None:
        rp = np.asarray(gp(tgt, ang, sc))
        ref = (s0 > 0.5).astype(np.float32)
        print(f'o1 packed thresholded mismatches on valid: '
              f'{int((np.abs(rp - ref) > 0)[valid].sum())}', flush=True)


if __name__ == '__main__':
    main()
