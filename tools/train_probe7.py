"""Probe 28 — attack the two remaining warp costs (probe 27's bill).

Probe 27 (train_probe6.py) billed the 5.3 ms/patch augment cost:
warp_onehot 3.18 (4 scalarized point gathers), warp_image 2.37
(fp32-HIGHEST einsums), everything else noise. Variants measured here,
each vmapped over b64 at the training patch shape:

 warp_onehot:
  - baseline: 4 point gathers of (P,) words
  - quad: ONE gather of (P, 4*nw) from a precomputed 2x2-neighborhood
    array Q[y,x] = (T[y,x], T[y,xn], T[yn,x], T[yn,xn]) with static
    mirror-neighbor permutations xn/yn. Exactness argument: the quad
    components can only differ from the exact mirror-folded taps when
    that tap's bilinear weight is exactly 0 (fractional part 0 at the
    edge) or the output pixel is masked by mode='constant' — so the
    accumulated sum is bit-identical.
  - quad+wide(k): gather k-pixel rows (P, k*4*nw) and select the lane
    with an exact integer one-hot sum — fewer, wider gathers.

 warp_image:
  - einsum precision HIGHEST (baseline) / HIGH / DEFAULT, with max-abs
    error vs the HIGHEST result
  - _WARP_CHUNK 2048 (baseline) vs 4096

Usage: python tools/train_probe7.py   (alone on the box; ONE JAX process)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from train_probe import PATCH, LABELS, IN_CH  # noqa: E402

B = 64
N_REPS = 6


def _measure(fn, args, results, name, extra=None):
    import jax
    jfn = jax.jit(fn)
    out = jfn(jax.random.PRNGKey(0), *args)
    first = out[0] if isinstance(out, (tuple, list)) else out
    np.asarray(first[:1, :2])
    times = []
    for i in range(N_REPS):
        t0 = time.perf_counter()
        out = jfn(jax.random.PRNGKey(i + 1), *args)
        first = out[0] if isinstance(out, (tuple, list)) else out
        np.asarray(first[:1, :2])
        times.append(time.perf_counter() - t0)
    t = float(np.median(times))
    results[name] = {'ms_per_batch': round(t * 1e3, 2),
                     'ms_per_patch': round(t * 1e3 / B, 3)}
    if extra:
        results[name].update(extra)
    print(f'{name}: {results[name]}', flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from totalsegmentator2d_tpu.training import augment as A

    print('devices:', jax.devices(), file=sys.stderr)
    rng = np.random.default_rng(0)
    img = jax.device_put(rng.standard_normal(
        (B, PATCH, PATCH, IN_CH)).astype(np.float32))
    tgt = jax.device_put((rng.random(
        (B, PATCH, PATCH, LABELS)) > 0.98).astype(np.uint8))
    results = {}

    def coords_of(k, shape):
        ang = jax.random.uniform(k, (), minval=-3.14, maxval=3.14)
        return A.affine_grid(shape, ang, 1.1)

    # ---- warp_onehot variants -------------------------------------------
    def pack_words(target):
        H, W, L = target.shape
        bits = (target > 0).astype(jnp.uint32)
        words = []
        for w0 in range(0, L, 32):
            chunk = bits[..., w0:w0 + 32]
            shifts = jnp.arange(chunk.shape[-1], dtype=jnp.uint32)
            words.append(jnp.sum(chunk << shifts, axis=-1, dtype=jnp.uint32))
        return jnp.stack(words, axis=-1)  # (H, W, nw)

    def quad_pack(target):
        H, W, _ = target.shape
        p = pack_words(target)                    # (H, W, nw)
        xn = A._mirror_idx(jnp.arange(W) + 1, W)  # static permutations
        yn = A._mirror_idx(jnp.arange(H) + 1, H)
        px = p[:, xn]
        q = jnp.concatenate([p, px, p[yn], px[yn]], axis=-1)  # (H, W, 4nw)
        return q

    def onehot_quad(target, coords, k_wide=0):
        H, W, L = target.shape
        nw = -(-L // 32)
        Ho, Wo = coords.shape[1], coords.shape[2]
        P = Ho * Wo
        q = quad_pack(target).reshape(H * W, 4 * nw)
        iy, ix, wy, wx = A._tap_data(coords, 1, (H, W))
        idx = iy[:, 0] * W + ix[:, 0]
        if k_wide:
            rows = q.reshape(H * W // k_wide, k_wide * 4 * nw)
            got = jnp.take(rows, idx // k_wide, axis=0)
            got = got.reshape(P, k_wide, 4 * nw)
            lane = (idx % k_wide)[:, None]
            sel = (lane == jnp.arange(k_wide)[None, :]).astype(jnp.uint32)
            taps = jnp.sum(got * sel[..., None], axis=1)  # exact: others 0
        else:
            taps = jnp.take(q, idx, axis=0)               # (P, 4nw)
        taps = taps.reshape(P, 4, nw)
        lanes = jnp.arange(32, dtype=jnp.uint32)
        w = jnp.stack([wy[:, 0] * wx[:, 0], wy[:, 0] * wx[:, 1],
                       wy[:, 1] * wx[:, 0], wy[:, 1] * wx[:, 1]], axis=1)
        acc = 0.0
        for t in range(4):  # exact map_coordinates term order
            bit = ((taps[:, t, :, None] >> lanes) & 1).astype(jnp.float32)
            acc = acc + bit * w[:, t, None, None]
        out = (acc > 0.5).reshape(P, nw * 32)[:, :L].reshape(Ho, Wo, L)
        y, x = coords[0], coords[1]
        valid = (y >= 0) & (y <= H - 1) & (x >= 0) & (x <= W - 1)
        return jnp.where(valid[..., None], out, False)

    def vpair(f):
        def g(key, t):
            ks = jax.random.split(key, B)
            return jax.vmap(lambda kk, tt: f(tt, coords_of(kk, tt.shape[:2]))
                            )(ks, t)
        return g

    _measure(vpair(A.warp_onehot), (tgt,), results, 'onehot baseline')
    _measure(vpair(lambda t, c: onehot_quad(t, c)), (tgt,), results,
             'onehot quad')
    for k in (8, 32):
        _measure(vpair(lambda t, c, k=k: onehot_quad(t, c, k_wide=k)),
                 (tgt,), results, f'onehot quad wide{k}')

    # correctness spot-check on device: quad vs baseline bit-identical
    key = jax.random.PRNGKey(7)
    c = coords_of(key, (PATCH, PATCH))
    base = A.warp_onehot(tgt[0], c)
    for k in (0, 8, 32):
        v = onehot_quad(tgt[0], c, k_wide=k)
        same = bool(jnp.array_equal(base, v))
        results[f'quad k{k} bit-identical'] = same
        print(f'quad k{k} bit-identical: {same}', flush=True)

    # ---- warp_image variants --------------------------------------------
    import functools

    def image_variant(precision, chunk):
        def f(key, i):
            ks = jax.random.split(key, B)

            def one(kk, ii):
                cc = coords_of(kk, ii.shape[:2])
                old_chunk = A._WARP_CHUNK
                return A.warp_image(ii, cc, order=3)
            return jax.vmap(one)(ks, i)
        return f

    # precision: monkeypatch the module constant before each trace
    ref_out = None
    for prec_name, prec in (('HIGHEST', jax.lax.Precision.HIGHEST),
                            ('HIGH', jax.lax.Precision.HIGH),
                            ('DEFAULT', jax.lax.Precision.DEFAULT)):
        orig_warp = A.warp_image

        def warp_p(img_, coords_, order=3, cval=0.0, prefiltered=False,
                   _p=prec):
            # inline copy of warp_image with the einsum precision swapped
            H, W, C = img_.shape
            src = img_.astype(jnp.float32)
            if order == 3 and not prefiltered:
                src = A.bspline_prefilter(src, (0, 1))
            Ho, Wo = coords_.shape[1], coords_.shape[2]
            P = Ho * Wo
            iy, ix, wy, wx = A._tap_data(coords_, order, (H, W))
            nch, iy, ix, wy, wx = A._pad_taps(P, iy, ix, wy, wx)
            imgf = src.reshape(H, W * C)
            ii = jnp.arange(H, dtype=jnp.int32)
            jj = jnp.arange(W, dtype=jnp.int32)

            def step(c0):
                sl = lambda a: jax.lax.dynamic_slice_in_dim(
                    a, c0, A._WARP_CHUNK, 0)
                iyc, ixc, wyc, wxc = sl(iy), sl(ix), sl(wy), sl(wx)
                Ry = jnp.zeros((A._WARP_CHUNK, H), jnp.float32)
                Rx = jnp.zeros((A._WARP_CHUNK, W), jnp.float32)
                for d in range(iyc.shape[-1]):
                    Ry = Ry + wyc[:, d, None] * (
                        iyc[:, d, None] == ii).astype(jnp.float32)
                    Rx = Rx + wxc[:, d, None] * (
                        ixc[:, d, None] == jj).astype(jnp.float32)
                tmp = jnp.einsum('ph,hj->pj', Ry, imgf, precision=_p)
                tmp = tmp.reshape(A._WARP_CHUNK, W, C)
                return jnp.einsum('pw,pwc->pc', Rx, tmp, precision=_p)

            outs = jax.lax.map(
                step, jnp.arange(nch, dtype=jnp.int32) * A._WARP_CHUNK)
            out = outs.reshape(nch * A._WARP_CHUNK, C)[:P].reshape(Ho, Wo, C)
            y, x = coords_[0], coords_[1]
            valid = (y >= 0) & (y <= H - 1) & (x >= 0) & (x <= W - 1)
            return jnp.where(valid[..., None], out, cval)

        def f(key, i, wp=warp_p):
            ks = jax.random.split(key, B)
            return jax.vmap(lambda kk, ii: wp(
                ii, coords_of(kk, ii.shape[:2])))(ks, i)

        _measure(f, (img,), results, f'image prec {prec_name}')
        out = jax.jit(f)(jax.random.PRNGKey(99), img)
        if ref_out is None:
            ref_out = out
        else:
            err = float(jnp.max(jnp.abs(out - ref_out)))
            results[f'image prec {prec_name}']['max_abs_vs_HIGHEST'] = err
            print(f'  max|err| vs HIGHEST: {err:.3e}', flush=True)

    # chunk size (at HIGHEST)
    for chunk in (4096, 8192):
        A._WARP_CHUNK = chunk
        try:
            def f(key, i):
                ks = jax.random.split(key, B)
                return jax.vmap(lambda kk, ii: A.warp_image(
                    ii, coords_of(kk, ii.shape[:2]), order=3))(ks, i)
            _measure(f, (img,), results, f'image chunk {chunk}')
        finally:
            A._WARP_CHUNK = 2048

    json.dump({k: v for k, v in results.items()}, sys.stdout, indent=1,
              default=str)
    print()


if __name__ == '__main__':
    main()
