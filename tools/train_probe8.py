"""Probe 29 — quad-gather image warp vs the one-hot-matmul warp.

Probe 28 (train_probe7.py) showed the 2x2-neighborhood pack turns the
target warp's 4 scalarized point gathers into ONE 16-byte-row gather
(3.2 -> 1.1 ms/patch, bit-identical). This probe applies the same idea
to the ORDER-3 image warp: pre-pack the 4x4 B-spline tap neighborhood
with exact static mirror-shifts (Q[y,x,(dy,dx)] = coef[mirror(y+dy),
mirror(x+dx)]) and fetch all 16 taps x C channels in ONE (P, 16*C)-row
gather, accumulating in map_coordinates' exact term order. If the
per-gather cost does not scale with row width, this beats the matmul
path (2.5 ms/patch) AND is bit-identical to map_coordinates (the
matmul path is only ~6e-7-close).

Also re-times the composed spatial transform with the winning pieces.

Usage: python tools/train_probe8.py   (alone on the box; ONE JAX process)
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


def _measure(fn, args, results, name):
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
    print(f'{name}: {results[name]}', flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from totalsegmentator2d_tpu.training import augment as A

    print('devices:', jax.devices(), file=sys.stderr)
    rng = np.random.default_rng(0)
    img = jax.device_put(rng.standard_normal(
        (B, PATCH, PATCH, IN_CH)).astype(np.float32))
    results = {}

    def coords_of(k, shape):
        ang = jax.random.uniform(k, (), minval=-3.14, maxval=3.14)
        return A.affine_grid(shape, ang, 1.1)

    def warp_image_quad(img_, coords, order=3, cval=0.0):
        H, W, C = img_.shape
        src = img_.astype(jnp.float32)
        if order == 3:
            src = A.bspline_prefilter(src, (0, 1))
            offs = list(range(-1, 3))
        else:
            offs = [0, 1]
        S = len(offs)
        iy, ix, wy, wx = A._tap_data(coords, order, (H, W))
        ys = [A._mirror_idx(jnp.arange(H) + d, H) for d in offs]
        xs = [A._mirror_idx(jnp.arange(W) + d, W) for d in offs]
        q = jnp.stack([src[yy][:, xx] for yy in ys for xx in xs], axis=2)
        qf = q.reshape(H * W, S * S * C)
        idx = iy[:, 0] * W + ix[:, 0]
        taps = jnp.take(qf, idx, axis=0).reshape(-1, S, S, C)
        Ho, Wo = coords.shape[1], coords.shape[2]
        acc = 0.0
        for a in range(S):         # map_coordinates' exact term order
            for b in range(S):
                acc = acc + taps[:, a, b] * (wy[:, a] * wx[:, b])[:, None]
        out = acc.reshape(Ho, Wo, C)
        y, x = coords[0], coords[1]
        valid = (y >= 0) & (y <= H - 1) & (x >= 0) & (x <= W - 1)
        return jnp.where(valid[..., None], out, cval)

    def vimg(f):
        def g(key, i):
            ks = jax.random.split(key, B)
            return jax.vmap(lambda kk, ii: f(ii, coords_of(kk, ii.shape[:2]))
                            )(ks, i)
        return g

    _measure(vimg(lambda i, c: A.warp_image(i, c, order=3)), (img,), results,
             'image matmul HIGHEST (baseline)')
    _measure(vimg(lambda i, c: warp_image_quad(i, c)), (img,), results,
             'image quad-gather o3')

    # bit-identity vs map_coordinates on device
    key = jax.random.PRNGKey(7)
    c = coords_of(key, (PATCH, PATCH))
    ref = A.map_coordinates(img[0], c, order=3, mode='constant')
    v = warp_image_quad(img[0], c)
    ident = bool(jnp.array_equal(ref, v))
    err = float(jnp.max(jnp.abs(ref - v)))
    results['quad vs map_coordinates'] = {'bit_identical': ident,
                                          'max_abs': err}
    print(f'quad vs map_coordinates: identical={ident} max|err|={err:.2e}',
          flush=True)

    json.dump(results, sys.stdout, indent=1)
    print()


if __name__ == '__main__':
    main()
