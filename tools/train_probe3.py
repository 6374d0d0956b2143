"""Probe 24 — which gather formulation makes the spatial warp TPU-fast?

Probe 23 pinned the augmentation cost to map_coordinates' advanced-index
point gathers (order-3 image 11.5 ms/patch, order-1 24-channel target
8.2). Candidates, all computing the SAME tap values in the SAME
accumulation order (bit-identical interior; mode='constant' masks the
exterior):

  V1 current        16 (o3) / 4 (o1) advanced-index 2-D gathers
  V2 flat-take      same taps via jnp.take on the row-flattened image
  V3 slice2d        ONE rank-2 lax.gather of (S, S*C) slices from a
                    pad-2 reflect image with channels folded into the
                    minor axis (the 4x4 tap block is contiguous there)
  V3b batch-folded  V3 with the batch folded into the flat row axis
                    (one un-vmapped gather for the whole batch)
  V4 row-slices     S gathers of (1, S*C) row slices (one per dy)
  VP packed target  bit-pack the 24 one-hot channels into ONE int32
                    channel, V3-gather it, unpack, threshold

Coordinates are mirror-folded into [0, n-1] first (exact for in-range
coords), so every slice start is statically in bounds — no clamping.

Usage: python tools/train_probe3.py   (alone on the box)
"""

import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')

B, H, W, C, L = 64, 256, 256, 2, 24
PAD = 2


def main():
    import jax
    import jax.numpy as jnp

    from totalsegmentator2d_tpu.training import augment as A

    _bs = A._bspline3

    def fold(t, n):
        period = 2.0 * n - 2.0
        m = jnp.mod(t, period)
        return jnp.where(m > n - 1.0, period - m, m)

    def taps(coords, order, shape):
        """Folded integer tap origins + per-tap weights (current order)."""
        Hh, Ww = shape
        y = fold(coords[0], Hh)
        x = fold(coords[1], Ww)
        y0 = jnp.floor(y).astype(jnp.int32)
        x0 = jnp.floor(x).astype(jnp.int32)
        if order == 3:
            o, S = -1, 4
            wy = [_bs(y - (y0 + d)) for d in range(-1, 3)]
            wx = [_bs(x - (x0 + d)) for d in range(-1, 3)]
        else:
            o, S = 0, 2
            wy = [1.0 - (y - y0), y - y0]
            wx = [1.0 - (x - x0), x - x0]
        return y0 + o + PAD, x0 + o + PAD, wy, wx, S

    def warp_slice2d(x, coords, order):
        Hh, Ww, Cc = x.shape
        xp = jnp.pad(x, ((PAD, PAD), (PAD, PAD), (0, 0)), mode='reflect')
        xp2 = xp.reshape(Hh + 2 * PAD, (Ww + 2 * PAD) * Cc)
        sy, sx, wy, wx, S = taps(coords, order, (Hh, Ww))
        starts = jnp.stack([sy, sx * Cc], -1).reshape(-1, 2)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0, 1))
        patches = jax.lax.gather(xp2, starts, dn, slice_sizes=(S, S * Cc))
        patches = patches.reshape(coords.shape[1:] + (S, S, Cc))
        out = 0.0
        for dy in range(S):
            for dx in range(S):
                w = wy[dy] * wx[dx]
                out = out + patches[..., dy, dx, :] * w[..., None]
        return out

    def warp_rows(x, coords, order):
        Hh, Ww, Cc = x.shape
        xp = jnp.pad(x, ((PAD, PAD), (PAD, PAD), (0, 0)), mode='reflect')
        xp2 = xp.reshape(Hh + 2 * PAD, (Ww + 2 * PAD) * Cc)
        sy, sx, wy, wx, S = taps(coords, order, (Hh, Ww))
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0,),
            start_index_map=(0, 1))
        out = 0.0
        for dy in range(S):
            starts = jnp.stack([sy + dy, sx * Cc], -1).reshape(-1, 2)
            row = jax.lax.gather(xp2, starts, dn, slice_sizes=(1, S * Cc))
            row = row.reshape(coords.shape[1:] + (S, Cc))
            acc = 0.0
            for dx in range(S):
                acc = acc + row[..., dx, :] * wx[dx][..., None]
            out = out + acc * wy[dy][..., None]
        return out

    def warp_flat(x, coords, order):
        Hh, Ww, Cc = x.shape
        xp = jnp.pad(x, ((PAD, PAD), (PAD, PAD), (0, 0)), mode='reflect')
        flat = xp.reshape(-1, Cc)
        Wp = Ww + 2 * PAD
        sy, sx, wy, wx, S = taps(coords, order, (Hh, Ww))
        out = 0.0
        for dy in range(S):
            for dx in range(S):
                v = jnp.take(flat, (sy + dy) * Wp + (sx + dx), axis=0)
                w = wy[dy] * wx[dx]
                out = out + v * w[..., None]
        return out

    def warp_slice2d_batch(xb, coordsb, order):
        """V3b: fold the batch into the flat row axis; one gather."""
        Bb, Hh, Ww, Cc = xb.shape
        xp = jnp.pad(xb, ((0, 0), (PAD, PAD), (PAD, PAD), (0, 0)),
                     mode='reflect')
        Hp = Hh + 2 * PAD
        xp2 = xp.reshape(Bb * Hp, (Ww + 2 * PAD) * Cc)
        sy, sx, wy, wx, S = taps(
            jnp.moveaxis(coordsb, 1, 0), order, (Hh, Ww))  # (2,B,H,W)->ok
        boff = (jnp.arange(Bb, dtype=jnp.int32) * Hp)[:, None, None]
        starts = jnp.stack([sy + boff, sx * Cc], -1).reshape(-1, 2)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0, 1))
        patches = jax.lax.gather(xp2, starts, dn, slice_sizes=(S, S * Cc))
        patches = patches.reshape((Bb, Hh, Ww, S, S, Cc))
        out = 0.0
        for dy in range(S):
            for dx in range(S):
                w = wy[dy] * wx[dx]
                out = out + patches[..., dy, dx, :] * w[..., None]
        return out

    print('devices:', jax.devices(), file=sys.stderr)
    rng = np.random.default_rng(0)
    img = jax.device_put(rng.standard_normal((B, H, W, C)).astype(np.float32))
    tgt = jax.device_put((rng.random((B, H, W, L)) > 0.98).astype(np.float32))
    ang = jax.device_put(rng.uniform(-3, 3, (B,)).astype(np.float32))
    sc = jax.device_put(rng.uniform(0.8, 1.2, (B,)).astype(np.float32))

    def grid(a, s):
        return A.affine_grid((H, W), a, s)

    def timed(name, fn, *args):
        f = jax.jit(fn)
        try:
            np.asarray(jax.tree_util.tree_leaves(f(*args))[0][:1, :4])
        except Exception as ex:
            print(f'{name:30s} FAILED {type(ex).__name__}: {str(ex)[:100]}',
                  flush=True)
            return None
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(jax.tree_util.tree_leaves(f(*args))[0][:1, :4])
            ts.append(time.perf_counter() - t0)
        t = float(np.median(ts)) * 1e3
        print(f'{name:30s} {t:8.1f} ms/batch  {t / B:6.3f} ms/patch',
              flush=True)
        return f

    def per_sample(warp, order, src):
        return lambda i, a, s: jax.vmap(
            lambda x, aa, ss: warp(x, grid(aa, ss), order))(i, a, s)

    f0 = timed('o3 img V1 current', lambda i, a, s: jax.vmap(
        lambda x, aa, ss: A.map_coordinates(
            x, grid(aa, ss), 3, 'constant', prefiltered=True))(i, a, s),
        img, ang, sc)
    f2 = timed('o3 img V2 flat', per_sample(warp_flat, 3, img), img, ang, sc)
    f3 = timed('o3 img V3 slice2d', per_sample(warp_slice2d, 3, img),
               img, ang, sc)
    f3b = timed('o3 img V3b batch-folded',
                lambda i, a, s: warp_slice2d_batch(
                    i, jax.vmap(grid)(a, s), 3), img, ang, sc)
    f4 = timed('o3 img V4 rows', per_sample(warp_rows, 3, img), img, ang, sc)

    g0 = timed('o1 tgt24 V1 current', lambda t, a, s: jax.vmap(
        lambda x, aa, ss: A.map_coordinates(x, grid(aa, ss), 1, 'constant'))(
            t, a, s), tgt, ang, sc)
    g3 = timed('o1 tgt24 V3 slice2d', per_sample(warp_slice2d, 1, tgt),
               tgt, ang, sc)
    g3b = timed('o1 tgt24 V3b batch-folded',
                lambda t, a, s: warp_slice2d_batch(
                    t, jax.vmap(grid)(a, s), 1), tgt, ang, sc)

    # VP: packed one-int32-channel target warp + per-bit threshold
    def warp_packed_real(tb, coordsb):
        bits = (tb > 0.5).astype(jnp.uint32)
        packed = jnp.zeros(tb.shape[:-1], jnp.uint32)
        for li in range(L):
            packed = packed | (bits[..., li] << li)
        Bb, Hh, Ww = packed.shape
        xp = jnp.pad(packed, ((0, 0), (PAD, PAD), (PAD, PAD)), mode='reflect')
        Hp = Hh + 2 * PAD
        xp2 = xp.reshape(Bb * Hp, Ww + 2 * PAD)
        sy, sx, wy, wx, S = taps(
            jnp.moveaxis(coordsb, 1, 0), 1, (Hh, Ww))
        boff = (jnp.arange(Bb, dtype=jnp.int32) * Hp)[:, None, None]
        starts = jnp.stack([sy + boff, sx], -1).reshape(-1, 2)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0, 1))
        patches = jax.lax.gather(xp2, starts, dn, slice_sizes=(S, S))
        patches = patches.reshape((Bb, Hh, Ww, S, S))
        out = 0.0
        for dy in range(S):
            for dx in range(S):
                w = wy[dy] * wx[dx]
                tap_bits = (patches[..., dy, dx, None]
                            >> jnp.arange(L, dtype=jnp.uint32)) & 1
                out = out + tap_bits.astype(jnp.float32) * w[..., None]
        return (out > 0.5).astype(jnp.float32)

    gp = timed('o1 tgt24 VP packed',
               lambda t, a, s: warp_packed_real(t, jax.vmap(grid)(a, s)),
               tgt, ang, sc)

    # agreement on valid (in-range) pixels vs V1
    cg = jax.jit(lambda a, s: jax.vmap(grid)(a, s))
    co = np.asarray(cg(ang, sc))
    valid = ((co[:, 0] >= 0) & (co[:, 0] <= H - 1)
             & (co[:, 1] >= 0) & (co[:, 1] <= W - 1))
    r0 = np.asarray(f0(img, ang, sc))
    for name, f in [('V2', f2), ('V3', f3), ('V3b', f3b), ('V4', f4)]:
        if f is None:
            continue
        r = np.asarray(f(img, ang, sc))
        print(f'o3 {name} max|d| valid: {np.abs(r - r0)[valid].max():.2e}',
              flush=True)
    s0 = np.asarray(g0(tgt, ang, sc))
    for name, g in [('V3', g3), ('V3b', g3b)]:
        if g is None:
            continue
        r = np.asarray(g(tgt, ang, sc))
        print(f'o1 {name} max|d| valid: {np.abs(r - s0)[valid].max():.2e}',
              flush=True)
    if gp is not None:
        rp = np.asarray(gp(tgt, ang, sc))
        ref = (s0 > 0.5).astype(np.float32)
        print(f'o1 VP thresholded mismatches on valid: '
              f'{int((np.abs(rp - ref) > 0)[valid].sum())}', flush=True)


if __name__ == '__main__':
    main()
