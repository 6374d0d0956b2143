"""The batched compact-pack cost: scatter vs gather formulations.

tools/nonforward_bill.py (round 5) measured the compacted mask wire's
device-side pack at ~2.3 ms/scan solo but ~9.9 ms/scan inside the
batch-8 vmapped program (27% of the batched device floor) — the
`.at[idx].set(tiles)` scatter of 64-byte rows with data-dependent
indices lowers ~4x worse under vmap. Variants measured here at the real
torso mask shape, batch 8 (amortized-enqueue timing: N back-to-back
executions, one tiny dependent fetch):

  A scatter (shipped)     buf = zeros.at[idx].set(tiles)
  B index-scatter+gather  src = full(T).at[idx].set(arange); buf =
                          tiles_padded[src] — the scatter moves 4-byte
                          indices instead of 64-byte rows; the heavy way
                          data moves becomes a gather, which TPUs batch
                          well. Output identical (incl. zero rows for
                          never-written prefix slots; the trash row T is
                          garbage in both).
  C argsort+gather        order = argsort(~occ, stable); buf=take(order)
                          — reconstruction-equal only (rows past the
                          occupied count hold garbage tiles, the host
                          never reads them)

Usage: python tools/compact_probe.py   (alone on the box; ONE JAX process)
"""

import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')

B = 8
SHAPE = (336, 272, 15)   # torso-crop packed-mask shape (H, W, nBytes)
OCC_FRACTION = 0.06      # realistic plane-major tile occupancy (probe19)
N_REPS = 8


def main():
    import jax
    import jax.numpy as jnp
    from totalsegmentator2d_tpu.inference.ensemble_engine import (
        _COMPACT_TILE, _compact_pack, _pack_bits)

    print('devices:', jax.devices(), file=sys.stderr)
    rng = np.random.default_rng(0)
    h, w, nb = SHAPE
    total = h * w * nb
    T = -(-total // _COMPACT_TILE)

    # masks whose plane-major tiles are ~OCC_FRACTION occupied
    masks = np.zeros((B, total), np.uint8)
    for i in range(B):
        occ_tiles = rng.random(T) < OCC_FRACTION
        occ_bytes = np.repeat(occ_tiles, _COMPACT_TILE)[:total]
        vals = (rng.random(total) < 0.3).astype(np.uint8)
        masks[i] = vals * occ_bytes
    packed = jax.device_put(
        masks.reshape(B, nb, h, w).transpose(0, 2, 3, 1))  # (B, H, W, nB)

    def pack_b(x):  # B: 4-byte index scatter + row gather
        planes = jnp.transpose(x, (2, 0, 1))
        flat = planes.reshape(-1)
        pad = (-flat.size) % _COMPACT_TILE
        if pad:
            flat = jnp.pad(flat, (0, pad))
        tiles = flat.reshape(-1, _COMPACT_TILE)
        t = tiles.shape[0]
        occ = jnp.any(tiles != 0, axis=1)
        pos = jnp.cumsum(occ) - 1
        idx = jnp.where(occ, pos, t)
        src = jnp.full((t + 1,), t, jnp.int32).at[idx].set(
            jnp.arange(t, dtype=jnp.int32))
        tiles_p = jnp.concatenate(
            [tiles, jnp.zeros((1, _COMPACT_TILE), jnp.uint8)])
        buf = jnp.take(tiles_p, src, axis=0)
        occ_packed = _pack_bits(occ.astype(jnp.uint8)[None])[0]
        return buf, occ_packed

    def pack_c(x):  # C: stable sort (reconstruction-equal only)
        planes = jnp.transpose(x, (2, 0, 1))
        flat = planes.reshape(-1)
        pad = (-flat.size) % _COMPACT_TILE
        if pad:
            flat = jnp.pad(flat, (0, pad))
        tiles = flat.reshape(-1, _COMPACT_TILE)
        occ = jnp.any(tiles != 0, axis=1)
        order = jnp.argsort(~occ, stable=True)
        buf = jnp.take(tiles, order, axis=0)
        buf = jnp.concatenate(
            [buf, jnp.zeros((1, _COMPACT_TILE), jnp.uint8)])
        occ_packed = _pack_bits(occ.astype(jnp.uint8)[None])[0]
        return buf, occ_packed

    def timeit_amortized(fn):
        jfn = jax.jit(jax.vmap(fn))
        out = jfn(packed)
        np.asarray(jax.device_get(out[1][:1, :4]))  # compile + sync
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(N_REPS):
                out = jfn(packed)
            np.asarray(jax.device_get(out[1][:1, :4]))
            times.append((time.perf_counter() - t0) / N_REPS)
        return float(np.min(times))

    variants = [('A scatter (shipped)', _compact_pack),
                ('B idx-scatter+gather', pack_b),
                ('C argsort+gather', pack_c)]
    outs = {}
    for name, fn in variants:
        t = timeit_amortized(fn)
        outs[name[:1]] = jax.jit(jax.vmap(fn))(packed)
        print(f'{name:24s} {t*1e3:7.2f} ms/batch   '
              f'{t*1e3/B:5.2f} ms/scan', flush=True)

    # equality: A vs B exact on every prefix row + bitmap; A vs C on
    # reconstruction (count rows)
    bufa, occa = map(np.asarray, outs['A'])
    bufb, occb = map(np.asarray, outs['B'])
    bufc, occc = map(np.asarray, outs['C'])
    assert (occa == occb).all() and (occa == occc).all()
    for i in range(B):
        cnt = int(np.unpackbits(occa[i], bitorder='little')[:T].sum())
        assert (bufa[i][:T] == bufb[i][:T]).all(), 'B != A on buf'
        assert (bufa[i][:cnt] == bufc[i][:cnt]).all(), 'C != A on prefix'
    print('equality: B exact, C reconstruction-equal  ok')


if __name__ == '__main__':
    main()
