"""Probe 2: per-invocation overhead composition + transfer bandwidth +
host-projection cost. See perf_probe.py for context."""

import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')

import os

# these probes decompose the PLAIN mask wire; the compacted wire
# (round 4, default on) returns (buf, occ) tuples from the raw
# programs and has its own probes (perf_probe19/20)
os.environ.setdefault('TS2D_COMPACT', '0')

from tools.perf_probe import sync, timeit, unet_flops  # noqa: E402

PEAK_BF16 = 197e12


def main():
    import jax
    import jax.numpy as jnp
    from bench import PATCH, REALISTIC_SHAPE, build_engine, \
        make_realistic_volume
    from totalsegmentator2d_tpu.models.unet import forward, _conv_stack

    eng = build_engine()
    spec = eng.specs[0]
    a = spec.arch
    fl1 = unet_flops(a, *PATCH)
    p0 = jax.tree_util.tree_map(lambda x: x[0, 0], eng.params)
    rng = np.random.default_rng(0)
    x16 = jax.device_put(rng.standard_normal(
        (16, PATCH[0], PATCH[1], 2)).astype(np.float32))

    # RTT estimate: sync a trivial jitted op
    triv = jax.jit(lambda x: x[0, 0, 0, :1] + 1)
    rtt = timeit(triv, 12, x16)[0]
    print(f'RTT (trivial op + scalar fetch): {rtt*1e3:.1f} ms')

    # full forward M=16
    f = jax.jit(lambda p, x: forward(p, x, a, compute_dtype=jnp.bfloat16))
    t_full = timeit(f, 8, p0, x16)[0]
    print(f'fwd M=16 full:     {(t_full-rtt)*1e3:8.2f} ms device')

    # encoder only
    def enc_only(p, x):
        h = x
        for s in range(a.n_stages):
            h = _conv_stack(h, p['encoder']['stages'][s], a.strides[s],
                            a.kernel_sizes[s], a, jnp.bfloat16)
        return h
    t_enc = timeit(jax.jit(enc_only), 8, p0, x16)[0]
    print(f'fwd M=16 encoder:  {(t_enc-rtt)*1e3:8.2f} ms device')

    # no-norm variant (strip norm params)
    def strip(d):
        if isinstance(d, dict):
            return {k: strip(v) for k, v in d.items() if k != 'norm'}
        if isinstance(d, list):
            return [strip(v) for v in d]
        return d
    p_nonorm = strip(p0)
    t_nn = timeit(f, 8, p_nonorm, x16)[0]
    print(f'fwd M=16 no-norm:  {(t_nn-rtt)*1e3:8.2f} ms device')

    # M=64
    x64 = jax.device_put(rng.standard_normal(
        (64, PATCH[0], PATCH[1], 2)).astype(np.float32))
    t64 = timeit(f, 6, p0, x64)[0]
    print(f'fwd M=64 full:     {(t64-rtt)*1e3:8.2f} ms device '
          f'({(t64-rtt)/64*1e3:.2f} ms/sample, '
          f'MFU {64*fl1/(t64-rtt)/PEAK_BF16*100:.1f}%)')

    # upload bandwidth at several sizes (int16 and float32)
    for mb, dtype in ((1, np.int16), (8, np.int16), (49, np.int16),
                      (49, np.float32)):
        n = mb * 1024 * 1024 // np.dtype(dtype).itemsize
        arr = np.zeros(n, dtype)
        t = timeit(lambda v: jax.device_put(v), 4, arr)[0]
        print(f'upload {mb:3d} MB {np.dtype(dtype).name}: {t*1e3:8.1f} ms '
              f'({mb/t:.0f} MB/s)')

    # download bandwidth
    big = jax.device_put(np.zeros(8 * 1024 * 1024 // 2, np.int16))
    big = jax.jit(lambda x: x + 1)(big)
    t = timeit(lambda: np.asarray(jax.device_get(big)), 4)[0]
    print(f'download 8 MB computed: {t*1e3:8.1f} ms ({8/t:.0f} MB/s)')

    # host-side projection cost (numpy)
    vol = make_realistic_volume()
    t0 = time.perf_counter()
    for _ in range(3):
        mx = vol.max(axis=1)
        mn = vol.astype(np.float32).mean(axis=1)
    t_host = (time.perf_counter() - t0) / 3
    print(f'host projection (max+mean over Y, {vol.nbytes/1e6:.0f} MB): '
          f'{t_host*1e3:.1f} ms')

    # host reorient-like copy
    t0 = time.perf_counter()
    c = np.ascontiguousarray(np.transpose(vol, (2, 1, 0)))
    print(f'host transpose-copy: {(time.perf_counter()-t0)*1e3:.1f} ms')


if __name__ == '__main__':
    main()
