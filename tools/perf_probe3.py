"""Probe 3: does the Pallas fused InstanceNorm+LeakyReLU earn its place?

Times the bench-scale U-Net forward (bf16, batch 16/64) and the full 2D
ensemble program with TS2D_PALLAS on vs off, plus the raw norm_act op vs
the XLA reduce+elementwise path. Decision rule (VERDICT round 1, item 6):
enable by default whichever wins, delete what loses.
"""

import os
import sys

import numpy as np

sys.path.insert(0, '/root/repo')

from tools.perf_probe import timeit  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from bench import PATCH, REALISTIC_SHAPE, build_engine
    from totalsegmentator2d_tpu.models.unet import forward, _instance_norm

    rng = np.random.default_rng(0)

    # raw op: norm+act over a stage-0-sized activation
    for shape in ((16, 256, 256, 32), (64, 128, 128, 64)):
        x32 = rng.standard_normal(shape).astype(np.float32)
        for dt in (jnp.bfloat16, jnp.float32):
            x = jax.device_put(x32.astype(dt))
            scale = jax.device_put(np.ones(shape[-1], np.float32))
            bias = jax.device_put(np.zeros(shape[-1], np.float32))

            def xla_path(x, s, b):
                y = _instance_norm(x, s, b, 1e-5)
                return jnp.where(y >= 0, y, y * 0.01)

            t_xla = timeit(jax.jit(xla_path), 8, x, scale, bias)[0]

            from totalsegmentator2d_tpu.ops.pallas import instance_norm_act
            def pallas_path(x, s, b):
                out = instance_norm_act(x, s, b, eps=1e-5, slope=0.01)
                assert out is not None
                return out

            try:
                t_pl = timeit(jax.jit(pallas_path), 8, x, scale, bias)[0]
            except Exception as ex:
                t_pl = float('nan')
                print(f'  pallas failed: {type(ex).__name__}: {ex}')
            print(f'norm_act {shape} {jnp.dtype(dt).name}: '
                  f'xla {t_xla*1e3:7.2f} ms  pallas {t_pl*1e3:7.2f} ms')

    # forward-level: bf16 M=16 with/without pallas
    eng = build_engine()
    spec = eng.specs[0]
    p0 = jax.tree_util.tree_map(lambda a: a[0, 0], eng.params)
    x16 = jax.device_put(rng.standard_normal(
        (16, PATCH[0], PATCH[1], 2)).astype(np.float32))
    for flag in ('0', '1'):
        os.environ['TS2D_PALLAS'] = flag
        f = jax.jit(lambda p, x: forward(p, x, spec.arch,
                                         compute_dtype=jnp.bfloat16))
        t = timeit(f, 8, p0, x16)[0]
        print(f'fwd M=16 bf16 TS2D_PALLAS={flag}: {t*1e3:8.2f} ms')

    # program-level: full 2D ensemble at the torso projection shape
    proj_shape = (REALISTIC_SHAPE[0], REALISTIC_SHAPE[2])
    arr2d = jax.device_put(rng.standard_normal(
        proj_shape + (2,)).astype(np.float32))
    for flag in ('0', '1'):
        os.environ['TS2D_PALLAS'] = flag
        eng2 = build_engine()
        fn2d, meta = eng2._program(proj_shape, (1.5, 1.5))
        t = timeit(fn2d, 8, eng2.params, arr2d)[0]
        print(f'2D program {proj_shape} TS2D_PALLAS={flag}: {t*1e3:8.2f} ms')


if __name__ == '__main__':
    main()
