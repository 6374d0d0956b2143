"""Probe 3: does a Pallas fused InstanceNorm+LeakyReLU earn its place?

VERDICT (measured 2026-08-16, v5e): NO — XLA's reduce+elementwise fusion
won at every shape whose plane fit VMEM (e.g. fwd M=16 bf16: 44.8 ms
XLA-only vs 46.7 ms with the kernel; full 2D program 102.7 vs 114.4 ms),
and fp32 temporaries of stage-0-sized planes overflow VMEM (23.8M > 16M
scoped limit). The kernel was deleted; this probe remains as the record
and still A/Bs the forward + program with the TS2D_PALLAS flag (which now
gates only the winning B-spline prefilter kernel, see perf_probe4.py).
"""

import os
import sys

import numpy as np

sys.path.insert(0, '/root/repo')

# these probes decompose the PLAIN mask wire; the compacted wire
# (round 4, default on) returns (buf, occ) tuples from the raw
# programs and has its own probes (perf_probe19/20)
os.environ.setdefault('TS2D_COMPACT', '0')

from tools.perf_probe import timeit  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from bench import PATCH, REALISTIC_SHAPE, build_engine
    from totalsegmentator2d_tpu.models.unet import forward, _instance_norm

    rng = np.random.default_rng(0)

    # raw op: norm+act over a stage-0-sized activation (XLA path only; the
    # Pallas competitor was deleted after losing — see module docstring)
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
            print(f'norm_act {shape} {jnp.dtype(dt).name}: '
                  f'xla {t_xla*1e3:7.2f} ms')

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
