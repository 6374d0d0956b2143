"""Probe 4: B-spline prefilter — Pallas IIR kernel vs associative-scan XLA.

The prefilter runs whenever the input spacing differs from the plan spacing
(most real CTs). Compares the two implementations standalone on a
torso-projection-sized image and at the program level on a resampled scan.
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
    from totalsegmentator2d_tpu.ops.pallas.prefilter import \
        bspline_prefilter_pallas
    from totalsegmentator2d_tpu.ops.resample import bspline_prefilter

    rng = np.random.default_rng(0)
    for shape in ((350, 280, 2), (700, 560, 2)):
        x = jax.device_put(rng.standard_normal(shape).astype(np.float32))

        f_xla = jax.jit(lambda a: bspline_prefilter(a, (0, 1)))
        t_xla = timeit(f_xla, 8, x)[0]

        def pallas_fn(a):
            out = bspline_prefilter_pallas(a, 0)
            assert out is not None
            out = bspline_prefilter_pallas(out, 1)
            assert out is not None
            return out

        try:
            t_pl = timeit(jax.jit(pallas_fn), 8, x)[0]
            a = np.asarray(jax.device_get(jax.jit(pallas_fn)(x)))
            b = np.asarray(jax.device_get(f_xla(x)))
            err = float(np.abs(a - b).max())
        except Exception as ex:
            t_pl, err = float('nan'), float('nan')
            print(f'  pallas failed: {type(ex).__name__}: {ex}')
        print(f'prefilter {shape}: xla {t_xla*1e3:7.2f} ms  '
              f'pallas {t_pl*1e3:7.2f} ms  maxerr {err:.2e}')

    # program level: torso scan at 0.8 mm spacing (engine resamples to 1.5)
    from bench import REALISTIC_SHAPE, build_engine
    proj_shape = (REALISTIC_SHAPE[0], REALISTIC_SHAPE[2])
    arr2d = jax.device_put(rng.standard_normal(
        proj_shape + (2,)).astype(np.float32))
    for flag in ('0', '1'):
        os.environ['TS2D_PALLAS'] = flag
        eng = build_engine()
        fn2d, meta = eng._program(proj_shape, (0.8, 0.8))
        t = timeit(fn2d, 8, eng.params, arr2d)[0]
        print(f'2D program {proj_shape} @0.8mm TS2D_PALLAS={flag}: '
              f'{t*1e3:8.2f} ms (rs_shape={meta["rs_shape"]}, '
              f'{meta["n_tiles"]} tiles)')


if __name__ == '__main__':
    main()
