"""Pallas kernels (interpreter mode on CPU; compiled path covered on TPU)."""

import numpy as np
import pytest
import scipy.ndimage as ndi

import jax.numpy as jnp

from totalsegmentator2d_tpu.ops.pallas.prefilter import bspline_prefilter_pallas


class TestPrefilterKernel:
    def test_matches_scipy_interpreted(self, rng):
        x = rng.standard_normal((31, 140)).astype(np.float32)
        out = bspline_prefilter_pallas(jnp.asarray(x), axis=0, interpret=True)
        assert out is not None
        ref = ndi.spline_filter1d(x.astype(np.float64), order=3, axis=0,
                                  mode='mirror')
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)

    def test_matches_scan_implementation(self, rng):
        from totalsegmentator2d_tpu.ops.resample import bspline_prefilter_1d
        x = rng.standard_normal((25, 64, 3)).astype(np.float32)
        out = bspline_prefilter_pallas(jnp.asarray(x), axis=0, interpret=True)
        ref = jnp.moveaxis(bspline_prefilter_1d(
            jnp.moveaxis(jnp.asarray(x), 0, -1)), -1, 0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)

    def test_declines_on_cpu_compiled(self, rng):
        x = jnp.asarray(rng.standard_normal((16, 8)).astype(np.float32))
        assert bspline_prefilter_pallas(x, axis=0) is None

    def test_declines_tiny_axis(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 300)).astype(np.float32))
        assert bspline_prefilter_pallas(x, axis=0, interpret=True) is None


class TestNormActKernel:
    def test_declines_on_cpu(self, rng):
        from totalsegmentator2d_tpu.ops.pallas import instance_norm_act
        x = jnp.asarray(rng.standard_normal((1, 8, 8, 8)).astype(np.float32))
        assert instance_norm_act(x, jnp.ones(8), jnp.zeros(8)) is None
