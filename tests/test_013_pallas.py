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


class TestDefaultGating:
    def test_prefilter_on_by_default_and_disablable(self, monkeypatch):
        from totalsegmentator2d_tpu.ops.resample import \
            _pallas_prefilter_enabled
        monkeypatch.delenv('TS2D_PALLAS', raising=False)
        assert _pallas_prefilter_enabled()
        monkeypatch.setenv('TS2D_PALLAS', '0')
        assert not _pallas_prefilter_enabled()

    def test_bspline_prefilter_falls_back_on_cpu(self, rng):
        """With the kernel enabled by default, the CPU backend must fall
        through to the associative-scan path transparently."""
        from totalsegmentator2d_tpu.ops.resample import bspline_prefilter, \
            bspline_prefilter_1d
        x = jnp.asarray(rng.standard_normal((30, 20, 2)).astype(np.float32))
        out = bspline_prefilter(x, (0, 1))
        ref = x
        for ax in (0, 1):
            ref = jnp.moveaxis(bspline_prefilter_1d(
                jnp.moveaxis(ref, ax, -1)), -1, ax)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)
