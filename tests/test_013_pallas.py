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


class TestFusedBlockKernel:
    pytestmark = pytest.mark.slow
    """fused_norm_act_conv: y = conv3x3(lrelu(x*scale+shift)) + b with
    output statistics, vs the plain-XLA reference."""

    @pytest.mark.parametrize('shape', [(2, 32, 32, 32, 32),
                                       (1, 16, 64, 8, 16),
                                       (2, 32, 16, 16, 8)])
    def test_matches_reference_interpreted(self, rng, shape):
        from totalsegmentator2d_tpu.ops.pallas.fused_block import (
            fused_norm_act_conv, reference)
        N, H, W, C, Co = shape
        x = rng.standard_normal((N, H, W, C)).astype(np.float32)
        scale = rng.uniform(0.5, 2.0, (N, C)).astype(np.float32)
        shift = rng.standard_normal((N, C)).astype(np.float32) * 0.3
        w = (rng.standard_normal((3, 3, C, Co)) * 0.1).astype(np.float32)
        b = rng.standard_normal((Co,)).astype(np.float32) * 0.1
        y, st = fused_norm_act_conv(jnp.asarray(x), jnp.asarray(scale),
                                    jnp.asarray(shift), jnp.asarray(w),
                                    jnp.asarray(b), interpret=True)
        ry, rst = reference(jnp.asarray(x), jnp.asarray(scale),
                            jnp.asarray(shift), jnp.asarray(w),
                            jnp.asarray(b))
        # both paths run bf16 operands / f32 accumulation; only summation
        # order differs
        np.testing.assert_allclose(np.asarray(y, np.float32),
                                   np.asarray(ry, np.float32),
                                   rtol=0.05, atol=0.05)
        np.testing.assert_allclose(np.asarray(st), np.asarray(rst),
                                   rtol=0.03, atol=0.5)

    def test_conv_stats_variant(self, rng):
        """apply_normact=False: plain conv3x3 + statistics (a fused
        stack's first block)."""
        from totalsegmentator2d_tpu.ops.pallas.fused_block import \
            fused_norm_act_conv
        import jax
        N, H, W, C, Co = 2, 16, 32, 16, 8
        x = rng.standard_normal((N, H, W, C)).astype(np.float32)
        w = (rng.standard_normal((3, 3, C, Co)) * 0.1).astype(np.float32)
        b = rng.standard_normal((Co,)).astype(np.float32) * 0.1
        dummy = jnp.zeros((N, C), jnp.float32)
        y, st = fused_norm_act_conv(jnp.asarray(x), dummy, dummy,
                                    jnp.asarray(w), jnp.asarray(b),
                                    apply_normact=False, interpret=True)
        ref = jax.lax.conv_general_dilated(
            jnp.asarray(x).astype(jnp.bfloat16),
            jnp.asarray(w).astype(jnp.bfloat16), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=jnp.float32) + b
        np.testing.assert_allclose(np.asarray(y, np.float32),
                                   np.asarray(ref, np.float32),
                                   rtol=0.05, atol=0.05)
        np.testing.assert_allclose(
            np.asarray(st[:, 0]), np.asarray(jnp.sum(ref, axis=(1, 2))),
            rtol=0.03, atol=0.5)

    def test_fused_conv_stack_matches_standard(self, rng):
        """The whole fused chain (XLA conv0 + one-pass stats -> fused
        kernel -> final normalize+act) vs the standard bf16 block chain on
        a 2-block stack."""
        import jax
        from totalsegmentator2d_tpu.models.plans import ArchSpec
        from totalsegmentator2d_tpu.models.unet import (_conv_stack,
                                                        _conv_stack_fused,
                                                        init_params_np)
        spec = ArchSpec(n_stages=1, features_per_stage=(16,),
                        kernel_sizes=((3, 3),), strides=((1, 1),),
                        n_conv_per_stage=(2,), n_conv_per_stage_decoder=(),
                        in_channels=8, out_channels=1)
        params = init_params_np(0, spec)
        blocks = jax.tree_util.tree_map(jnp.asarray,
                                        params['encoder']['stages'][0])
        x = jnp.asarray(rng.standard_normal((2, 16, 32, 8))
                        .astype(np.float32))
        std = np.asarray(_conv_stack(x, blocks, (1, 1), (3, 3), spec,
                                     compute_dtype=jnp.bfloat16), np.float32)
        fused = np.asarray(_conv_stack_fused(x, blocks, (1, 1), spec,
                                             interpret=True), np.float32)
        assert fused.shape == std.shape
        # both chains are bf16; they differ only in accumulation order and
        # the one-pass variance formula
        np.testing.assert_allclose(fused, std, rtol=0.1, atol=0.05)

    def test_fold_stats_matches_instance_norm(self, rng):
        """fold_stats + the fused kernel's normact reproduce
        _instance_norm + leaky_relu."""
        from totalsegmentator2d_tpu.models.unet import _instance_norm
        from totalsegmentator2d_tpu.ops.pallas.fused_block import fold_stats
        N, H, W, C = 2, 8, 8, 4
        y = rng.standard_normal((N, H, W, C)).astype(np.float32) * 3 + 1
        gamma = rng.uniform(0.5, 2.0, (C,)).astype(np.float32)
        beta = rng.standard_normal((C,)).astype(np.float32)
        st = jnp.stack([jnp.sum(jnp.asarray(y), axis=(1, 2)),
                        jnp.sum(jnp.square(jnp.asarray(y)), axis=(1, 2))],
                       axis=1)
        sc, sh = fold_stats(st, H * W, jnp.asarray(gamma), jnp.asarray(beta),
                            eps=1e-5)
        ours = np.asarray(y) * np.asarray(sc)[:, None, None, :] \
            + np.asarray(sh)[:, None, None, :]
        ref = np.asarray(_instance_norm(jnp.asarray(y), jnp.asarray(gamma),
                                        jnp.asarray(beta), 1e-5))
        np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)


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
