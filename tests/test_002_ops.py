"""Device image ops: golden-value tests against numpy/scipy oracles."""

import numpy as np
import pytest
import scipy.ndimage as ndi

from tests.conftest import asset_path
from totalsegmentator2d_tpu.io import MedicalImage, read_image
from totalsegmentator2d_tpu.ops import (gaussian_map, orientation_code,
                                        project, reduce_dimensions, reorient,
                                        resample, resize_to_shape,
                                        restore_dimension)
from totalsegmentator2d_tpu.ops import normalize as norm
from totalsegmentator2d_tpu.ops import projection as proj
from totalsegmentator2d_tpu.ops.resample import bspline_prefilter_1d


class TestReorient:
    def test_identity_stays(self, rng):
        img = MedicalImage(array=rng.random((4, 5, 6)).astype(np.float32))
        out = reorient(img, 'RAI')
        np.testing.assert_array_equal(out.array, img.array)

    def test_flip_only(self, rng):
        # direction diag(-1,-1,1): x and y axes run backwards -> flips
        arr = rng.random((4, 5, 6)).astype(np.float32)
        img = MedicalImage(array=arr, spacing=(1.0, 2.0, 3.0),
                           origin=(10.0, 20.0, 30.0),
                           direction=np.diag([-1.0, -1.0, 1.0]))
        out = reorient(img, 'RAI')
        assert np.allclose(out.direction, np.eye(3))
        # numpy axes (z,y,x): ITK axes 0,1 flipped -> numpy axes 2,1 flipped
        np.testing.assert_array_equal(out.array, arr[:, ::-1, ::-1])
        # new origin = physical point of voxel (5,4,0) in old frame
        np.testing.assert_allclose(out.origin, img.index_to_physical([5, 4, 0]))
        # physical location of a voxel is invariant
        np.testing.assert_allclose(out.index_to_physical([0, 0, 0]),
                                   img.index_to_physical([5, 4, 0]))

    def test_permutation(self, rng):
        arr = rng.random((4, 5, 6)).astype(np.float32)
        # axis0 -> +y (A...toward P), axis1 -> +x, axis2 -> +z
        direction = np.array([[0, 1, 0], [1, 0, 0], [0, 0, 1]], float)
        img = MedicalImage(array=arr, spacing=(1.0, 2.0, 3.0), direction=direction)
        out = reorient(img, 'RAI')
        assert np.allclose(out.direction, np.eye(3))
        assert out.size == (5, 6, 4)
        assert out.spacing == (2.0, 1.0, 3.0)
        # voxel identity: out[z, x_old, y_old] == in[z, y_old, x_old]
        np.testing.assert_array_equal(out.array, np.swapaxes(arr, 1, 2))

    def test_roundtrip_physical_positions(self, rng):
        arr = rng.random((3, 4, 5)).astype(np.float32)
        direction = np.array([[0, -1, 0], [0, 0, 1], [-1, 0, 0]], float)
        img = MedicalImage(array=arr, spacing=(1.5, 2.5, 0.5),
                           origin=(7.0, -3.0, 2.0), direction=direction)
        out = reorient(img, 'RAI')
        # compare the physical position and value of an arbitrary voxel
        assert out.size == (4, 3, 5)
        for idx_out in ([0, 0, 0], [3, 2, 4], [1, 1, 2]):
            p = out.index_to_physical(idx_out)
            idx_in = np.rint(img.physical_to_index(p)).astype(int)
            v_out = out.array[idx_out[2], idx_out[1], idx_out[0]]
            v_in = img.array[idx_in[2], idx_in[1], idx_in[0]]
            assert v_out == v_in

    def test_code(self):
        assert orientation_code(np.eye(3)) == 'RAI'
        assert orientation_code(np.diag([-1, -1, 1])) == 'LPI'

    def test_2d_passthrough(self, rng):
        img = MedicalImage(array=rng.random((4, 5)), direction=np.diag([-1.0, 1.0]))
        assert reorient(img, 'RAI') is img


class TestProjection:
    def _vol(self, rng):
        arr = rng.integers(-100, 400, size=(7, 6, 5)).astype(np.int16)
        return MedicalImage(array=arr, spacing=(1.5, 1.5, 1.5),
                            origin=(1.0, 2.0, 3.0))

    @pytest.mark.parametrize('mode,npfn', [
        ('max', np.max), ('min', np.min), ('mean', lambda a, axis: np.mean(a, axis)),
        ('median', np.median),
        ('std', lambda a, axis: np.std(a.astype(np.float64), axis, ddof=1)),
    ])
    def test_reduction_modes(self, rng, mode, npfn):
        img = self._vol(rng)
        out = project(img, mode=mode, axis='coronal')  # ITK axis 1 -> numpy axis 1
        expected = npfn(img.array, axis=1)
        np.testing.assert_allclose(np.squeeze(out.array, 1), expected, rtol=1e-5)
        assert out.size == (5, 1, 7)
        # projected axis absorbs the physical extent; origin is preserved
        assert out.spacing == (1.5, 9.0, 1.5)
        assert out.origin == img.origin

    def test_first_projection(self):
        arr = np.zeros((1, 4, 3), np.int16)
        arr[0, 1, 0] = 5
        arr[0, 3, 0] = 9
        arr[0, 0, 2] = 7
        img = MedicalImage(array=arr)
        out = project(img, mode='first', axis='coronal')
        res = np.squeeze(out.array)
        assert res[0] == 5   # first nonzero along y for x=0
        assert res[1] == 0
        assert res[2] == 7

    def test_slice_mode(self, rng):
        img = self._vol(rng)
        out = project(img, mode='slice:middle', axis='axial')
        np.testing.assert_array_equal(np.squeeze(out.array, 0), img.array[4])

    def test_multiclass(self):
        arr = np.zeros((2, 3, 3), np.uint8)
        arr[0, 1, 1] = 2
        arr[1, 2, 0] = 1
        img = MedicalImage(array=arr)
        out = project(img, mode='multiclass:3', axis='coronal')
        assert out.ncomponents == 3
        res = np.squeeze(out.array, 1)  # (z, x, c)
        assert res[0, 1, 1] == 1  # label 2 -> channel 1
        assert res[1, 0, 0] == 1  # label 1 -> channel 0
        assert res.sum() == 2

    def test_xr_rejected(self, rng):
        with pytest.raises(NotImplementedError):
            project(self._vol(rng), mode='xr', axis='coronal')

    def test_flatten_max_index(self):
        arr = np.zeros((2, 2, 3), np.uint8)
        arr[0, 0, 0] = 1
        arr[0, 0, 2] = 1   # highest nonzero channel wins
        arr[1, 1, 1] = 1
        img = MedicalImage(array=arr, is_vector=True)
        out = proj.flatten_vector_max(img, index=True)
        assert out.array[0, 0] == 3
        assert out.array[1, 1] == 2
        assert out.array[0, 1] == 0


class TestReduceRestore:
    def test_reduce_collapses(self, rng):
        arr = rng.random((5, 1, 4)).astype(np.float32)
        img = MedicalImage(array=arr, spacing=(2.0, 403.5, 1.5),
                           origin=(1.0, 2.0, 3.0), direction=np.diag([-1.0, -1.0, 1.0]))
        out = reduce_dimensions(img)
        assert out.dim == 2
        assert out.size == (4, 5)
        assert out.spacing == (2.0, 1.5)
        np.testing.assert_array_equal(out.array, arr[:, 0, :])

    def test_reduce_min_dims(self, rng):
        arr = rng.random((5, 1, 1)).astype(np.float32)
        img = MedicalImage(array=arr)
        out = reduce_dimensions(img, min_dims=2)
        assert out.dim == 2
        assert out.size == (1, 5)

    def test_restore_roundtrip(self, rng):
        arr = rng.random((5, 1, 4)).astype(np.float32)
        ref = MedicalImage(array=arr, spacing=(2.0, 403.5, 1.5),
                           origin=(1.0, 2.0, 3.0))
        img2d = reduce_dimensions(ref)
        back = restore_dimension(img2d, ref)
        assert back.size == ref.size
        np.testing.assert_array_equal(back.array, arr)
        assert back.spacing == ref.spacing


class TestResample:
    def test_prefilter_matches_scipy(self, rng):
        import jax.numpy as jnp
        x = rng.random(31).astype(np.float64)
        ours = np.asarray(bspline_prefilter_1d(jnp.asarray(x)))
        ref = ndi.spline_filter1d(x, order=3, mode='mirror')
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)

    def test_resize_matches_map_coordinates(self, rng):
        x = rng.random((25, 19)).astype(np.float64)
        out_shape = (37, 11)
        ours = resize_to_shape(x, out_shape, order=3, outside='edge')
        coords = np.meshgrid(*[(np.arange(o) + 0.5) * (i / o) - 0.5
                               for i, o in zip(x.shape, out_shape)], indexing='ij')
        ref = ndi.map_coordinates(x, np.stack(coords), order=3, mode='mirror')
        # boundary-mode conventions differ only where the sampling coordinate
        # itself falls outside [0, n-1] (the outermost output row/column);
        # interior samples must match scipy exactly
        np.testing.assert_allclose(ours[1:-1, 1:-1], ref[1:-1, 1:-1],
                                   rtol=1e-4, atol=1e-5)
        assert np.all(np.isfinite(ours))
        assert ours.min() >= x.min() - 0.2 and ours.max() <= x.max() + 0.2

    def test_resize_linear(self, rng):
        x = rng.random((16, 12)).astype(np.float32)
        ours = resize_to_shape(x, (8, 6), order=1)
        coords = np.meshgrid(*[(np.arange(o) + 0.5) * (i / o) - 0.5
                               for i, o in zip(x.shape, (8, 6))], indexing='ij')
        ref = ndi.map_coordinates(x.astype(np.float64), np.stack(coords),
                                  order=1, mode='nearest')
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    def test_resample_identity_nop(self, rng):
        img = MedicalImage(array=rng.random((6, 5)).astype(np.float32),
                           spacing=(1.0, 1.0))
        out = resample(img, 1.0)
        assert out is img

    def test_resample_spacing_size(self, rng):
        img = MedicalImage(array=rng.random((10, 20)).astype(np.float32),
                           spacing=(1.0, 2.0))
        out = resample(img, 1.0)
        # auto size: int(0.5 + n*s_old/s_new)
        assert out.size == (20, 20)
        assert out.spacing == (1.0, 1.0)

    def test_resample_labels_nearest(self):
        arr = np.zeros((8, 8), np.uint8)
        arr[2:6, 2:6] = 3
        img = MedicalImage(array=arr, spacing=(2.0, 2.0))
        out = resample(img, 1.0)
        assert out.array.dtype == np.uint8
        assert set(np.unique(out.array)) <= {0, 3}
        assert out.size == (16, 16)
        # input mask spans indices 2..5 (physical 4..10 mm); on the 1 mm
        # grid NN (round-half-up) selects rows 3..10: 8x8 block, mean 6.5
        ys, xs = np.nonzero(out.array)
        assert (ys.min(), ys.max(), xs.min(), xs.max()) == (3, 10, 3, 10)
        assert ys.mean() == 6.5 and xs.mean() == 6.5

    def test_resample_preserves_center(self, rng):
        img = MedicalImage(array=rng.random((11, 13)).astype(np.float32),
                           spacing=(1.7, 0.9), origin=(5.0, -2.0))
        out = resample(img, 1.0)
        c_in = img.index_to_physical(np.multiply(img.size, 0.5).astype(int))
        c_out = out.index_to_physical(np.multiply(out.size, 0.5).astype(int))
        np.testing.assert_allclose(c_in, c_out, atol=1e-9)

    def test_resample_values_linear_upsample(self):
        # smooth ramp: cubic resample must reproduce it almost exactly
        y, x = np.mgrid[0:16, 0:16].astype(np.float32)
        img = MedicalImage(array=(2 * x + 3 * y), spacing=(2.0, 2.0))
        out = resample(img, 1.0)
        yy, xx = np.mgrid[0:32, 0:32].astype(np.float64)
        # interior should match the linear ramp at resampled coordinates
        inner = out.array[8:-8, 8:-8]
        # gradient halves with the spacing
        gx = np.diff(inner, axis=1).mean()
        gy = np.diff(inner, axis=0).mean()
        assert abs(gx - 1.0) < 1e-3 and abs(gy - 1.5) < 1e-3


class TestNormalize:
    def test_ct_norm(self):
        import jax.numpy as jnp
        x = jnp.asarray(np.array([-2000.0, 0.0, 5000.0], np.float32))
        out = np.asarray(norm.ct_normalize(x, mean=100.0, std=50.0,
                                           lower=-1000.0, upper=2000.0))
        np.testing.assert_allclose(out, [(-1000 - 100) / 50, (0 - 100) / 50,
                                         (2000 - 100) / 50], rtol=1e-6)

    def test_zscore(self, rng):
        import jax.numpy as jnp
        x = rng.random((32, 32)).astype(np.float32)
        out = np.asarray(norm.zscore_normalize(jnp.asarray(x)))
        assert abs(out.mean()) < 1e-5
        assert abs(out.std() - 1.0) < 1e-4

    def test_auto_window_percentile(self, rng):
        x = rng.random(1000)
        lo, hi = norm.auto_window(x, 'pc5')
        np.testing.assert_allclose([lo, hi], np.percentile(x, [5, 95]))
        lo2, hi2 = norm.auto_window(x, 'pc2-98')
        np.testing.assert_allclose([lo2, hi2], np.percentile(x, [2, 98]))

    def test_window(self):
        import jax.numpy as jnp
        x = jnp.asarray(np.array([0.0, 50.0, 100.0, 200.0], np.float32))
        out = np.asarray(norm.intensity_window(x, 0.0, 100.0))
        np.testing.assert_allclose(out, [0.0, 127.5, 255.0, 255.0])


class TestGaussian:
    def test_matches_filtered_delta(self):
        patch = (32, 48)
        g = gaussian_map(patch)
        tmp = np.zeros(patch)
        tmp[patch[0] // 2, patch[1] // 2] = 1
        ref = ndi.gaussian_filter(tmp, sigma=[p / 8 for p in patch], mode='constant')
        ref = ref / ref.max()
        # analytic center differs from the even-size delta center by half a
        # voxel; compare after aligning maxima and allow small tolerance
        assert g.max() == 1.0
        assert g.min() > 0
        c = np.unravel_index(np.argmax(g), g.shape)
        assert c == (patch[0] // 2, patch[1] // 2) or c == ((patch[0] - 1) // 2, (patch[1] - 1) // 2)
        corr = np.corrcoef(g.ravel(), ref.ravel())[0, 1]
        assert corr > 0.99


class TestRealAssets:
    def test_project_real_ct(self):
        img = read_image(asset_path('sample_s0521.nrrd'))
        img = reorient(img, 'RAI')
        mip = project(img, mode='max', axis='coronal')
        aip = project(img, mode='mean', axis='coronal')
        assert mip.size == (53, 1, 133)
        assert mip.array.max() == img.array.max()
        assert float(np.squeeze(aip.array).mean()) == pytest.approx(
            float(img.array.mean()), rel=1e-4)


class TestAllOrientations:
    def test_all_48_orientations_roundtrip(self, rng):
        """Every axis permutation x flip combination must reorient to RAI
        with voxel values preserved at their physical positions."""
        import itertools
        arr = rng.random((3, 4, 5)).astype(np.float32)
        base = MedicalImage(array=arr, spacing=(1.0, 2.0, 3.0),
                            origin=(1.0, -2.0, 3.0))
        count = 0
        for perm in itertools.permutations(range(3)):
            for signs in itertools.product((1, -1), repeat=3):
                D = np.zeros((3, 3))
                for j, (p, s) in enumerate(zip(perm, signs)):
                    D[p, j] = s
                img = base.replace(direction=D)
                out = reorient(img, 'RAI')
                assert np.allclose(out.direction, np.eye(3)), (perm, signs)
                # spot-check: voxel at output index (1,2,0) must carry the
                # value of the input voxel at the same physical point
                p_out = out.index_to_physical([1, 2, 0])
                idx_in = np.rint(img.physical_to_index(p_out)).astype(int)
                v_out = out.array[0, 2, 1]
                v_in = img.array[idx_in[2], idx_in[1], idx_in[0]]
                assert v_out == v_in, (perm, signs)
                count += 1
        assert count == 48


class TestMaskedNorm:
    def test_masked_zscore_leaves_background(self, rng):
        import jax.numpy as jnp
        x = np.zeros((20, 20), np.float32)
        x[5:15, 5:15] = rng.standard_normal((10, 10)).astype(np.float32) + 10
        mask = x != 0
        out = np.asarray(norm.zscore_normalize(jnp.asarray(x),
                                               jnp.asarray(mask)))
        # nnU-Net semantics: out-of-mask voxels keep their original value
        np.testing.assert_array_equal(out[~mask], x[~mask])
        inner = out[mask]
        assert abs(inner.mean()) < 1e-4 and abs(inner.std() - 1.0) < 1e-3

    def test_nonzero_norm_mask_fills_holes(self):
        from totalsegmentator2d_tpu.ops.normalize import nonzero_norm_mask
        arr = np.zeros((10, 10, 1), np.float32)
        arr[2:8, 2:8] = 1.0
        arr[4:6, 4:6] = 0.0  # interior hole
        mask = nonzero_norm_mask(arr)
        assert mask[5, 5]            # hole filled (create_nonzero_mask)
        assert not mask[0, 0]

    def test_normalize_channels_mixed_schemes(self, rng):
        import jax.numpy as jnp
        from totalsegmentator2d_tpu.models.plans import PreprocessSpec
        from totalsegmentator2d_tpu.ops.normalize import normalize_channels
        pre = PreprocessSpec(
            spacing=(1.0, 1.0), patch_size=(8, 8),
            normalization_schemes=('CTNormalization', 'ZScoreNormalization'),
            use_mask_for_norm=(False, True),
            intensity_properties=({'mean': 0.0, 'std': 1.0,
                                   'percentile_00_5': -10.0,
                                   'percentile_99_5': 10.0}, None))
        x = rng.standard_normal((12, 12, 2)).astype(np.float32)
        mask = jnp.asarray(np.ones((12, 12), bool))
        out = np.asarray(normalize_channels(jnp.asarray(x), pre, mask))
        assert out.shape == x.shape
        # channel 0: CT clip to [-10, 10]
        assert out[..., 0].max() <= 10.0 and out[..., 0].min() >= -10.0


class TestProjectMulti:
    def test_fused_modes_match_project(self, rng):
        from totalsegmentator2d_tpu.ops.projection import project, project_multi
        arr = np.clip(rng.normal(40, 300, (20, 16, 24)),
                      -1024, 3071).astype(np.int16)
        img = MedicalImage(array=arr, spacing=(1.0, 1.5, 2.0))
        outs = project_multi(img, ('max', 'mean'), axis='coronal')
        ref_max = project(img, mode='max', axis='coronal')
        np.testing.assert_array_equal(
            outs[0].array, ref_max.array.astype(np.float32))
        assert outs[0].spacing == ref_max.spacing
        ref_mean = project(img, mode='mean', axis='coronal')
        np.testing.assert_allclose(outs[1].array, ref_mean.array, rtol=1e-6)

    def test_parameterized_modes_dispatch_fully(self, rng):
        """slice:/multiclass:/std modes must keep working through
        project_multi (full project() dispatch per mode)."""
        from totalsegmentator2d_tpu.ops.projection import project, project_multi
        arr = rng.standard_normal((10, 8, 12)).astype(np.float32)
        img = MedicalImage(array=arr, spacing=(1.0, 1.0, 1.0))
        outs = project_multi(img, ('max', 'slice:middle'), axis='coronal')
        ref = project(img, mode='slice:middle', axis='coronal')
        np.testing.assert_allclose(outs[1].array,
                                   ref.array.astype(np.float32), rtol=1e-6)
