"""Native C++ codec (csrc/ts2dio.cc) vs the Python zlib fallback."""

import os
import subprocess
import zlib

import pytest

from totalsegmentator2d_tpu.io import native

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _ensure_built():
    so = os.path.join(_REPO, 'totalsegmentator2d_tpu', '_native', 'libts2dio.so')

    def _stale():
        # a library built before the newest kernel existed must be
        # rebuilt, not silently exercised through the numpy fallback
        import ctypes
        try:
            lib = ctypes.CDLL(so)
            return any(getattr(lib, sym, None) is None
                       for sym in ('ts2dio_project_max_mean_i16',
                                   'ts2dio_jpegll_decode_diffs'))
        except OSError:
            return True

    if not os.path.exists(so) or _stale():
        subprocess.run(['make', '-C', os.path.join(_REPO, 'csrc')], check=True,
                       capture_output=True)
    # reset the lazy loader so this process picks the fresh build up
    native._checked = False
    native._lib = None
    return native.native_available()


@pytest.fixture(scope='module')
def built():
    if not _ensure_built():
        pytest.skip('native codec not available and could not be built')
    return True


def test_roundtrip_gzip(built, rng):
    data = rng.integers(0, 255, size=300_000).astype('uint8').tobytes() + b'\0' * 100_000
    gz = native.gzip_compress(data, level=1)
    assert native.gzip_decompress(gz) == data


def test_interop_with_python_zlib(built, rng):
    data = rng.integers(0, 64, size=100_000).astype('uint8').tobytes()
    # native-compressed stream decodes with stdlib, and vice versa
    assert zlib.decompress(native.gzip_compress(data), wbits=47) == data
    c = zlib.compressobj(6, zlib.DEFLATED, 31)
    py_gz = c.compress(data) + c.flush()
    assert native.gzip_decompress(py_gz) == data
    # zlib-framed payloads (MetaImage) also decode through the same entry
    assert native.gzip_decompress(zlib.compress(data)) == data
    assert zlib.decompress(native.zlib_compress(data)) == data


def test_corrupt_input_raises(built):
    with pytest.raises(Exception):
        native.gzip_decompress(b'\x1f\x8b' + b'garbage-not-a-stream')


def test_fallback_equivalence(built, rng, monkeypatch):
    data = rng.integers(0, 16, size=50_000).astype('uint8').tobytes()
    gz = native.gzip_compress(data)
    # force the Python fallback and confirm identical results
    monkeypatch.setattr(native, '_lib', None)
    monkeypatch.setattr(native, '_checked', True)
    assert not native.native_available()
    assert native.gzip_decompress(gz) == data


class TestProjectionKernel:
    def test_max_mean_matches_numpy(self, built, rng):
        import numpy as np
        vol = np.clip(rng.normal(40, 300, (40, 30, 50)),
                      -1024, 3071).astype(np.int16)
        res = native.project_max_mean(vol)
        assert res is not None
        mx, mn = res
        np.testing.assert_array_equal(mx, vol.max(axis=1).astype(np.float32))
        # int64-sum mean is exact (numpy float64 reference)
        np.testing.assert_array_equal(
            mn, vol.mean(axis=1, dtype=np.float64).astype(np.float32))

    def test_non_applicable_inputs_fall_back(self, built, rng):
        import numpy as np
        vol = rng.standard_normal((8, 6, 5)).astype(np.float32)
        assert native.project_max_mean(vol) is None          # dtype
        v2 = rng.integers(-50, 50, (8, 6)).astype(np.int16)
        assert native.project_max_mean(v2) is None           # ndim
        v3 = np.asfortranarray(
            rng.integers(-50, 50, (8, 6, 5)).astype(np.int16))
        assert native.project_max_mean(v3) is None           # layout

    def test_project_arrays_np_fused_equals_per_mode(self, built, rng):
        import numpy as np
        from totalsegmentator2d_tpu.ops.projection import (
            project_array_np, project_arrays_np)
        vol = np.clip(rng.normal(40, 300, (30, 20, 25)),
                      -1024, 3071).astype(np.int16)
        mx, mn = project_arrays_np(vol, ('max', 'mean'), 1)
        np.testing.assert_array_equal(
            np.asarray(mx, np.float32),
            project_array_np(vol, 'max', 1).astype(np.float32))
        np.testing.assert_array_equal(mn, project_array_np(vol, 'mean', 1))
        # non-fusable mode sets fall back per-mode
        outs = project_arrays_np(vol, ('max', 'std'), 1)
        np.testing.assert_array_equal(outs[0], project_array_np(vol, 'max', 1))
        np.testing.assert_allclose(outs[1], project_array_np(vol, 'std', 1))
