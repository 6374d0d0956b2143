"""Native C++ codec (csrc/ts2dio.cc) vs the Python zlib fallback."""

import os
import subprocess
import zlib

import pytest

from totalsegmentator2d_tpu.io import native

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _ensure_built():
    so = os.path.join(_REPO, 'totalsegmentator2d_tpu', '_native', 'libts2dio.so')
    if not os.path.exists(so):
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
