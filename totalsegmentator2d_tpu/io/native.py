"""Native codec bindings.

Hot host-side byte work (gzip/zlib inflate+deflate for NRRD/NIfTI/MetaImage
payloads) is delegated to the C++ library ``libts2dio`` (csrc/ts2dio.cc, built
via ``make -C csrc``) through ctypes. When the shared library is absent the
pure-Python zlib module is used — identical results, just slower on large
volumes. The reference delegated this work to ITK's C++ IO classes; here it
is an in-tree native component.
"""

from __future__ import annotations

import ctypes
import os
import zlib

_lib = None
_checked = False


def _load():
    global _lib, _checked
    if _checked:
        return _lib
    _checked = True
    here = os.path.dirname(os.path.abspath(__file__))
    cand = os.path.join(os.path.dirname(here), '_native', 'libts2dio.so')
    if os.environ.get('TS2D_NO_NATIVE'):
        return None
    if os.path.exists(cand):
        try:
            lib = ctypes.CDLL(cand)
            lib.ts2dio_inflate.restype = ctypes.c_longlong
            lib.ts2dio_inflate.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.c_char_p, ctypes.c_size_t]
            lib.ts2dio_inflate_bound.restype = ctypes.c_longlong
            lib.ts2dio_inflate_bound.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
            lib.ts2dio_deflate_gzip.restype = ctypes.c_longlong
            lib.ts2dio_deflate_gzip.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int]
            lib.ts2dio_deflate_zlib.restype = ctypes.c_longlong
            lib.ts2dio_deflate_zlib.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int]
            _lib = lib
        except OSError:
            _lib = None
    return _lib


def native_available() -> bool:
    return _load() is not None


def gzip_decompress(data: bytes) -> bytes:
    """Inflate a gzip- or zlib-wrapped payload (NRRD 'gzip', NIfTI .gz,
    MetaImage zlib all route through here)."""
    lib = _load()
    if lib is not None:
        size = lib.ts2dio_inflate_bound(data, len(data))
        if size >= 0:
            out = ctypes.create_string_buffer(size)
            got = lib.ts2dio_inflate(data, len(data), out, size)
            if got >= 0:
                return out.raw[:got]
    if data[:2] == b'\x1f\x8b':
        # gzip framing: gzip.decompress handles multi-member streams
        # (pigz/bgzip/concatenated writers), which zlib wbits=47 would
        # silently truncate to the first member
        import gzip
        return gzip.decompress(data)
    return zlib.decompress(data)


def gzip_compress(data: bytes, level: int = 1) -> bytes:
    """Deflate to gzip format (NRRD 'gzip' encoding)."""
    lib = _load()
    if lib is not None:
        bound = len(data) + (len(data) >> 9) + 128
        out = ctypes.create_string_buffer(bound)
        got = lib.ts2dio_deflate_gzip(data, len(data), out, bound, int(level))
        if got >= 0:
            return out.raw[:got]
    c = zlib.compressobj(level, zlib.DEFLATED, 31)
    return c.compress(data) + c.flush()


def zlib_compress(data: bytes, level: int = 1) -> bytes:
    """Deflate to zlib format (MetaImage CompressedData)."""
    lib = _load()
    if lib is not None:
        bound = len(data) + (len(data) >> 9) + 128
        out = ctypes.create_string_buffer(bound)
        got = lib.ts2dio_deflate_zlib(data, len(data), out, bound, int(level))
        if got >= 0:
            return out.raw[:got]
    return zlib.compress(data, level)
