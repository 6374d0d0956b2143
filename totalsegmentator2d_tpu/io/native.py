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
import threading
import zlib

_lib = None
_checked = False

# Threads belonging to a FILE-level decode pool (io/dicom.py series
# ingest) set .in_file_worker here; nested decode stages (io/jpeg2k.py's
# per-code-block pool) consult it and stay serial inside such workers so
# the two levels of parallelism never oversubscribe the cores.
decode_worker_local = threading.local()


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
            fn = getattr(lib, 'ts2dio_project_max_mean_i16', None)
            if fn is not None:  # absent in pre-kernel builds of the lib
                fn.restype = ctypes.c_longlong
                fn.argtypes = [
                    ctypes.c_void_p, ctypes.c_longlong,
                    ctypes.c_longlong, ctypes.c_longlong,
                    ctypes.c_void_p, ctypes.c_void_p]
            # behavioral ABI: entry points whose SEMANTICS changed after
            # their symbol first shipped are only used at a matching
            # version (v2 hardened jpegll/jpegdct truncation handling); a
            # stale prebuilt .so silently falls back to Python for them
            ver_fn = getattr(lib, 'ts2dio_abi_version', None)
            if ver_fn is not None:
                ver_fn.restype = ctypes.c_longlong
                abi = int(ver_fn())
            else:
                abi = 1
            fn = getattr(lib, 'ts2dio_jpegll_decode_diffs', None)
            if fn is not None and abi >= 2:
                fn.restype = ctypes.c_longlong
                fn.argtypes = [
                    ctypes.c_char_p, ctypes.c_size_t,
                    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_longlong]
            fn = getattr(lib, 'ts2dio_jpegdct_decode_blocks', None)
            if fn is not None and abi >= 2:
                fn.restype = ctypes.c_longlong
                fn.argtypes = [
                    ctypes.c_char_p, ctypes.c_size_t,
                    ctypes.c_void_p, ctypes.c_void_p,
                    ctypes.c_void_p, ctypes.c_longlong]
            lib._ts2d_abi = abi
            fn = getattr(lib, 'ts2dio_j2k_t1_decode', None)
            if fn is not None:  # absent in pre-decoder builds of the lib
                fn.restype = ctypes.c_longlong
                fn.argtypes = [
                    ctypes.c_char_p, ctypes.c_void_p, ctypes.c_void_p,
                    ctypes.c_longlong, ctypes.c_longlong, ctypes.c_longlong,
                    ctypes.c_longlong, ctypes.c_longlong,
                    ctypes.c_char_p, ctypes.c_char_p,
                    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
            fn = getattr(lib, 'ts2dio_jpegdct_reconstruct', None)
            if fn is not None:  # absent in pre-reconstruct builds
                fn.restype = ctypes.c_longlong
                fn.argtypes = [
                    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                    ctypes.c_void_p,
                    ctypes.c_longlong, ctypes.c_longlong,
                    ctypes.c_longlong, ctypes.c_longlong,
                    ctypes.c_longlong, ctypes.c_void_p]
            fn = getattr(lib, 'ts2dio_j2k_t1_block', None)
            if fn is not None:  # absent in pre-fusion builds of the lib
                fn.restype = ctypes.c_longlong
                fn.argtypes = [
                    ctypes.c_char_p, ctypes.c_void_p, ctypes.c_void_p,
                    ctypes.c_longlong, ctypes.c_longlong, ctypes.c_longlong,
                    ctypes.c_longlong, ctypes.c_longlong,
                    ctypes.c_char_p, ctypes.c_char_p,
                    ctypes.c_longlong, ctypes.c_double,
                    ctypes.c_void_p, ctypes.c_longlong]
            for nm in ('ts2dio_j2k_idwt53', 'ts2dio_j2k_idwt97'):
                fn = getattr(lib, nm, None)
                if fn is not None:  # absent in pre-DWT builds of the lib
                    fn.restype = ctypes.c_longlong
                    fn.argtypes = [
                        ctypes.c_void_p, ctypes.c_void_p,
                        ctypes.c_void_p, ctypes.c_void_p,
                        ctypes.c_longlong, ctypes.c_longlong,
                        ctypes.c_longlong, ctypes.c_longlong,
                        ctypes.c_void_p]
            fn = getattr(lib, 'ts2dio_jpegls_decode', None)
            if fn is not None:  # absent in pre-decoder builds of the lib
                fn.restype = ctypes.c_longlong
                fn.argtypes = [
                    ctypes.c_char_p, ctypes.c_size_t,
                    ctypes.c_longlong, ctypes.c_longlong,
                    ctypes.c_longlong, ctypes.c_longlong,
                    ctypes.c_longlong, ctypes.c_longlong,
                    ctypes.c_longlong, ctypes.c_longlong, ctypes.c_void_p]
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


def jpegll_decode_diffs(seg: bytes, lut, count: int):
    """Huffman-decode ``count`` JPEG-lossless differences from one
    (unstuffed) entropy segment using the native decoder. ``lut`` is the
    64k-entry uint32 peek table built in io/jpegll.py. Returns an int32
    array, or None when the native library is absent (the pure-Python
    fallback in jpegll.py applies)."""
    import numpy as np
    lib = _load()
    if lib is None:
        return None
    fn = getattr(lib, 'ts2dio_jpegll_decode_diffs', None)
    if fn is None or getattr(lib, '_ts2d_abi', 1) < 2:
        return None  # absent, or stale pre-hardening semantics
    lut = np.ascontiguousarray(lut, np.uint32)
    out = np.empty(count, np.int32)
    got = fn(seg, len(seg), lut.ctypes.data, out.ctypes.data, count)
    if got != count:
        from .jpegll import JpegError
        raise JpegError('Truncated entropy segment (stream ended '
                        'mid-sample)' if got == -4 else
                        'Invalid Huffman code in entropy data')
    return out


def jpegdct_decode_blocks(seg: bytes, dc_lut, ac_lut, nblocks: int):
    """Huffman-decode ``nblocks`` 8x8 coefficient blocks (zigzag order, DC
    prediction applied) from one (unstuffed) sequential-DCT entropy segment
    using the native decoder. ``dc_lut``/``ac_lut`` are the 64k-entry uint32
    peek tables built in io/jpegdct.py. Returns an (nblocks, 64) int32
    array, or None when the native library is absent (the pure-Python
    fallback in jpegdct.py applies)."""
    import numpy as np
    lib = _load()
    if lib is None:
        return None
    fn = getattr(lib, 'ts2dio_jpegdct_decode_blocks', None)
    if fn is None or getattr(lib, '_ts2d_abi', 1) < 2:
        return None  # absent, or stale pre-hardening semantics
    dc_lut = np.ascontiguousarray(dc_lut, np.uint32)
    ac_lut = np.ascontiguousarray(ac_lut, np.uint32)
    out = np.zeros((nblocks, 64), np.int32)
    got = fn(seg, len(seg), dc_lut.ctypes.data, ac_lut.ctypes.data,
             out.ctypes.data, nblocks)
    if got != nblocks:
        from .jpegll import JpegError
        raise JpegError('Invalid Huffman code in entropy data'
                        if got == -2 else
                        'AC run past end of block' if got == -3 else
                        'Truncated entropy segment (stream ended '
                        'mid-block)' if got == -4 else
                        f'native JPEG decode failed (code {got})')
    return out


def j2k_t1_decode(segments, w: int, h: int, style: int, start_plane: int,
                  sig_tab, sign_lut):
    """Run a JPEG 2000 code block's Tier-1 coding passes in the native
    decoder. ``segments`` is the [(bytes, n_passes), ...] list exactly as
    io/jpeg2k.py's _BlockDecoder.run receives it (already merged across
    layers unless termination-on-each-pass is set); ``sig_tab`` the
    75-entry uint8 significance-context row for the block's orientation;
    ``sign_lut`` the (9, 2) uint8 sign table. Returns (mag, lastp, signs)
    arrays, or None when the native library is absent (the pure-Python
    Tier-1 in jpeg2k.py applies). Raises Jpeg2kError on corrupt streams,
    mirroring the Python loop's errors."""
    import numpy as np
    lib = _load()
    if lib is None:
        return None
    fn = getattr(lib, 'ts2dio_j2k_t1_decode', None)
    if fn is None:  # stale library built before the decoder existed
        return None
    data = b''.join(d for d, _ in segments)
    seg_lens = np.array([len(d) for d, _ in segments], np.int64)
    seg_passes = np.array([n for _, n in segments], np.int64)
    sig_tab = np.ascontiguousarray(sig_tab, np.uint8)
    sign_lut = np.ascontiguousarray(sign_lut, np.uint8)
    mag = np.zeros((h, w), np.int32)
    lastp = np.zeros((h, w), np.int32)
    signs = np.zeros((h, w), np.uint8)
    got = fn(data, seg_lens.ctypes.data, seg_passes.ctypes.data,
             len(segments), w, h, style, start_plane,
             sig_tab.tobytes(), sign_lut.tobytes(),
             mag.ctypes.data, lastp.ctypes.data, signs.ctypes.data)
    if got < 0:
        from .jpeg2k import Jpeg2kError
        raise Jpeg2kError(
            'More coding passes than bit planes' if got == -2 else
            'Segmentation symbol mismatch (corrupt entropy data)'
            if got == -3 else f'native Tier-1 decode failed (code {got})')
    return mag, lastp, signs


def jpegdct_reconstruct(coefs, q, zigzag, m, bw: int, bh: int, rows: int,
                        cols: int, precision: int):
    """Dequantize + de-zigzag + 2-D IDCT + level shift + reassemble all
    of a sequential-DCT JPEG's blocks in the native library. ``coefs`` is
    the (nblocks, 64) int32 zigzag-order output of the entropy decoder;
    ``q``/``zigzag``/``m`` are the caller's quantizer row, zigzag map and
    orthonormal IDCT matrix (identical constants to the numpy path; both
    round half-even, so outputs can differ only by ±1 where a .5-boundary
    falls on opposite sides of the two summation orders — within the
    codec's own T.83 decoder tolerance). Returns the (rows, cols) uint8/
    uint16 image, or None when the native library is absent."""
    import numpy as np
    lib = _load()
    if lib is None:
        return None
    fn = getattr(lib, 'ts2dio_jpegdct_reconstruct', None)
    if fn is None:  # stale library built before the kernel existed
        return None
    coefs = np.ascontiguousarray(coefs, np.int32)
    if coefs.shape != (bw * bh, 64):
        # the C loop would read past a short buffer where the numpy
        # fallback's reshape raises; refuse and let the fallback surface it
        return None
    q = np.ascontiguousarray(q, np.uint16)
    zigzag = np.ascontiguousarray(zigzag, np.int32)
    m = np.ascontiguousarray(m, np.float64)
    out = np.empty((rows, cols), np.uint8 if precision == 8 else np.uint16)
    got = fn(coefs.ctypes.data, q.ctypes.data, zigzag.ctypes.data,
             m.ctypes.data, bw, bh, rows, cols, precision, out.ctypes.data)
    if got != rows * cols:
        return None
    return out


def j2k_t1_block(segments, w: int, h: int, style: int, start_plane: int,
                 sig_tab, sign_lut, reversible: bool, delta: float, dst):
    """One-call code-block decode: Tier-1 passes + midpoint
    reconstruction (+ dequantization by ``delta`` on the irreversible
    path), written directly into ``dst`` — a 2D view into the band's
    coefficient array (int64 when reversible, float64 otherwise; rows
    must be contiguous). Returns True on success, False when the native
    library/entry is absent (callers fall back to j2k_t1_decode or the
    pure-Python loop). Raises Jpeg2kError on corrupt streams."""
    import numpy as np
    lib = _load()
    if lib is None:
        return False
    fn = getattr(lib, 'ts2dio_j2k_t1_block', None)
    if fn is None:  # stale library built before the fused entry existed
        return False
    want = np.int64 if reversible else np.float64
    if (dst.dtype != want or dst.ndim != 2
            or dst.strides[1] != dst.itemsize
            or dst.strides[0] % dst.itemsize):
        return False
    data = b''.join(d for d, _ in segments)
    seg_lens = np.array([len(d) for d, _ in segments], np.int64)
    seg_passes = np.array([n for _, n in segments], np.int64)
    sig_tab = np.ascontiguousarray(sig_tab, np.uint8)
    sign_lut = np.ascontiguousarray(sign_lut, np.uint8)
    got = fn(data, seg_lens.ctypes.data, seg_passes.ctypes.data,
             len(segments), w, h, style, start_plane,
             sig_tab.tobytes(), sign_lut.tobytes(),
             1 if reversible else 0, float(delta), dst.ctypes.data,
             dst.strides[0] // dst.itemsize)
    if got < 0:
        from .jpeg2k import Jpeg2kError
        raise Jpeg2kError(
            'More coding passes than bit planes' if got == -2 else
            'Segmentation symbol mismatch (corrupt entropy data)'
            if got == -3 else f'native Tier-1 decode failed (code {got})')
    return True


def j2k_idwt_level(ll, hl, lh, hh, x0: int, y0: int, x1: int, y1: int,
                   reversible: bool):
    """One 2D inverse-DWT synthesis level (T.800 Annex F) in the native
    library: interleave the four subbands of region [x0,x1) x [y0,y1) and
    run the 5/3 (int64) or 9/7 (float64) lifting. Bit-identical to
    io/jpeg2k.py's _idwt_level (the library builds with -ffp-contract=off
    so the 9/7 doubles round exactly like numpy). Returns the (h, w)
    array, or None when the native library is absent."""
    import numpy as np
    lib = _load()
    if lib is None:
        return None
    name = 'ts2dio_j2k_idwt53' if reversible else 'ts2dio_j2k_idwt97'
    fn = getattr(lib, name, None)
    if fn is None:  # stale library built before the DWT existed
        return None
    dt = np.int64 if reversible else np.float64
    ll = np.ascontiguousarray(ll, dt)
    hl = np.ascontiguousarray(hl, dt)
    lh = np.ascontiguousarray(lh, dt)
    hh = np.ascontiguousarray(hh, dt)
    out = np.empty((y1 - y0, x1 - x0), dt)
    got = fn(ll.ctypes.data, hl.ctypes.data, lh.ctypes.data, hh.ctypes.data,
             x0, y0, x1, y1, out.ctypes.data)
    if got != (y1 - y0) * (x1 - x0):
        return None
    return out


def jpegls_decode(data: bytes, w: int, h: int, maxval: int, near: int,
                  t1: int, t2: int, t3: int, reset: int):
    """Decode one JPEG-LS scan's entropy data (everything after SOS) in
    the native decoder. Parameters are the resolved coding parameters
    from io/jpegls.py. Returns an (h, w) int32 array, or None when the
    native library is absent (the pure-Python scan loop applies). Raises
    JpegLsError on corrupt streams, mirroring the Python loop."""
    import numpy as np
    lib = _load()
    if lib is None:
        return None
    fn = getattr(lib, 'ts2dio_jpegls_decode', None)
    if fn is None:  # stale library built before the decoder existed
        return None
    out = np.zeros((h, w), np.int32)
    got = fn(data, len(data), w, h, maxval, near, t1, t2, t3, reset,
             out.ctypes.data)
    if got != h * w:
        from .jpegls import JpegLsError
        raise JpegLsError(
            'Truncated entropy segment' if got == -4 else
            'Run length exceeds the line' if got == -5 else
            'Corrupt entropy data (runaway Golomb code)' if got == -6 else
            f'native JPEG-LS decode failed (code {got})')
    return out


def project_max_mean(vol):
    """Fused single-pass coronal MAX+MEAN projection of a C-contiguous
    (Z, Y, X) int16 volume — the CT serving hot path; returns (max, mean)
    float32 (Z, X) arrays, or None when the native library (or dtype)
    doesn't apply. The int16 kernel sums in int64, so the mean is EXACT
    (measured 6.7 ms vs numpy's 15.3 ms two-pass on a 49 MB torso CT).
    float32 volumes measured SLOWER than numpy's pairwise reduction
    (double-width accumulators, 17.8 vs 15.3 ms) and take the fallback."""
    import numpy as np
    lib = _load()
    if lib is None or vol.ndim != 3 or not vol.flags.c_contiguous:
        return None
    if vol.dtype == np.int16:
        fn = getattr(lib, 'ts2dio_project_max_mean_i16', None)
    else:
        return None
    if fn is None:  # stale library built before the kernel existed
        return None
    nz, ny, nx = (int(n) for n in vol.shape)
    out_max = np.empty((nz, nx), np.float32)
    out_mean = np.empty((nz, nx), np.float32)
    got = fn(vol.ctypes.data, nz, ny, nx,
             out_max.ctypes.data, out_mean.ctypes.data)
    if got != nz * nx:
        return None
    return out_max, out_mean
