"""ctypes binding to the system CharLS codec (libcharls.so.2) — the
independent oracle for io/jpegls.py. Test-only: the product decoder is
the from-scratch T.87 implementation; CharLS merely supplies encoded
fixtures (and reference decodes) the way Pillow/openjpeg does for
io/jpeg2k.py and libjpeg does for io/jpegdct.py."""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np

_lib = None
_checked = False


class _FrameInfo(ctypes.Structure):
    _fields_ = [('width', ctypes.c_uint32), ('height', ctypes.c_uint32),
                ('bits_per_sample', ctypes.c_int32),
                ('component_count', ctypes.c_int32)]


class _PresetParams(ctypes.Structure):
    _fields_ = [('maximum_sample_value', ctypes.c_int32),
                ('threshold1', ctypes.c_int32),
                ('threshold2', ctypes.c_int32),
                ('threshold3', ctypes.c_int32),
                ('reset_value', ctypes.c_int32)]


def load():
    global _lib, _checked
    if _checked:
        return _lib
    _checked = True
    for name in ('libcharls.so.2', 'libcharls.so',
                 ctypes.util.find_library('charls')):
        if not name:
            continue
        try:
            _lib = ctypes.CDLL(name)
            break
        except OSError:
            continue
    if _lib is not None:
        _lib.charls_jpegls_encoder_create.restype = ctypes.c_void_p
        _lib.charls_jpegls_decoder_create.restype = ctypes.c_void_p
    return _lib


def available() -> bool:
    return load() is not None


def _check(rc, what):
    if rc != 0:
        raise RuntimeError(f'CharLS {what} failed with code {rc}')


def encode(arr: np.ndarray, bits: int, near: int = 0,
           preset: tuple = None) -> bytes:
    """Encode a (rows, cols) array as one JPEG-LS stream."""
    lib = load()
    h, w = arr.shape
    enc = ctypes.c_void_p(lib.charls_jpegls_encoder_create())
    try:
        fi = _FrameInfo(w, h, bits, 1)
        _check(lib.charls_jpegls_encoder_set_frame_info(
            enc, ctypes.byref(fi)), 'set_frame_info')
        if near:
            _check(lib.charls_jpegls_encoder_set_near_lossless(enc, near),
                   'set_near_lossless')
        if preset is not None:
            pp = _PresetParams(*preset)
            _check(lib.charls_jpegls_encoder_set_preset_coding_parameters(
                enc, ctypes.byref(pp)), 'set_preset')
        dst = ctypes.create_string_buffer(arr.size * 4 + 1024)
        _check(lib.charls_jpegls_encoder_set_destination_buffer(
            enc, dst, len(dst)), 'set_destination')
        src = np.ascontiguousarray(
            arr, np.uint8 if bits <= 8 else '<u2').tobytes()
        _check(lib.charls_jpegls_encoder_encode_from_buffer(
            enc, src, len(src), 0), 'encode')
        n = ctypes.c_size_t()
        _check(lib.charls_jpegls_encoder_get_bytes_written(
            enc, ctypes.byref(n)), 'get_bytes_written')
        return dst.raw[:n.value]
    finally:
        lib.charls_jpegls_encoder_destroy(enc)


def decode(data: bytes, h: int, w: int, bits: int) -> np.ndarray:
    """Reference decode of one JPEG-LS stream."""
    lib = load()
    dec = ctypes.c_void_p(lib.charls_jpegls_decoder_create())
    try:
        _check(lib.charls_jpegls_decoder_set_source_buffer(
            dec, data, len(data)), 'set_source')
        _check(lib.charls_jpegls_decoder_read_header(dec), 'read_header')
        itemsize = 1 if bits <= 8 else 2
        out = ctypes.create_string_buffer(h * w * itemsize)
        _check(lib.charls_jpegls_decoder_decode_to_buffer(
            dec, out, len(out), 0), 'decode')
        dt = np.uint8 if bits <= 8 else np.dtype('<u2')
        return np.frombuffer(out.raw, dt).reshape(h, w)
    finally:
        lib.charls_jpegls_decoder_destroy(dec)
