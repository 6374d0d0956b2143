"""Pure-Python DICOM series reader (io/dicom.py) on synthetic files."""

import os
import struct

import numpy as np
import pytest

from totalsegmentator2d_tpu.io import read_image
from totalsegmentator2d_tpu.io.dicom import (DicomError, is_dicom_dir,
                                             read_dicom_file,
                                             read_dicom_series)

_EXPLICIT = '1.2.840.10008.1.2.1'
_IMPLICIT = '1.2.840.10008.1.2'
_RLE = '1.2.840.10008.1.2.5'
_JPLL = '1.2.840.10008.1.2.4.57'      # JPEG Lossless, any predictor
_JPLL_SV1 = '1.2.840.10008.1.2.4.70'  # JPEG Lossless, selection value 1
_JPB = '1.2.840.10008.1.2.4.50'       # JPEG baseline (8-bit, lossy)
_JPE = '1.2.840.10008.1.2.4.51'       # JPEG extended (12-bit, lossy)
_DEFL = '1.2.840.10008.1.2.1.99'      # deflated explicit little endian
_JLSLL = '1.2.840.10008.1.2.4.80'     # JPEG-LS, lossless only
_J2KLL = '1.2.840.10008.1.2.4.90'     # JPEG 2000, lossless only
_J2K = '1.2.840.10008.1.2.4.91'       # JPEG 2000 (lossy allowed)


def _packbits(data: bytes) -> bytes:
    """Reference PackBits encoder (PS3.5 G.3.1) for building RLE fixtures:
    runs >= 3 become replicate codes, everything else literal blocks."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and data[i + run] == data[i] and run < 127:
            run += 1
        if run >= 3:
            out.append(257 - run)
            out.append(data[i])
            i += run
        else:
            j = i
            while j < n and j - i < 128:
                r = 1
                while j + r < n and data[j + r] == data[j] and r < 3:
                    r += 1
                if r >= 3:
                    break
                j += r
            j = min(j, i + 128)
            out.append(j - i - 1)
            out += data[i:j]
            i = j
    return bytes(out)


def _rle_frame(arr) -> bytes:
    """Encode a (rows, cols) int16/uint16 array as one DICOM RLE frame:
    64-byte header + MSB plane segment + LSB plane segment, each PackBits
    encoded and padded even with the 0x80 no-op."""
    big = arr.astype(arr.dtype.newbyteorder('>')).tobytes()
    segs = []
    for plane in (big[0::2], big[1::2]):
        enc = _packbits(plane)
        if len(enc) % 2:
            enc += b'\x80'
        segs.append(enc)
    offsets = [64, 64 + len(segs[0])] + [0] * 13
    header = struct.pack('<I', 2) + struct.pack('<15I', *offsets)
    return header + segs[0] + segs[1]


def _encapsulate(frame: bytes, split: int = 0) -> bytes:
    """Encapsulated PixelData: OB/undefined length, empty Basic Offset
    Table item, one frame fragment (or two when ``split`` cuts it — PS3.5
    A.4 allows a frame to span fragments), sequence delimiter."""
    if len(frame) % 2:
        frame += b'\x00'
    parts = [frame] if not split else [frame[:split], frame[split:]]
    out = (struct.pack('<HH', 0x7FE0, 0x0010) + b'OB\x00\x00'
           + struct.pack('<I', 0xFFFFFFFF)
           + struct.pack('<HHI', 0xFFFE, 0xE000, 0))
    for part in parts:
        if len(part) % 2:
            part += b'\x00'
        out += struct.pack('<HHI', 0xFFFE, 0xE000, len(part)) + part
    return out + struct.pack('<HHI', 0xFFFE, 0xE0DD, 0)


# --- JPEG Lossless (T.81 process 14) reference encoder for fixtures -------

class _BitWriter:
    """MSB-first bit writer with JPEG byte stuffing (FF -> FF00)."""

    def __init__(self):
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, val: int, bits: int):
        if not bits:
            return
        self._acc = (self._acc << bits) | (val & ((1 << bits) - 1))
        self._n += bits
        while self._n >= 8:
            byte = (self._acc >> (self._n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
            self._n -= 8
            self._acc &= (1 << self._n) - 1

    def flush(self):
        if self._n:
            self.put((1 << (8 - self._n)) - 1, 8 - self._n)  # 1-pad (T.81)


def _jll_predict(recon, y, x, predictor, default):
    """T.81 H.2: first line = default then Ra; first column = Rb."""
    if y == 0:
        return default if x == 0 else int(recon[y][x - 1])
    if x == 0:
        return int(recon[y - 1][x])
    ra, rb = int(recon[y][x - 1]), int(recon[y - 1][x])
    rc = int(recon[y - 1][x - 1])
    return {1: ra, 2: rb, 3: rc, 4: ra + rb - rc, 5: ra + ((rb - rc) >> 1),
            6: rb + ((ra - rc) >> 1), 7: (ra + rb) >> 1}[predictor]


def _jpegll_frame(arr, predictor=1, pt=0, precision=16, dri=0) -> bytes:
    """Encode a (rows, cols) uint16 array as one JPEG Lossless codestream:
    flat 5-bit Huffman table over SSSS 0..16, optional point transform and
    restart intervals (dri in samples, must land on row ends)."""
    vals = (np.asarray(arr, np.uint16) >> pt).astype(np.int64)
    rows, cols = vals.shape
    default = 1 << (precision - pt - 1)

    counts = [0] * 16
    counts[4] = 17  # 17 codes of length 5 (Kraft: 17/32 <= 1)
    symbols = list(range(17))

    data = bytearray()
    bw = _BitWriter()

    def emit(diff):
        d = diff & 0xFFFF
        if d > 32768:
            d -= 65536
        if d == 0:
            bw.put(0, 5)
        elif d == 32768:
            bw.put(16, 5)
        else:
            s = int(abs(d)).bit_length()
            bw.put(s, 5)  # canonical flat table: code == symbol
            bw.put(d if d > 0 else d + (1 << s) - 1, s)

    recon = vals & 0xFFFF  # encoder is lossless in the shifted domain
    n_int, rst, row0 = 0, 0, 0
    for y in range(rows):
        for x in range(cols):
            pred = _jll_predict(recon[row0:], y - row0, x, predictor, default)
            emit(int(vals[y, x]) - pred)
            n_int += 1
            if dri and n_int == dri and (y, x) != (rows - 1, cols - 1):
                bw.flush()
                data += bw.out
                bw.out = bytearray()
                data += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                n_int, row0 = 0, y + 1
    bw.flush()
    data += bw.out

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack('>H', len(payload) + 2) \
            + payload

    dht = seg(0xC4, bytes([0x00]) + bytes(counts) + bytes(symbols))
    sof = seg(0xC3, bytes([precision]) + struct.pack('>HH', rows, cols)
              + bytes([1, 1, 0x11, 0]))
    sos = seg(0xDA, bytes([1, 1, 0x00, predictor, 0, pt]))
    head = b'\xff\xd8' + dht
    if dri:
        head += seg(0xDD, struct.pack('>H', dri))
    return head + sof + sos + bytes(data) + b'\xff\xd9'


# --- sequential-DCT JPEG (T.81 processes 1-2) reference encoder -----------

def _jpegdct_frame(arr, precision=8, q=16, dri=0) -> bytes:
    """Encode a (rows, cols) uint8/uint16 array as one sequential-DCT JPEG
    codestream (SOF0 for 8-bit, SOF1 for 12-bit): flat quantization table
    ``q``, flat Huffman tables (DC: 16 codes of length 5; AC: 256 codes of
    length 9 — Kraft-valid canonical tables where code == symbol), optional
    restart interval ``dri`` in blocks."""
    from totalsegmentator2d_tpu.io.jpegdct import _IDCT_M, _ZIGZAG
    vals = np.asarray(arr, np.int64)
    rows, cols = vals.shape
    bh, bw_ = (rows + 7) // 8, (cols + 7) // 8
    padded = np.pad(vals, ((0, bh * 8 - rows), (0, bw_ * 8 - cols)),
                    mode='edge')
    blocks = padded.reshape(bh, 8, bw_, 8).transpose(0, 2, 1, 3).reshape(
        -1, 8, 8).astype(np.float64)
    blocks -= 1 << (precision - 1)
    # forward DCT is the transpose pair of the decoder's idct2 = M @ X @ M.T
    fdct = np.einsum('ux,nxy,yv->nuv', _IDCT_M.T, blocks, _IDCT_M)
    # zigzag stream order: the i-th transmitted coefficient is the natural
    # (raster) coefficient at index _ZIGZAG[i]
    coefs = np.rint(fdct.reshape(-1, 64) / q).astype(np.int64)[:, _ZIGZAG]

    bw = _BitWriter()
    data = bytearray()

    def put_mag(v, s):
        bw.put(v if v > 0 else v + (1 << s) - 1, s)

    pred = 0
    rst = 0
    for b, zz in enumerate(coefs):
        if dri and b and b % dri == 0:
            bw.flush()
            data += bw.out
            bw.out = bytearray()
            data += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            pred = 0
        diff = int(zz[0]) - pred
        pred = int(zz[0])
        s = int(abs(diff)).bit_length()
        bw.put(s, 5)
        if s:
            put_mag(diff, s)
        run = 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                bw.put(0xF0, 9)  # ZRL
                run -= 16
            s = int(abs(v)).bit_length()
            bw.put((run << 4) | s, 9)
            put_mag(v, s)
            run = 0
        if run:
            bw.put(0x00, 9)  # EOB
    bw.flush()
    data += bw.out

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack('>H', len(payload) + 2) \
            + payload

    qt = np.full(64, q, np.int64)
    if q < 256:
        dqt = seg(0xDB, bytes([0x00]) + bytes(qt.astype(np.uint8)))
    else:
        dqt = seg(0xDB, bytes([0x10]) + qt.astype('>u2').tobytes())
    # AC table: the DHT counts field is one byte per code length, so 256
    # symbols cannot all sit at length 9 — use 255 codes of length 9 plus
    # one of length 10 (Kraft: 255/512 + 1/1024 <= 1). Canonical codes of
    # the length-9 symbols equal the symbol value, which is what the
    # encoder emits; symbol 255 (run 15, size 15) never occurs.
    ac_counts = [0] * 16
    ac_counts[8] = 255
    ac_counts[9] = 1
    dht = (seg(0xC4, bytes([0x00]) + bytes(
               [0, 0, 0, 0, 16] + [0] * 11) + bytes(range(16)))
           + seg(0xC4, bytes([0x10]) + bytes(ac_counts)
                 + bytes(range(256))))
    sof_marker = 0xC0 if precision == 8 else 0xC1
    sof = seg(sof_marker, bytes([precision]) + struct.pack('>HH', rows, cols)
              + bytes([1, 1, 0x11, 0]))
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    head = b'\xff\xd8' + dqt + dht
    if dri:
        head += seg(0xDD, struct.pack('>H', dri))
    return head + sof + sos + bytes(data) + b'\xff\xd9'


def _el_explicit(group, elem, vr, value: bytes) -> bytes:
    if len(value) % 2:
        value += b'\x00' if vr not in (b'US', b'SS') else b''
    head = struct.pack('<HH', group, elem) + vr
    if vr in (b'OB', b'OW', b'SQ', b'UN', b'UT'):
        return head + b'\x00\x00' + struct.pack('<I', len(value)) + value
    return head + struct.pack('<H', len(value)) + value


def _el_implicit(group, elem, value: bytes) -> bytes:
    if len(value) % 2:
        value += b'\x00'
    return struct.pack('<HH', group, elem) + struct.pack('<I', len(value)) + value


def _ds_bytes(*vals) -> bytes:
    return '\\'.join(f'{v:g}' for v in vals).encode()


def write_slice(path, arr, *, position, orientation=(1, 0, 0, 0, 1, 0),
                pixel_spacing=(0.7, 0.8), instance=1, slope=None,
                intercept=None, transfer_syntax=_EXPLICIT,
                extra_pre_pixel=None, jll_predictor=1, jll_dri=0,
                jll_split=0, codestream=None):
    """Minimal single-frame CT slice. arr: (rows, cols) int16/uint16 (or
    uint8 for the 8-bit lossy-JPEG syntax). ``codestream`` supplies the
    pre-encoded JPEG bytes for the _JPB/_JPE transfer syntaxes."""
    rows, cols = arr.shape
    ts = transfer_syntax.encode()
    meta = _el_explicit(0x0002, 0x0010, b'UI', ts)
    implicit = transfer_syntax == _IMPLICIT

    def E(g, e, vr, v):
        return _el_implicit(g, e, v) if implicit else _el_explicit(g, e, vr, v)

    body = b''
    body += E(0x0020, 0x0013, b'IS', str(instance).encode())
    body += E(0x0020, 0x0032, b'DS', _ds_bytes(*position))
    body += E(0x0020, 0x0037, b'DS', _ds_bytes(*orientation))
    body += E(0x0028, 0x0002, b'US', struct.pack('<H', 1))
    body += E(0x0028, 0x0010, b'US', struct.pack('<H', rows))
    body += E(0x0028, 0x0011, b'US', struct.pack('<H', cols))
    body += E(0x0028, 0x0030, b'DS', _ds_bytes(*pixel_spacing))
    body += E(0x0028, 0x0100, b'US',
              struct.pack('<H', arr.dtype.itemsize * 8))
    body += E(0x0028, 0x0103, b'US',
              struct.pack('<H', 1 if arr.dtype == np.int16 else 0))
    if intercept is not None:
        body += E(0x0028, 0x1052, b'DS', _ds_bytes(intercept))
    if slope is not None:
        body += E(0x0028, 0x1053, b'DS', _ds_bytes(slope))
    if extra_pre_pixel:
        body += extra_pre_pixel
    if transfer_syntax == _RLE:
        body += _encapsulate(_rle_frame(arr))
    elif transfer_syntax in (_JPB, _JPE, _JLSLL, _J2KLL, _J2K):
        body += _encapsulate(codestream, split=jll_split)
    elif transfer_syntax in (_JPLL, _JPLL_SV1):
        pred = 1 if transfer_syntax == _JPLL_SV1 else jll_predictor
        body += _encapsulate(
            _jpegll_frame(arr.view(np.uint16), predictor=pred, dri=jll_dri),
            split=jll_split)
    else:
        body += E(0x7FE0, 0x0010, b'OW', arr.astype(arr.dtype).tobytes())
    if transfer_syntax == _DEFL:
        c = __import__('zlib').compressobj(6, 8, -15)  # raw deflate (PS3.5 A.5)
        body = c.compress(body) + c.flush()
    with open(path, 'wb') as f:
        f.write(b'\x00' * 128 + b'DICM' + meta + body)


def _series(tmp_path, n=4, dz=2.5, reverse=False, **kw):
    rng = np.random.default_rng(0)
    vol = rng.integers(-900, 1500, size=(n, 10, 12)).astype(np.int16)
    order = range(n - 1, -1, -1) if reverse else range(n)
    for i, z in enumerate(order):
        write_slice(str(tmp_path / f's{i:03d}.dcm'), vol[z],
                    position=(5.0, -7.0, 10.0 + dz * z), instance=i + 1, **kw)
    return vol


class TestReader:
    def test_series_geometry_and_values(self, tmp_path):
        vol = _series(tmp_path, n=4, dz=2.5)
        img = read_dicom_series(str(tmp_path))
        np.testing.assert_array_equal(img.array, vol)
        assert img.spacing == (0.8, 0.7, 2.5)   # (x, y, z); PixelSpacing is (row, col)
        assert img.origin == (5.0, -7.0, 10.0)
        np.testing.assert_allclose(img.direction, np.eye(3))

    def test_unsorted_files_sort_by_position(self, tmp_path):
        """Files written in reverse z order must still assemble ascending
        along the slice normal."""
        vol = _series(tmp_path, n=5, dz=1.5, reverse=True)
        img = read_dicom_series(str(tmp_path))
        np.testing.assert_array_equal(img.array, vol)
        assert img.origin == (5.0, -7.0, 10.0)

    def test_deflated_series_matches_uncompressed(self, tmp_path):
        vol = _series(tmp_path, n=3, transfer_syntax=_DEFL)
        img = read_dicom_series(str(tmp_path))
        np.testing.assert_array_equal(img.array, vol)

    def test_corrupt_deflated_rejected(self, tmp_path):
        arr = np.zeros((4, 4), np.int16)
        write_slice(str(tmp_path / 'a.dcm'), arr, position=(0, 0, 0),
                    transfer_syntax=_DEFL)
        raw = open(tmp_path / 'a.dcm', 'rb').read()
        with open(tmp_path / 'a.dcm', 'wb') as f:
            f.write(raw[:-8] + b'\xff' * 8)  # clobber the deflate tail
        with pytest.raises(DicomError, match='deflated|Truncated|Corrupt'):
            read_dicom_file(str(tmp_path / 'a.dcm'))

    def test_deflate_bomb_rejected(self, tmp_path, monkeypatch):
        """A deflated dataset expanding past the cap must fail fast
        instead of materializing the bomb in memory."""
        import totalsegmentator2d_tpu.io.dicom as D
        arr = np.zeros((64, 64), np.int16)
        write_slice(str(tmp_path / 'a.dcm'), arr, position=(0, 0, 0),
                    transfer_syntax=_DEFL)
        monkeypatch.setattr(D, '_DEFLATE_CAP', 1024)
        with pytest.raises(DicomError, match='exceeds'):
            read_dicom_file(str(tmp_path / 'a.dcm'))

    def test_implicit_vr(self, tmp_path):
        vol = _series(tmp_path, n=3, transfer_syntax=_IMPLICIT)
        img = read_dicom_series(str(tmp_path))
        np.testing.assert_array_equal(img.array, vol)
        assert img.spacing == (0.8, 0.7, 2.5)

    def test_rescale_to_hounsfield(self, tmp_path):
        raw = np.arange(120, dtype=np.uint16).reshape(10, 12)
        write_slice(str(tmp_path / 'a.dcm'), raw, position=(0, 0, 0),
                    slope=1, intercept=-1024)
        sl = read_dicom_file(str(tmp_path / 'a.dcm'))
        assert sl['array'].dtype == np.int16
        np.testing.assert_array_equal(
            sl['array'], raw.astype(np.int32) - 1024)

    def test_read_image_dispatches_directory(self, tmp_path):
        vol = _series(tmp_path, n=3)
        img = read_image(str(tmp_path))
        np.testing.assert_array_equal(img.array, vol)
        assert is_dicom_dir(str(tmp_path))
        assert not is_dicom_dir(str(tmp_path / 's000.dcm'))

    def test_bits_stored_sign_extension(self, tmp_path):
        """Signed 12-bit data in a 16-bit container is two's complement
        of BitsStored bits (PS3.5 §8.1.1): 0x0FFF means -1, not +4095 —
        on the raw path and through a codec that emits raw stored values
        (JPEG Lossless)."""
        raw = np.array([[0x0FFF, 0x0800, 0x07FF, 0]], np.uint16)
        expected = [-1, -2048, 2047, 0]
        bs = _el_explicit(0x0028, 0x0101, b'US', struct.pack('<H', 12))
        for ts in (_EXPLICIT, _JPLL_SV1):
            write_slice(str(tmp_path / 'a.dcm'), raw.view(np.int16),
                        position=(0, 0, 0), transfer_syntax=ts,
                        extra_pre_pixel=bs)
            out = read_dicom_file(str(tmp_path / 'a.dcm'))
            assert out['array'].ravel().tolist() == expected, ts

    def test_monochrome1_inverted_to_monochrome2(self, tmp_path):
        """MONOCHROME1 stores lowest-value-is-white (common DX/CR): the
        reader complements within the stored range so models always see
        MONOCHROME2 polarity (PS3.3 C.7.6.3.1.2)."""
        photo = _el_explicit(0x0028, 0x0004, b'CS', b'MONOCHROME1 ')
        arr8 = np.array([[0, 100, 255]], np.uint8)
        write_slice(str(tmp_path / 'a.dcm'), arr8, position=(0, 0, 0),
                    extra_pre_pixel=photo)
        out = read_dicom_file(str(tmp_path / 'a.dcm'))
        assert out['array'].ravel().tolist() == [255, 155, 0]
        # 12-bit stored in 16-bit: complement within the 12-bit range
        bs = _el_explicit(0x0028, 0x0101, b'US', struct.pack('<H', 12))
        arr12 = np.array([[0, 4095]], np.uint16)
        write_slice(str(tmp_path / 'b.dcm'), arr12, position=(0, 0, 0),
                    extra_pre_pixel=photo + bs)
        out = read_dicom_file(str(tmp_path / 'b.dcm'))
        assert out['array'].ravel().tolist() == [4095, 0]

    def test_modality_lut_rejected(self, tmp_path):
        """A Modality LUT (the table alternative to rescale) must raise,
        not silently pass raw stored values off as output units."""
        lut = _sq(0x0028, 0x3000,
                  [_el_explicit(0x0028, 0x3002, b'US',
                                b'\x00\x01\x00\x00\x08\x00')])
        arr = np.zeros((2, 2), np.int16)
        write_slice(str(tmp_path / 'a.dcm'), arr, position=(0, 0, 0),
                    extra_pre_pixel=lut)
        with pytest.raises(DicomError, match='Modality LUT'):
            read_dicom_file(str(tmp_path / 'a.dcm'))

    def test_monochrome1_with_rescale_not_inverted(self, tmp_path):
        """MONOCHROME1 beside a calibrated rescale is contradictory:
        physical units must not be complemented."""
        photo = _el_explicit(0x0028, 0x0004, b'CS', b'MONOCHROME1 ')
        raw = np.array([[100, 200]], np.uint16)
        write_slice(str(tmp_path / 'a.dcm'), raw, position=(0, 0, 0),
                    slope=1, intercept=-1024, extra_pre_pixel=photo)
        out = read_dicom_file(str(tmp_path / 'a.dcm'))
        assert out['array'].ravel().tolist() == [100 - 1024, 200 - 1024]

    def test_palette_color_rejected(self, tmp_path):
        photo = _el_explicit(0x0028, 0x0004, b'CS', b'PALETTE COLOR ')
        arr = np.zeros((2, 2), np.uint8)
        write_slice(str(tmp_path / 'a.dcm'), arr, position=(0, 0, 0),
                    extra_pre_pixel=photo)
        with pytest.raises(DicomError, match='PALETTE'):
            read_dicom_file(str(tmp_path / 'a.dcm'))

    def test_undefined_length_un_with_implicit_content(self, tmp_path):
        """PS3.5 6.2.2: an undefined-length UN element's content is
        implicit VR even in explicit files (typical anonymizer output) —
        the skip must not desynchronize on it."""
        un = (struct.pack('<HH', 0x0009, 0x0001) + b'UN\x00\x00'
              + struct.pack('<I', 0xFFFFFFFF)
              + struct.pack('<HHI', 0xFFFE, 0xE000, 0xFFFFFFFF)
              + struct.pack('<HH', 0x0009, 0x0002)
              + struct.pack('<I', 4) + b'ABCD'
              + struct.pack('<HHI', 0xFFFE, 0xE00D, 0)
              + struct.pack('<HHI', 0xFFFE, 0xE0DD, 0))
        arr = np.arange(16, dtype=np.int16).reshape(4, 4)
        write_slice(str(tmp_path / 'a.dcm'), arr, position=(0, 0, 0),
                    extra_pre_pixel=un)
        out = read_dicom_file(str(tmp_path / 'a.dcm'))
        np.testing.assert_array_equal(out['array'], arr)

    def test_unknown_elements_are_skipped(self, tmp_path):
        """Unlisted tags (incl. a defined-length SQ) must not derail
        parsing."""
        sq = _el_explicit(0x0008, 0x1140, b'SQ', b'')
        other = _el_explicit(0x0010, 0x0010, b'PN', b'DOE^JANE')
        vol = _series(tmp_path, n=2, extra_pre_pixel=sq + other)
        img = read_dicom_series(str(tmp_path))
        np.testing.assert_array_equal(img.array, vol)


class TestRLE:
    def test_rle_series_matches_uncompressed(self, tmp_path):
        """An RLE Lossless series must decode to the same volume and
        geometry as its uncompressed twin."""
        vol = _series(tmp_path, n=4, dz=2.5, transfer_syntax=_RLE)
        img = read_dicom_series(str(tmp_path))
        np.testing.assert_array_equal(img.array, vol)
        assert img.spacing == (0.8, 0.7, 2.5)
        assert img.origin == (5.0, -7.0, 10.0)

    def test_rle_rescale_to_hounsfield(self, tmp_path):
        raw = np.arange(120, dtype=np.uint16).reshape(10, 12)
        write_slice(str(tmp_path / 'a.dcm'), raw, position=(0, 0, 0),
                    slope=1, intercept=-1024, transfer_syntax=_RLE)
        sl = read_dicom_file(str(tmp_path / 'a.dcm'))
        assert sl['array'].dtype == np.int16
        np.testing.assert_array_equal(sl['array'],
                                      raw.astype(np.int32) - 1024)

    def test_rle_highly_compressible(self, tmp_path):
        """Long constant runs (the case RLE exists for: air around the
        patient) exercise the replicate path and the even-length no-op
        padding."""
        arr = np.full((32, 32), -1000, np.int16)
        arr[10:20, 10:20] = 137
        write_slice(str(tmp_path / 'a.dcm'), arr, position=(0, 0, 0),
                    transfer_syntax=_RLE)
        sl = read_dicom_file(str(tmp_path / 'a.dcm'))
        np.testing.assert_array_equal(sl['array'], arr)

    def test_packbits_decoder_semantics(self):
        """Unit pins on the PackBits control bytes: literal, replicate,
        and the 0x80 no-op."""
        from totalsegmentator2d_tpu.io.dicom import _rle_decode_segment
        enc = bytes([2, 10, 20, 30,        # literal x3
                     0x80,                 # no-op
                     257 - 5, 7,           # replicate 7 five times
                     0, 99])               # literal x1
        assert _rle_decode_segment(enc, 9) == bytes(
            [10, 20, 30, 7, 7, 7, 7, 7, 99])
        with pytest.raises(DicomError, match='Short RLE'):
            _rle_decode_segment(enc, 50)

    def test_rle_wrong_segment_count_rejected(self, tmp_path):
        """A 16-bit image whose frame advertises one segment must raise,
        not decode garbage."""
        from totalsegmentator2d_tpu.io.dicom import _rle_decode_frame
        frame = struct.pack('<I', 1) + struct.pack('<15I', 64, *([0] * 14))
        frame += _packbits(b'\x00' * 16)
        with pytest.raises(DicomError, match='segments'):
            _rle_decode_frame(frame, 4, 4, 2)


class TestJpegLossless:
    def test_sv1_series_matches_uncompressed(self, tmp_path):
        """A .70 (process 14 SV1) series must decode to the same volume and
        geometry as its uncompressed twin."""
        vol = _series(tmp_path, n=4, dz=2.5, transfer_syntax=_JPLL_SV1)
        img = read_dicom_series(str(tmp_path))
        np.testing.assert_array_equal(img.array, vol)
        assert img.spacing == (0.8, 0.7, 2.5)
        assert img.origin == (5.0, -7.0, 10.0)

    @pytest.mark.parametrize('predictor', [1, 2, 3, 4, 5, 6, 7])
    def test_all_predictors_roundtrip(self, tmp_path, predictor):
        """.57 (any selection value): every T.81 predictor decodes
        losslessly, including the Rb/Rc-dependent recursive ones."""
        rng = np.random.default_rng(predictor)
        arr = rng.integers(-1024, 3072, size=(9, 13)).astype(np.int16)
        write_slice(str(tmp_path / 'a.dcm'), arr, position=(0, 0, 0),
                    transfer_syntax=_JPLL, jll_predictor=predictor)
        sl = read_dicom_file(str(tmp_path / 'a.dcm'))
        np.testing.assert_array_equal(sl['array'], arr)

    def test_point_transform(self):
        """Al (point transform) shifts samples down before coding; the
        decoder re-applies the shift (values quantized to multiples of
        2^pt)."""
        from totalsegmentator2d_tpu.io import jpegll
        rng = np.random.default_rng(3)
        arr = rng.integers(0, 4096, size=(8, 8)).astype(np.uint16)
        out = jpegll.decode(_jpegll_frame(arr, pt=2, precision=12))
        np.testing.assert_array_equal(out, (arr >> 2) << 2)

    def test_restart_intervals(self, tmp_path):
        """DRI/RSTn: prediction resets per interval and the samples keep
        raster order."""
        rng = np.random.default_rng(4)
        arr = rng.integers(-500, 2000, size=(10, 12)).astype(np.int16)
        write_slice(str(tmp_path / 'a.dcm'), arr, position=(0, 0, 0),
                    transfer_syntax=_JPLL_SV1, jll_dri=24)  # 2 rows/interval
        sl = read_dicom_file(str(tmp_path / 'a.dcm'))
        np.testing.assert_array_equal(sl['array'], arr)

    def test_frame_split_across_fragments(self, tmp_path):
        """PS3.5 A.4: one frame MAY span several fragments; the reader must
        concatenate them before decoding."""
        rng = np.random.default_rng(5)
        arr = rng.integers(-1024, 3072, size=(16, 16)).astype(np.int16)
        write_slice(str(tmp_path / 'a.dcm'), arr, position=(0, 0, 0),
                    transfer_syntax=_JPLL_SV1, jll_split=40)
        sl = read_dicom_file(str(tmp_path / 'a.dcm'))
        np.testing.assert_array_equal(sl['array'], arr)

    def test_rescale_to_hounsfield(self, tmp_path):
        raw = np.arange(120, dtype=np.uint16).reshape(10, 12)
        write_slice(str(tmp_path / 'a.dcm'), raw, position=(0, 0, 0),
                    slope=1, intercept=-1024, transfer_syntax=_JPLL_SV1)
        sl = read_dicom_file(str(tmp_path / 'a.dcm'))
        assert sl['array'].dtype == np.int16
        np.testing.assert_array_equal(sl['array'],
                                      raw.astype(np.int32) - 1024)

    def test_python_fallback_equals_native(self, monkeypatch):
        """The pure-Python Huffman loop and the C decoder must agree
        bit-for-bit (both run against the same stream)."""
        from totalsegmentator2d_tpu.io import jpegll, native
        rng = np.random.default_rng(6)
        arr = rng.integers(0, 65536, size=(12, 17)).astype(np.uint16)
        frame = _jpegll_frame(arr, predictor=4)
        out_native = jpegll.decode(frame) if native.native_available() \
            else None
        monkeypatch.setattr(native, '_lib', None)
        monkeypatch.setattr(native, '_checked', True)
        out_py = jpegll.decode(frame)
        np.testing.assert_array_equal(out_py, arr)
        if out_native is not None:
            np.testing.assert_array_equal(out_native, out_py)

    def test_extreme_diffs(self):
        """SSSS=16 (diff exactly +32768 mod 2^16) and full-range wraparound
        survive the mod-65536 arithmetic."""
        from totalsegmentator2d_tpu.io import jpegll
        arr = np.array([[0, 32768, 0, 65535],
                        [65535, 0, 32768, 1]], np.uint16)
        np.testing.assert_array_equal(jpegll.decode(_jpegll_frame(arr)), arr)

    def test_non_lossless_sof_rejected(self, tmp_path):
        """A baseline (SOF0) stream must raise informatively, not decode."""
        from totalsegmentator2d_tpu.io import jpegll
        frame = bytearray(_jpegll_frame(np.zeros((2, 2), np.uint16)))
        idx = bytes(frame).index(b'\xff\xc3')
        frame[idx + 1] = 0xC0
        with pytest.raises(jpegll.JpegError, match='SOF0'):
            jpegll.decode(bytes(frame))

    def test_garbage_rejected(self):
        from totalsegmentator2d_tpu.io import jpegll
        with pytest.raises(jpegll.JpegError, match='SOI'):
            jpegll.decode(b'not a jpeg stream')

    def test_8bit_precision(self):
        from totalsegmentator2d_tpu.io import jpegll
        rng = np.random.default_rng(8)
        arr = rng.integers(0, 256, size=(7, 5)).astype(np.uint16)
        np.testing.assert_array_equal(
            jpegll.decode(_jpegll_frame(arr, precision=8)), arr)

    @pytest.mark.parametrize('force_py', [False, True])
    def test_truncated_entropy_rejected(self, monkeypatch, force_py):
        """A stream cut mid-entropy-segment must raise, not zero-pad its
        way to garbage HU values (both the C and the Python decoder)."""
        from totalsegmentator2d_tpu.io import jpegll, native
        if force_py:
            monkeypatch.setattr(native, '_lib', None)
            monkeypatch.setattr(native, '_checked', True)
        rng = np.random.default_rng(9)
        arr = rng.integers(0, 65536, size=(16, 16)).astype(np.uint16)
        frame = _jpegll_frame(arr)
        body = frame[:-2]  # strip EOI
        cut = body[:len(body) - (len(body) - 40) // 2] + b'\xff\xd9'
        with pytest.raises(jpegll.JpegError,
                           match='Truncated entropy|Invalid Huffman'):
            jpegll.decode(cut)

    def test_rst_without_dri_rejected(self):
        """RSTn markers in the entropy data with the DRI segment missing
        must raise instead of decoding only the first interval."""
        from totalsegmentator2d_tpu.io import jpegll
        rng = np.random.default_rng(10)
        arr = rng.integers(0, 65536, size=(8, 6)).astype(np.uint16)
        frame = _jpegll_frame(arr, dri=12)  # two rows per restart interval
        import struct as _struct
        dri_seg = bytes([0xFF, 0xDD, 0x00, 0x04]) + _struct.pack('>H', 12)
        assert dri_seg in frame
        with pytest.raises(jpegll.JpegError, match='DRI'):
            jpegll.decode(frame.replace(dri_seg, b''))

    def test_oversubscribed_dht_rejected(self):
        """Three codes of length 1 overflow the canonical code space; the
        LUT builder must raise instead of silently writing no-op slices."""
        from totalsegmentator2d_tpu.io.jpegll import JpegError, _parse_dht
        seg = bytes([0x00]) + bytes([3] + [0] * 15) + bytes([0, 1, 2])
        with pytest.raises(JpegError, match='Over-subscribed'):
            _parse_dht(seg, {})


class TestJpegLs:
    """The from-scratch T.87 decoder (io/jpegls.py) against the system
    CharLS oracle (tests/charls_oracle.py) and through the DICOM reader."""

    @pytest.fixture(autouse=True)
    def _need_charls(self):
        import charls_oracle
        if not charls_oracle.available():
            pytest.skip('system CharLS library not available')

    def test_lossless_series_matches_uncompressed(self, tmp_path):
        import charls_oracle as co
        rng = np.random.default_rng(0)
        vol = rng.integers(0, 4096, size=(3, 10, 12)).astype(np.uint16)
        for i in range(3):
            write_slice(str(tmp_path / f's{i:03d}.dcm'), vol[i],
                        position=(5.0, -7.0, 10.0 + 2.5 * i), instance=i + 1,
                        transfer_syntax=_JLSLL,
                        codestream=co.encode(vol[i], 12))
        img = read_dicom_series(str(tmp_path))
        np.testing.assert_array_equal(img.array, vol)
        assert img.spacing == (0.8, 0.7, 2.5)

    def test_near_lossless_matches_charls(self):
        import charls_oracle as co
        from totalsegmentator2d_tpu.io import jpegls
        rng = np.random.default_rng(1)
        arr = np.clip(np.kron(rng.normal(1000, 400, (6, 6)),
                              np.ones((8, 8)))[:43, :41],
                      0, 4095).astype(np.uint16)
        data = co.encode(arr, 12, near=3)
        out = jpegls.decode(data)
        np.testing.assert_array_equal(out, co.decode(data, 43, 41, 12))
        assert np.abs(out.astype(np.int64) - arr.astype(np.int64)).max() <= 3

    @pytest.mark.parametrize('bits,near,preset', [
        (8, 0, None),
        (16, 0, None),
        (12, 2, None),
        (12, 0, (4095, 10, 20, 40, 32)),   # LSE preset parameters
        (2, 0, None),                       # minimum precision
    ])
    def test_configs_match_oracle(self, bits, near, preset):
        import charls_oracle as co
        from totalsegmentator2d_tpu.io import jpegls
        rng = np.random.default_rng(bits * 31 + near)
        hi = 1 << bits
        arr = rng.integers(0, hi, (37, 29)).astype(
            np.uint8 if bits <= 8 else np.uint16)
        data = co.encode(arr, bits, near, preset)
        np.testing.assert_array_equal(
            jpegls.decode(data), co.decode(data, 37, 29, bits))

    def test_run_mode_heavy_content(self):
        """Mostly-flat content exercises the run machinery (segment
        growth, interruption samples, end-of-line runs)."""
        import charls_oracle as co
        from totalsegmentator2d_tpu.io import jpegls
        rng = np.random.default_rng(2)
        arr = np.full((51, 47), 777, np.uint16)
        m = rng.random((51, 47)) < 0.04
        arr = np.where(m, rng.integers(0, 4096, (51, 47)), arr).astype(
            np.uint16)
        data = co.encode(arr, 12)
        out = jpegls.decode(data)
        np.testing.assert_array_equal(out, arr)

    def test_python_fallback_equals_native(self, monkeypatch):
        import charls_oracle as co
        from totalsegmentator2d_tpu.io import jpegls, native
        rng = np.random.default_rng(3)
        arr = rng.integers(0, 65536, (26, 33)).astype(np.uint16)
        data = co.encode(arr, 16)
        out_native = jpegls.decode(data) if native.native_available() \
            else None
        monkeypatch.setattr(native, '_lib', None)
        monkeypatch.setattr(native, '_checked', True)
        out_py = jpegls.decode(data)
        np.testing.assert_array_equal(out_py, arr)
        if out_native is not None:
            np.testing.assert_array_equal(out_native, out_py)

    def test_multicomponent_rejected(self):
        from totalsegmentator2d_tpu.io import jpegls
        # hand-built SOF55 with 3 components
        sof = struct.pack('>HHBHHB', 0xFFF7, 11 + 6, 8, 4, 4, 3)
        sof += bytes([1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0])
        with pytest.raises(jpegls.JpegLsError, match='grayscale'):
            jpegls.decode(b'\xff\xd8' + sof)

    def test_garbage_rejected(self):
        from totalsegmentator2d_tpu.io import jpegls
        with pytest.raises(jpegls.JpegLsError, match='SOI'):
            jpegls.decode(b'definitely not jpeg-ls')

    @pytest.mark.parametrize('force_py', [False, True])
    def test_truncated_rejected(self, monkeypatch, force_py):
        import charls_oracle as co
        from totalsegmentator2d_tpu.io import jpegls, native
        if force_py:
            monkeypatch.setattr(native, '_lib', None)
            monkeypatch.setattr(native, '_checked', True)
        rng = np.random.default_rng(4)
        arr = rng.integers(0, 4096, (24, 24)).astype(np.uint16)
        data = co.encode(arr, 12)
        cut = data[:len(data) // 2]
        with pytest.raises(jpegls.JpegLsError, match='Truncated'):
            jpegls.decode(cut)

    def test_rescale_to_hounsfield(self, tmp_path):
        import charls_oracle as co
        rng = np.random.default_rng(5)
        raw = rng.integers(0, 3000, size=(8, 9)).astype(np.uint16)
        write_slice(str(tmp_path / 'a.dcm'), raw, position=(0, 0, 0),
                    transfer_syntax=_JLSLL, codestream=co.encode(raw, 16),
                    slope=1, intercept=-1024)
        out = read_dicom_file(str(tmp_path / 'a.dcm'))
        assert out['array'].dtype == np.int16
        np.testing.assert_array_equal(
            out['array'], raw.astype(np.int32) - 1024)

    def test_enhanced_multiframe_jpegls(self, tmp_path):
        """Enhanced-CT multi-frame files with JPEG-LS fragments combine
        the functional-group geometry path with the codec path."""
        import charls_oracle as co
        rng = np.random.default_rng(6)
        vol = rng.integers(-500, 2000, size=(4, 9, 11)).astype(np.int16)
        raw = (vol.astype(np.int32) + 1024).astype(np.uint16)
        write_enhanced(str(tmp_path / 'e.dcm'), raw,
                       positions=[(0, 0, 2.0 * i) for i in range(4)],
                       slope=1, intercept=-1024, transfer_syntax=_JLSLL,
                       frame_codestreams=[co.encode(f, 16) for f in raw])
        img = read_dicom_series(str(tmp_path / 'e.dcm'))
        np.testing.assert_array_equal(img.array, vol)

    def test_malformed_marker_bodies_raise_codec_error(self):
        """Truncated/empty marker bodies must surface as JpegLsError (the
        DicomError wrapping contract), never raw IndexError/struct.error."""
        from totalsegmentator2d_tpu.io import jpegls
        sof = struct.pack('>HHBHHB', 0xFFF7, 11, 8, 4, 4, 1) \
            + bytes([1, 0x11, 0])
        for name, stream in [
                ('empty LSE', b'\xff\xd8' + struct.pack('>HH', 0xFFF8, 2)),
                ('truncated SOF55',
                 b'\xff\xd8' + struct.pack('>HH', 0xFFF7, 4) + b'\x08\x00'),
                ('truncated SOS',
                 b'\xff\xd8' + sof + struct.pack('>HH', 0xFFDA, 3) + b'\x01'),
        ]:
            with pytest.raises(jpegls.JpegLsError):
                jpegls.decode(stream)

    def test_restart_intervals_rejected(self):
        """A DRI segment with a nonzero interval raises informatively
        (restart markers are never emitted for single-scan archives)."""
        import charls_oracle as co
        from totalsegmentator2d_tpu.io import jpegls
        good = co.encode(np.zeros((4, 4), np.uint8), 8)
        i = good.find(b'\xff\xda')
        dri = struct.pack('>HHH', 0xFFDD, 4, 16)
        with pytest.raises(jpegls.JpegLsError, match='[Rr]estart'):
            jpegls.decode(good[:i] + dri + good[i:])
        # a zero interval is a no-op, not an error
        dri0 = struct.pack('>HHH', 0xFFDD, 4, 0)
        out = jpegls.decode(good[:i] + dri0 + good[i:])
        assert out.shape == (4, 4)

    def test_hostile_lse_presets_rejected(self):
        """Out-of-order thresholds / absurd RESET corrupt the adaptive
        state (and overflow int32 in a naive native decoder) — they must
        be rejected up front (T.87 C.2.4.1.1)."""
        import charls_oracle as co
        from totalsegmentator2d_tpu.io import jpegls
        good = co.encode(np.zeros((4, 4), np.uint8), 8)
        i = good.find(b'\xff\xda')
        for name, preset in [('reversed thresholds', (255, 90, 50, 10, 64)),
                             ('RESET below 3', (255, 3, 7, 21, 1)),
                             ('MAXVAL above precision', (9999, 3, 7, 21, 64))]:
            lse = struct.pack('>HHB', 0xFFF8, 13, 1) \
                + struct.pack('>HHHHH', *preset)
            with pytest.raises(jpegls.JpegLsError):
                jpegls.decode(good[:i] + lse + good[i:])


def _j2k_encode(arr, signed=False, **kw):
    """Encode a (rows, cols) uint8/uint16/int16 array as one raw JPEG 2000
    codestream via the Pillow/openjpeg oracle. Pillow cannot emit signed
    components, so int16 input is level-shifted to uint16 and the SIZ
    Ssiz byte is patched to signed-16 afterwards — an exactly equivalent
    codestream, because the encoder's DC level shift for unsigned data
    mirrors the signed representation (T.800 B.1/G.1)."""
    Image = pytest.importorskip('PIL.Image')
    if arr.dtype == np.int16 or signed:
        u = (arr.astype(np.int32) + 32768).astype(np.uint16)
        data = _j2k_encode(u, **kw)
        assert data[:4] == b'\xff\x4f\xff\x51'
        patched = bytearray(data)
        patched[42] = 0x8F  # Ssiz: signed, 16-bit
        return bytes(patched)
    kw.setdefault('irreversible', False)
    if arr.dtype == np.uint8:
        im = Image.fromarray(arr)
    else:
        im = Image.frombytes('I;16', (arr.shape[1], arr.shape[0]),
                             arr.astype('<u2').tobytes())
    import io as _io
    buf = _io.BytesIO()
    im.save(buf, 'JPEG2000', no_jp2=True, **kw)
    return buf.getvalue()


def _pillow_decode(codestream: bytes):
    Image = pytest.importorskip('PIL.Image')
    import io as _io
    im = Image.open(_io.BytesIO(codestream))
    im.load()
    return np.array(im)


class TestJpeg2000:
    """The from-scratch T.800 decoder (io/jpeg2k.py) against the
    Pillow/openjpeg oracle and through the DICOM reader."""

    def test_lossless_series_matches_uncompressed(self, tmp_path):
        rng = np.random.default_rng(0)
        vol = rng.integers(-900, 1500, size=(3, 10, 12)).astype(np.int16)
        for i in range(3):
            write_slice(str(tmp_path / f's{i:03d}.dcm'), vol[i],
                        position=(5.0, -7.0, 10.0 + 2.5 * i), instance=i + 1,
                        transfer_syntax=_J2KLL,
                        codestream=_j2k_encode(vol[i]))
        img = read_dicom_series(str(tmp_path))
        np.testing.assert_array_equal(img.array, vol)
        assert img.spacing == (0.8, 0.7, 2.5)

    def test_signed_component(self):
        """CT pixel data is signed; the patched-Ssiz fixture exercises the
        decoder's signed reconstruction (no DC level shift, int32 out)."""
        from totalsegmentator2d_tpu.io import jpeg2k
        rng = np.random.default_rng(1)
        arr = rng.integers(-1024, 3072, size=(19, 23)).astype(np.int16)
        out = jpeg2k.decode(_j2k_encode(arr))
        assert out.dtype == np.int32
        np.testing.assert_array_equal(out, arr)

    @pytest.mark.parametrize('kw', [
        dict(),                                      # 5 resolution levels
        dict(num_resolutions=1),                     # no wavelet at all
        dict(codeblock_size=(32, 16)),               # non-square blocks
        dict(tile_size=(16, 16)),                    # many tiles
        dict(precinct_size=(32, 32),
             codeblock_size=(16, 16)),               # real precinct grids
        dict(progression='RLCP'),
        dict(progression='RPCL'),
        dict(quality_mode='rates',
             quality_layers=[20, 5, 1]),             # multi-layer packets
    ])
    def test_lossless_configs_roundtrip(self, kw):
        from totalsegmentator2d_tpu.io import jpeg2k
        rng = np.random.default_rng(2)
        arr = rng.integers(0, 4096, size=(45, 37)).astype(np.uint16)
        data = _j2k_encode(arr, **kw)
        out = jpeg2k.decode(data)
        np.testing.assert_array_equal(out, _pillow_decode(data))
        if 'tile_size' not in kw:  # Pillow's >8-bit tile ENCODE is lossy
            np.testing.assert_array_equal(out, arr)

    def test_irreversible_97_matches_oracle(self):
        """Lossy 9/7: decoder-vs-decoder within 1 (float32-vs-float64
        lifting); openjpeg's midpoint reconstruction convention must be
        matched or truncated layers drift by hundreds of HU."""
        from totalsegmentator2d_tpu.io import jpeg2k
        rng = np.random.default_rng(3)
        base = rng.normal(0, 800, (8, 8))
        arr = np.clip(np.kron(base, np.ones((8, 8))) + 1024,
                      0, 4095).astype(np.uint16)
        for kw in (dict(), dict(quality_mode='rates', quality_layers=[10])):
            data = _j2k_encode(arr, irreversible=True, **kw)
            out = jpeg2k.decode(data)
            ref = _pillow_decode(data)
            assert np.abs(out.astype(np.int64)
                          - ref.astype(np.int64)).max() <= 1

    def test_jp2_container_accepted(self):
        Image = pytest.importorskip('PIL.Image')
        import io as _io
        from totalsegmentator2d_tpu.io import jpeg2k
        rng = np.random.default_rng(4)
        arr = rng.integers(0, 256, size=(9, 11)).astype(np.uint8)
        buf = _io.BytesIO()
        Image.fromarray(arr).save(buf, 'JPEG2000', irreversible=False)
        data = buf.getvalue()
        assert data[4:8] == b'jP  '  # really a JP2 box container
        np.testing.assert_array_equal(jpeg2k.decode(data), arr)

    def test_python_fallback_equals_native(self, monkeypatch):
        """The pure-Python Tier-1 loop and the C decoder must agree
        bit-for-bit (both run against the same stream)."""
        from totalsegmentator2d_tpu.io import jpeg2k, native
        rng = np.random.default_rng(5)
        arr = rng.integers(0, 65536, size=(40, 33)).astype(np.uint16)
        data = _j2k_encode(arr, quality_mode='rates', quality_layers=[8, 1])
        out_native = jpeg2k.decode(data) if native.native_available() \
            else None
        monkeypatch.setattr(native, '_lib', None)
        monkeypatch.setattr(native, '_checked', True)
        out_py = jpeg2k.decode(data)
        np.testing.assert_array_equal(out_py, arr)
        if out_native is not None:
            np.testing.assert_array_equal(out_native, out_py)

    def test_python_fallback_equals_native_97(self, monkeypatch):
        """Same bit-for-bit contract on the irreversible 9/7 path: the
        native inverse DWT runs float64 lifting in numpy's operation
        order with FP contraction off, so even the lossy reconstruction
        must match the Python loop exactly."""
        from totalsegmentator2d_tpu.io import jpeg2k, native
        rng = np.random.default_rng(17)
        arr = rng.integers(0, 4096, size=(37, 41)).astype(np.uint16)
        data = _j2k_encode(arr, irreversible=True)
        out_native = jpeg2k.decode(data) if native.native_available() \
            else None
        monkeypatch.setattr(native, '_lib', None)
        monkeypatch.setattr(native, '_checked', True)
        out_py = jpeg2k.decode(data)
        assert np.abs(out_py.astype(np.int64) - arr).max() <= 1
        if out_native is not None:
            np.testing.assert_array_equal(out_native, out_py)

    def test_threaded_blocks_equal_serial(self, monkeypatch):
        """Tier-1 threads across a slice's code blocks on multi-core
        hosts (each native call runs outside the GIL); the pooled path
        must be bit-identical to the serial one. Forced both ways, since
        this sandbox is single-core."""
        from totalsegmentator2d_tpu.io import jpeg2k
        rng = np.random.default_rng(21)
        arr = rng.integers(-1024, 3072, size=(128, 96)).astype(np.int16)
        data = _j2k_encode(arr, codeblock_size=(16, 16))
        monkeypatch.setattr(jpeg2k, '_thread_blocks', lambda n: False)
        serial = jpeg2k.decode(data)
        monkeypatch.setattr(jpeg2k, '_thread_blocks', lambda n: True)
        pooled = jpeg2k.decode(data)
        np.testing.assert_array_equal(serial, arr)
        np.testing.assert_array_equal(pooled, serial)

    def test_threaded_series_equals_serial(self, tmp_path, monkeypatch):
        """The series reader threads across slice files when cores and
        file count allow (io/dicom.py); force the pooled path on this
        single-core sandbox and pin equality with the serial read."""
        import os
        from totalsegmentator2d_tpu.io import dicom as D
        rng = np.random.default_rng(22)
        vol = rng.integers(-900, 1500, size=(5, 12, 10)).astype(np.int16)
        for i in range(5):
            write_slice(str(tmp_path / f's{i:03d}.dcm'), vol[i],
                        position=(0.0, 0.0, 2.5 * i), instance=i + 1,
                        transfer_syntax=_J2KLL,
                        codestream=_j2k_encode(vol[i]))
        serial = D.read_dicom_series(str(tmp_path))
        monkeypatch.setattr(os, 'cpu_count', lambda: 8)
        pooled = D.read_dicom_series(str(tmp_path))
        np.testing.assert_array_equal(serial.array, vol)
        np.testing.assert_array_equal(pooled.array, serial.array)
        assert pooled.spacing == serial.spacing

    def test_frame_split_across_fragments(self, tmp_path):
        rng = np.random.default_rng(6)
        arr = rng.integers(-200, 200, size=(16, 16)).astype(np.int16)
        write_slice(str(tmp_path / 'a.dcm'), arr, position=(0, 0, 0),
                    transfer_syntax=_J2KLL, codestream=_j2k_encode(arr),
                    jll_split=34)
        out = read_dicom_file(str(tmp_path / 'a.dcm'))
        np.testing.assert_array_equal(out['array'], arr)

    def test_rescale_to_hounsfield(self, tmp_path):
        rng = np.random.default_rng(7)
        raw = rng.integers(0, 3000, size=(8, 9)).astype(np.uint16)
        write_slice(str(tmp_path / 'a.dcm'), raw, position=(0, 0, 0),
                    transfer_syntax=_J2KLL, codestream=_j2k_encode(raw),
                    slope=1, intercept=-1024)
        out = read_dicom_file(str(tmp_path / 'a.dcm'))
        assert out['array'].dtype == np.int16
        np.testing.assert_array_equal(
            out['array'], raw.astype(np.int32) - 1024)

    def test_multicomponent_rejected(self):
        Image = pytest.importorskip('PIL.Image')
        import io as _io
        from totalsegmentator2d_tpu.io import jpeg2k
        rng = np.random.default_rng(8)
        rgb = rng.integers(0, 256, size=(8, 8, 3)).astype(np.uint8)
        buf = _io.BytesIO()
        Image.fromarray(rgb).save(buf, 'JPEG2000', no_jp2=True,
                                  irreversible=False)
        with pytest.raises(jpeg2k.Jpeg2kError, match='grayscale'):
            jpeg2k.decode(buf.getvalue())

    def test_garbage_rejected(self):
        from totalsegmentator2d_tpu.io import jpeg2k
        with pytest.raises(jpeg2k.Jpeg2kError, match='SOC'):
            jpeg2k.decode(b'definitely not a codestream')

    def test_malformed_marker_bodies_raise_codec_error(self):
        """Truncated/empty marker bodies must surface as Jpeg2kError (the
        DicomError wrapping contract), never raw IndexError/ValueError."""
        import struct as _s
        from totalsegmentator2d_tpu.io import jpeg2k
        soc = b'\xff\x4f'
        siz = _s.pack('>HH', 0xFF51, 41) + _s.pack(
            '>HIIIIIIIIH', 0, 8, 8, 0, 0, 8, 8, 0, 0, 1) + bytes([7, 1, 1])
        with pytest.raises(jpeg2k.Jpeg2kError):  # empty COD body
            jpeg2k.decode(soc + siz + _s.pack('>HH', 0xFF52, 2))
        # precinct exponent 0 at r>0 (would be a negative shift)
        cod = _s.pack('>HH', 0xFF52, 13) + bytes([1, 0]) \
            + _s.pack('>H', 1) + bytes([0, 1, 2, 2, 0, 1]) \
            + bytes([0x00, 0x11])
        qcd = _s.pack('>HH', 0xFF5C, 3) + bytes([0x40, 0x40])
        tail = _s.pack('>HHHIBB', 0xFF90, 10, 0, 0, 0, 1) \
            + b'\xff\x93\xff\xd9'
        with pytest.raises(jpeg2k.Jpeg2kError):
            jpeg2k.decode(soc + siz + cod + qcd + tail)

    def test_hostile_qcd_bitplanes_rejected(self):
        """guard=7 + exponent=31 signals 37 magnitude bit planes, which
        would overflow the int32 Tier-1 state (Python OverflowError, C
        undefined shifts) — reject up front."""
        import struct as _s
        from totalsegmentator2d_tpu.io import jpeg2k
        soc = b'\xff\x4f'
        siz = _s.pack('>HH', 0xFF51, 41) + _s.pack(
            '>HIIIIIIIIH', 0, 8, 8, 0, 0, 8, 8, 0, 0, 1) + bytes([15, 1, 1])
        cod = _s.pack('>HH', 0xFF52, 12) + bytes([0, 0]) \
            + _s.pack('>H', 1) + bytes([0, 0, 2, 2, 0, 1])
        qcd = _s.pack('>HH', 0xFF5C, 4) + bytes([0xE0, 0xF8])
        body = soc + siz + cod + qcd + _s.pack(
            '>HHHIBB', 0xFF90, 10, 0, 0, 0, 1) + b'\xff\x93' \
            + b'\x01\x00\x00' + b'\xff\xd9'
        with pytest.raises(jpeg2k.Jpeg2kError, match='bit planes'):
            jpeg2k.decode(body)

    def test_corrupt_jp2_boxes_rejected(self):
        """An XLBox with 64-bit length 0 must raise, not spin forever
        scanning for the codestream box."""
        import struct as _s
        from totalsegmentator2d_tpu.io import jpeg2k
        jp2 = (b'\x00\x00\x00\x0cjP  \r\n\x87\n'
               + _s.pack('>I', 1) + b'xxxx' + _s.pack('>Q', 0))
        with pytest.raises(jpeg2k.Jpeg2kError, match='XLBox'):
            jpeg2k.decode(jp2)

    def test_tile_origin_past_image_rejected(self):
        """XTOsiz > XOsiz would yield a zero-tile grid and a silent
        all-zero image (T.800 B.3 forbids it)."""
        import struct as _s
        from totalsegmentator2d_tpu.io import jpeg2k
        soc = b'\xff\x4f'
        siz = _s.pack('>HH', 0xFF51, 41) + _s.pack(
            '>HIIIIIIIIH', 0, 4, 4, 0, 0, 4, 4, 8, 0, 1) + bytes([7, 1, 1])
        with pytest.raises(jpeg2k.Jpeg2kError, match='[Tt]ile origin'):
            jpeg2k.decode(soc + siz + b'\xff\xd9')

    def test_implausible_dimensions_rejected(self):
        """Corrupt 32-bit SIZ dimensions must be rejected up front, not
        attempt multi-hundred-GiB allocations or billions of empty-tile
        iterations (found by mutation fuzzing)."""
        import struct as _s
        from totalsegmentator2d_tpu.io import jpeg2k
        soc = b'\xff\x4f'
        siz = _s.pack('>HH', 0xFF51, 41) + _s.pack(
            '>HIIIIIIIIH', 0, 0xFC000034, 48, 0, 0, 0xFC000034, 48, 0, 0,
            1) + bytes([11, 1, 1])
        with pytest.raises(jpeg2k.Jpeg2kError, match='Implausible'):
            jpeg2k.decode(soc + siz)
        # a sane image with a corrupt 1-pixel tile grid -> 2^40 tiles
        siz = _s.pack('>HH', 0xFF51, 41) + _s.pack(
            '>HIIIIIIIIH', 0, 1 << 19, 1 << 9, 0, 0, 1, 1, 0, 0,
            1) + bytes([11, 1, 1])
        cod = _s.pack('>HH', 0xFF52, 12) + bytes([0, 0]) \
            + _s.pack('>H', 1) + bytes([0, 0, 2, 2, 0, 1])
        qcd = _s.pack('>HH', 0xFF5C, 4) + bytes([0x40, 0x40])
        with pytest.raises(jpeg2k.Jpeg2kError, match='Implausible'):
            jpeg2k.decode(soc + siz + cod + qcd + b'\xff\xd9')

    @pytest.mark.parametrize('force_py', [False, True])
    def test_corrupt_entropy_rejected_or_contained(self, monkeypatch,
                                                   force_py):
        """Corrupting entropy bytes must never crash or hang — either an
        informative Jpeg2kError or a decoded (wrong-valued) array of the
        right shape is acceptable."""
        from totalsegmentator2d_tpu.io import jpeg2k, native
        if force_py:
            monkeypatch.setattr(native, '_lib', None)
            monkeypatch.setattr(native, '_checked', True)
        rng = np.random.default_rng(9)
        arr = rng.integers(0, 4096, size=(24, 24)).astype(np.uint16)
        data = bytearray(_j2k_encode(arr))
        data[len(data) // 2] ^= 0xFF
        try:
            out = jpeg2k.decode(bytes(data))
            assert out.shape == arr.shape
        except jpeg2k.Jpeg2kError:
            pass


class TestErrors:
    def test_compressed_transfer_syntax_rejected(self, tmp_path):
        arr = np.zeros((4, 4), np.int16)
        write_slice(str(tmp_path / 'a.dcm'), arr, position=(0, 0, 0),
                    # JPEG 2000 Part 2 multi-component
                    transfer_syntax='1.2.840.10008.1.2.4.92')
        with pytest.raises(DicomError, match='transfer syntax'):
            read_dicom_file(str(tmp_path / 'a.dcm'))

    def test_mixed_orientation_rejected(self, tmp_path):
        arr = np.zeros((4, 4), np.int16)
        write_slice(str(tmp_path / 'a.dcm'), arr, position=(0, 0, 0))
        write_slice(str(tmp_path / 'b.dcm'), arr, position=(0, 0, 2),
                    orientation=(0, 1, 0, 1, 0, 0))
        with pytest.raises(DicomError, match='Orientation'):
            read_dicom_series(str(tmp_path))

    def test_nonuniform_spacing_rejected(self, tmp_path):
        arr = np.zeros((4, 4), np.int16)
        for i, z in enumerate((0.0, 1.0, 3.5)):
            write_slice(str(tmp_path / f'{i}.dcm'), arr, position=(0, 0, z))
        with pytest.raises(DicomError, match='Non-uniform'):
            read_dicom_series(str(tmp_path))

    def test_empty_dir(self, tmp_path):
        with pytest.raises(DicomError, match='No DICOM'):
            read_dicom_series(str(tmp_path))


class TestTruncatedMarkerContainment:
    """A stream cut INSIDE a marker segment header (e.g. an SOF with an
    empty body) must raise the codec error type, not leak IndexError —
    found by a truncation sweep over every cut position."""

    def test_jll_truncated_sof(self):
        from totalsegmentator2d_tpu.io import jpegll
        rng = np.random.default_rng(0)
        arr = rng.integers(0, 4096, (8, 9)).astype(np.uint16)
        base = bytes(_jpegll_frame(arr))
        for cut in range(2, len(base)):
            try:
                jpegll.decode(base[:cut])
            except jpegll.JpegError:
                pass  # the only acceptable failure type

    def test_jdct_truncated_sof(self):
        from totalsegmentator2d_tpu.io import jpegdct, jpegll
        rng = np.random.default_rng(1)
        arr = rng.integers(0, 256, (8, 9)).astype(np.uint8)
        base = bytes(_jpegdct_frame(arr, precision=8))
        for cut in range(2, len(base)):
            try:
                jpegdct.decode(base[:cut])
            except jpegll.JpegError:
                pass


class TestDicomLayerContainment:
    """The element/tag parser itself (not just the pixel codecs) must
    surface malformed files as DicomError — corrupt DS numeric strings
    and truncated headers leaked ValueError/struct.error before."""

    @pytest.mark.parametrize('ts', [_EXPLICIT, _IMPLICIT, _RLE])
    def test_mutations_contained(self, tmp_path, ts):
        rng = np.random.default_rng(len(ts))
        arr = rng.integers(-500, 1500, (10, 12)).astype(np.int16)
        p = tmp_path / 'a.dcm'
        write_slice(str(p), arr, position=(0, 0, 0), transfer_syntax=ts)
        base = bytearray(p.read_bytes())
        pm = tmp_path / 'm.dcm'
        for trial in range(120):
            data = bytearray(base)
            for _ in range(int(rng.integers(1, 6))):
                data[int(rng.integers(0, len(data)))] = \
                    int(rng.integers(0, 256))
            pm.write_bytes(bytes(data))
            try:
                read_dicom_file(str(pm))
            except DicomError:
                pass
        for _ in range(40):
            cut = int(rng.integers(1, len(base)))
            pm.write_bytes(bytes(base[:cut]))
            try:
                read_dicom_file(str(pm))
            except DicomError:
                pass


class TestMutationRobustness:
    """Seeded slice of the development-time mutation fuzz (4800 random
    corruptions, no crashes/hangs): every corruption either decodes to
    the right shape or raises the codec error type — never a foreign
    exception, an allocation blow-up, or a runaway loop."""

    @pytest.mark.parametrize('codec', ['j2k', 'jls', 'jll', 'jdct'])
    def test_mutations_contained(self, codec):
        from totalsegmentator2d_tpu.io import jpeg2k, jpegls
        rng = np.random.default_rng(123)
        arr = rng.integers(0, 4096, (32, 36)).astype(np.uint16)
        if codec == 'jll':
            from totalsegmentator2d_tpu.io import jpegll
            base = bytearray(_jpegll_frame(arr))
            dec, err = jpegll.decode, jpegll.JpegError
        elif codec == 'jdct':
            from totalsegmentator2d_tpu.io import jpegdct, jpegll
            arr = arr.astype(np.uint8)
            base = bytearray(_jpegdct_frame(arr, precision=8))
            dec, err = jpegdct.decode, jpegll.JpegError
        elif codec == 'j2k':
            Image = pytest.importorskip('PIL.Image')
            import io as _io
            im = Image.frombytes('I;16', (36, 32), arr.astype('<u2').tobytes())
            b = _io.BytesIO()
            im.save(b, 'JPEG2000', irreversible=False, no_jp2=True)
            base = bytearray(b.getvalue())
            dec, err = jpeg2k.decode, jpeg2k.Jpeg2kError
        else:
            import charls_oracle
            if not charls_oracle.available():
                pytest.skip('system CharLS library not available')
            base = bytearray(charls_oracle.encode(arr, 12))
            dec, err = jpegls.decode, jpegls.JpegLsError
        # a mutated dimension header may legitimately decode to a
        # different (plausibility-capped) shape — the DICOM layer
        # rejects the mismatch; here only containment matters
        for trial in range(120):
            data = bytearray(base)
            for _ in range(int(rng.integers(1, 6))):
                data[int(rng.integers(0, len(data)))] = \
                    int(rng.integers(0, 256))
            try:
                out = dec(bytes(data))
                assert out.ndim == 2 and out.size <= 1 << 28
            except err:
                pass
        for trial in range(40):
            cut = int(rng.integers(2, len(base)))
            try:
                out = dec(bytes(base[:cut]))
                assert out.ndim == 2 and out.size <= 1 << 28
            except err:
                pass


class TestZippedSeries:
    def test_read_image_zip_roundtrip(self, tmp_path):
        """read_image('.zip') extracts (guarded) and reads the wrapped
        series — the CLI's one-case-per-archive input shape."""
        import zipfile
        rng = np.random.default_rng(11)
        vol = rng.integers(-500, 1500, (4, 8, 10)).astype(np.int16)
        series = tmp_path / 'wrap' / 'series'
        series.mkdir(parents=True)
        for i in range(4):
            write_slice(str(series / f's{i}.dcm'), vol[i],
                        position=(0.0, 0.0, 2.0 * i), instance=i + 1)
        zp = tmp_path / 'case.zip'
        with zipfile.ZipFile(zp, 'w') as zf:
            zf.writestr('__MACOSX/._junk', b'x')
            for f in sorted(series.iterdir()):
                zf.write(f, f'wrap/series/{f.name}')
        img = read_image(str(zp))
        np.testing.assert_array_equal(img.array, vol)

    def test_symlink_cycle_rejected(self, tmp_path):
        """A directory-symlink cycle inside an archive must raise, not
        descend forever."""
        from totalsegmentator2d_tpu.io.dicom import resolve_series_root
        os.symlink(str(tmp_path), str(tmp_path / 'loop'))
        with pytest.raises(DicomError, match='No DICOM series'):
            resolve_series_root(str(tmp_path))

    def test_zip_without_series_rejected(self, tmp_path):
        import zipfile
        zp = tmp_path / 'no.zip'
        with zipfile.ZipFile(zp, 'w') as zf:
            zf.writestr('readme.txt', 'nothing here')
        with pytest.raises(DicomError, match='No DICOM series'):
            read_image(str(zp))


class TestEndToEnd:
    def test_cli_enumerates_dicom_dir_as_one_case(self, tmp_path):
        from totalsegmentator2d_tpu.cli import _enumerate_cases
        series = tmp_path / 'patient1'
        series.mkdir()
        _series(series, n=3)
        cases = list(_enumerate_cases(str(series)))
        assert cases == [('patient1', str(series))]
        # a directory containing image files AND a series subdir yields both
        import shutil
        from tests.conftest import asset_path
        shutil.copy(asset_path('sample_s0332.nrrd'), tmp_path / 'x.nrrd')
        cases = dict(_enumerate_cases(str(tmp_path)))
        assert 'patient1' in cases and 'x' in cases


class TestReviewRegressions:
    def test_mixed_dir_is_not_a_series(self, tmp_path):
        """A scans directory with a stray .dcm must still enumerate its
        NRRD files (no silent data loss)."""
        import shutil
        from tests.conftest import asset_path
        from totalsegmentator2d_tpu.cli import _enumerate_cases
        shutil.copy(asset_path('sample_s0332.nrrd'), tmp_path / 'scan1.nrrd')
        write_slice(str(tmp_path / 'stray.dcm'),
                    np.zeros((4, 4), np.int16), position=(0, 0, 0))
        assert not is_dicom_dir(str(tmp_path))
        cases = dict(_enumerate_cases(str(tmp_path)))
        assert 'scan1' in cases
        # the loose .dcm is SKIPPED (with a warning): a stray slice of a
        # series segmented standalone would be silently meaningless
        assert 'stray' not in cases

    def test_single_dcm_file_via_cli(self, tmp_path):
        from totalsegmentator2d_tpu.cli import _enumerate_cases
        write_slice(str(tmp_path / 'slice.dcm'),
                    np.zeros((4, 4), np.int16), position=(0, 0, 0))
        cases = list(_enumerate_cases(str(tmp_path / 'slice.dcm')))
        assert cases == [('slice', str(tmp_path / 'slice.dcm'))]
        img = read_image(str(tmp_path / 'slice.dcm'))
        assert img.array.shape == (1, 4, 4)

    def test_undefined_length_sequence_with_item_elements(self, tmp_path):
        """The standard undefined-length SQ layout (undefined-length item
        containing data elements, closed by item+sequence delimiters) must
        be skipped, not rejected."""
        inner = _el_explicit(0x0008, 0x1150, b'UI', b'1.2.3.4')
        inner += _el_explicit(0x0008, 0x1155, b'UI', b'1.2.3.5')
        item = struct.pack('<HHI', 0xFFFE, 0xE000, 0xFFFFFFFF) + inner \
            + struct.pack('<HHI', 0xFFFE, 0xE00D, 0)
        sq = struct.pack('<HH', 0x0008, 0x1140) + b'SQ\x00\x00' \
            + struct.pack('<I', 0xFFFFFFFF) + item \
            + struct.pack('<HHI', 0xFFFE, 0xE0DD, 0)
        vol = _series(tmp_path, n=2, extra_pre_pixel=sq)
        img = read_dicom_series(str(tmp_path))
        np.testing.assert_array_equal(img.array, vol)

    def test_partial_positions_rejected(self, tmp_path):
        """Some-but-not-all slices carrying ImagePositionPatient must raise,
        not silently guess dz=1."""
        arr = np.zeros((4, 4), np.int16)
        write_slice(str(tmp_path / 'a.dcm'), arr, position=(0, 0, 0))
        write_slice(str(tmp_path / 'b.dcm'), arr, position=())
        with pytest.raises(DicomError, match='ImagePositionPatient'):
            read_dicom_series(str(tmp_path))

    def test_orientation_reference_not_first_slice(self, tmp_path):
        """A missing IOP on the first file must not default the geometry to
        identity when later slices carry a real orientation."""
        arr = np.arange(16, dtype=np.int16).reshape(4, 4)
        tilted = (0, 1, 0, 1, 0, 0)
        write_slice(str(tmp_path / 'a.dcm'), arr, position=(0, 0, 0),
                    orientation=())
        write_slice(str(tmp_path / 'b.dcm'), arr, position=(0, 0, -2),
                    orientation=tilted)
        img = read_dicom_series(str(tmp_path))
        np.testing.assert_allclose(img.direction[:, 0], (0, 1, 0))
        np.testing.assert_allclose(img.direction[:, 1], (1, 0, 0))

    def test_mixed_series_uids_rejected(self, tmp_path):
        arr = np.zeros((4, 4), np.int16)
        uid_el = lambda uid: _el_explicit(0x0020, 0x000E, b'UI', uid)
        write_slice(str(tmp_path / 'a.dcm'), arr, position=(0, 0, 0),
                    extra_pre_pixel=uid_el(b'1.2.3'))
        write_slice(str(tmp_path / 'b.dcm'), arr, position=(0, 0, 2),
                    extra_pre_pixel=uid_el(b'9.8.7'))
        with pytest.raises(DicomError, match='series in one directory'):
            read_dicom_series(str(tmp_path))


# --- multi-frame fixtures ---------------------------------------------------

def _sq(group, elem, item_bodies, *, implicit=False, defined_seq=False,
        undef_items=False) -> bytes:
    """Encode an SQ element from raw item bodies, covering every length
    encoding the standard allows (defined/undefined sequence x
    defined/undefined items)."""
    out = b''
    for body in item_bodies:
        if undef_items:
            out += struct.pack('<HHI', 0xFFFE, 0xE000, 0xFFFFFFFF) + body \
                + struct.pack('<HHI', 0xFFFE, 0xE00D, 0)
        else:
            out += struct.pack('<HHI', 0xFFFE, 0xE000, len(body)) + body
    if not defined_seq:
        out += struct.pack('<HHI', 0xFFFE, 0xE0DD, 0)
    length = len(out) if defined_seq else 0xFFFFFFFF
    if implicit:
        return struct.pack('<HHI', group, elem, length) + out
    return struct.pack('<HH', group, elem) + b'SQ\x00\x00' \
        + struct.pack('<I', length) + out


def _encapsulate_frames(frames, *, bot=False, split=0) -> bytes:
    """Encapsulated multi-frame PixelData: optional Basic Offset Table,
    one fragment per frame (or two when ``split`` cuts each frame)."""
    items = []
    for fr in frames:
        if len(fr) % 2:
            fr += b'\x00'
        parts = [fr] if not split else [fr[:split], fr[split:]]
        items.append([p + (b'\x00' if len(p) % 2 else b'') for p in parts])
    bot_bytes = b''
    if bot:
        offs, p = [], 0
        for parts in items:
            offs.append(p)
            for part in parts:
                p += 8 + len(part)
        bot_bytes = struct.pack(f'<{len(offs)}I', *offs)
    out = (struct.pack('<HH', 0x7FE0, 0x0010) + b'OB\x00\x00'
           + struct.pack('<I', 0xFFFFFFFF)
           + struct.pack('<HHI', 0xFFFE, 0xE000, len(bot_bytes)) + bot_bytes)
    for parts in items:
        for part in parts:
            out += struct.pack('<HHI', 0xFFFE, 0xE000, len(part)) + part
    return out + struct.pack('<HHI', 0xFFFE, 0xE0DD, 0)


def write_enhanced(path, vol, *, positions, orientation=(1, 0, 0, 0, 1, 0),
                   pixel_spacing=(0.7, 0.8), slope=None, intercept=None,
                   transfer_syntax=_EXPLICIT, defined_seq=False,
                   undef_items=False, jll_split=0, frame_codestreams=None,
                   per_frame_orientations=None, per_frame_rescales=None,
                   per_frame_spacings=None):
    """Enhanced-CT-style multi-frame file: geometry lives in the Shared /
    Per-Frame Functional Groups sequences, not at the top level."""
    F, rows, cols = vol.shape
    implicit = transfer_syntax == _IMPLICIT
    ts = transfer_syntax.encode()
    meta = _el_explicit(0x0002, 0x0010, b'UI', ts)

    def E(g, e, vr, v):
        return _el_implicit(g, e, v) if implicit else _el_explicit(g, e, vr, v)

    def SQ(g, e, bodies):
        return _sq(g, e, bodies, implicit=implicit, defined_seq=defined_seq,
                   undef_items=undef_items)

    shared = SQ(0x0020, 0x9116, [E(0x0020, 0x0037, b'DS',
                                   _ds_bytes(*orientation))])
    if pixel_spacing is not None:
        shared += SQ(0x0028, 0x9110, [E(0x0028, 0x0030, b'DS',
                                        _ds_bytes(*pixel_spacing))])
    if slope is not None or intercept is not None:
        shared += SQ(0x0028, 0x9145,
                     [E(0x0028, 0x1053, b'DS', _ds_bytes(slope or 1))
                      + E(0x0028, 0x1052, b'DS', _ds_bytes(intercept or 0))])
    pf_items = []
    for i, p in enumerate(positions):
        item = SQ(0x0020, 0x9113, [E(0x0020, 0x0032, b'DS', _ds_bytes(*p))])
        if per_frame_orientations is not None:
            item += SQ(0x0020, 0x9116,
                       [E(0x0020, 0x0037, b'DS',
                          _ds_bytes(*per_frame_orientations[i]))])
        if per_frame_rescales is not None:
            s, c = per_frame_rescales[i]
            item += SQ(0x0028, 0x9145,
                       [E(0x0028, 0x1053, b'DS', _ds_bytes(s))
                        + E(0x0028, 0x1052, b'DS', _ds_bytes(c))])
        if per_frame_spacings is not None:
            item += SQ(0x0028, 0x9110,
                       [E(0x0028, 0x0030, b'DS',
                          _ds_bytes(*per_frame_spacings[i]))])
        pf_items.append(item)

    body = b''
    body += E(0x0020, 0x0013, b'IS', b'1')
    body += E(0x0028, 0x0002, b'US', struct.pack('<H', 1))
    body += E(0x0028, 0x0008, b'IS', str(F).encode())
    body += E(0x0028, 0x0010, b'US', struct.pack('<H', rows))
    body += E(0x0028, 0x0011, b'US', struct.pack('<H', cols))
    body += E(0x0028, 0x0100, b'US', struct.pack('<H', 16))
    body += E(0x0028, 0x0103, b'US',
              struct.pack('<H', 1 if vol.dtype == np.int16 else 0))
    body += SQ(0x5200, 0x9229, [shared])
    body += SQ(0x5200, 0x9230, pf_items)
    if frame_codestreams is not None:
        body += _encapsulate_frames(list(frame_codestreams))
    elif transfer_syntax == _RLE:
        body += _encapsulate_frames([_rle_frame(f) for f in vol])
    elif transfer_syntax in (_JPLL, _JPLL_SV1):
        frames = [_jpegll_frame(f.view(np.uint16)) for f in vol]
        body += _encapsulate_frames(frames, bot=bool(jll_split),
                                    split=jll_split)
    else:
        body += E(0x7FE0, 0x0010, b'OW', vol.tobytes())
    with open(path, 'wb') as f:
        f.write(b'\x00' * 128 + b'DICM' + meta + body)


def write_legacy_multiframe(path, vol, *, position0, dz,
                            orientation=(1, 0, 0, 0, 1, 0),
                            pixel_spacing=(0.7, 0.8), use_thickness=False,
                            transfer_syntax=_IMPLICIT):
    """Legacy multi-frame file: one top-level ImagePositionPatient, frame
    spacing from SpacingBetweenSlices (or SliceThickness)."""
    F, rows, cols = vol.shape
    implicit = transfer_syntax == _IMPLICIT
    ts = transfer_syntax.encode()
    meta = _el_explicit(0x0002, 0x0010, b'UI', ts)

    def E(g, e, vr, v):
        return _el_implicit(g, e, v) if implicit else _el_explicit(g, e, vr, v)

    body = b''
    body += E(0x0020, 0x0013, b'IS', b'1')
    body += E(0x0020, 0x0032, b'DS', _ds_bytes(*position0))
    body += E(0x0020, 0x0037, b'DS', _ds_bytes(*orientation))
    body += E(0x0018, 0x0050 if use_thickness else 0x0088, b'DS',
              _ds_bytes(dz))
    body += E(0x0028, 0x0002, b'US', struct.pack('<H', 1))
    body += E(0x0028, 0x0008, b'IS', str(F).encode())
    body += E(0x0028, 0x0010, b'US', struct.pack('<H', rows))
    body += E(0x0028, 0x0011, b'US', struct.pack('<H', cols))
    body += E(0x0028, 0x0030, b'DS', _ds_bytes(*pixel_spacing))
    body += E(0x0028, 0x0100, b'US', struct.pack('<H', 16))
    body += E(0x0028, 0x0103, b'US',
              struct.pack('<H', 1 if vol.dtype == np.int16 else 0))
    body += E(0x7FE0, 0x0010, b'OW', vol.tobytes())
    with open(path, 'wb') as f:
        f.write(b'\x00' * 128 + b'DICM' + meta + body)


class TestMultiFrame:
    """Enhanced-CT and legacy multi-frame files (one file = whole stack)."""

    def _vol(self, n=5):
        rng = np.random.default_rng(3)
        return rng.integers(-900, 1500, size=(n, 10, 12)).astype(np.int16)

    def test_enhanced_matches_slice_series(self, tmp_path):
        """One Enhanced-CT file must read identically to the equivalent
        single-frame slice series."""
        vol = self._vol()
        pos = [(5.0, -7.0, 10.0 + 2.5 * i) for i in range(len(vol))]
        write_enhanced(str(tmp_path / 'mf.dcm'), vol, positions=pos)
        img = read_dicom_series(str(tmp_path / 'mf.dcm'))
        np.testing.assert_array_equal(img.array, vol)
        assert img.spacing == pytest.approx((0.8, 0.7, 2.5))
        assert tuple(img.origin) == pytest.approx((5.0, -7.0, 10.0))

    @pytest.mark.parametrize('defined_seq,undef_items',
                             [(True, False), (False, True), (True, True)])
    def test_sequence_length_encodings(self, tmp_path, defined_seq,
                                       undef_items):
        """Defined/undefined sequence and item lengths all parse (PS3.5
        7.5 allows any combination)."""
        vol = self._vol(3)
        pos = [(0.0, 0.0, 4.0 * i) for i in range(3)]
        write_enhanced(str(tmp_path / 'mf.dcm'), vol, positions=pos,
                       defined_seq=defined_seq, undef_items=undef_items)
        img = read_dicom_series(str(tmp_path / 'mf.dcm'))
        np.testing.assert_array_equal(img.array, vol)
        assert img.spacing[2] == pytest.approx(4.0)

    def test_enhanced_implicit_vr(self, tmp_path):
        vol = self._vol(3)
        pos = [(0.0, 0.0, 2.0 * i) for i in range(3)]
        write_enhanced(str(tmp_path / 'mf.dcm'), vol, positions=pos,
                       transfer_syntax=_IMPLICIT)
        img = read_dicom_series(str(tmp_path / 'mf.dcm'))
        np.testing.assert_array_equal(img.array, vol)

    def test_enhanced_functional_group_rescale(self, tmp_path):
        """Rescale from the shared Pixel Value Transformation sequence
        produces Hounsfield int16 exactly like top-level rescale."""
        raw = self._vol().view(np.uint16)  # stored unsigned
        raw = (raw.view(np.int16).astype(np.int64) + 1024).astype(np.uint16)
        write_enhanced(str(tmp_path / 'mf.dcm'),
                       raw.view(np.uint16).astype(np.uint16),
                       positions=[(0, 0, 2.0 * i) for i in range(len(raw))],
                       slope=1, intercept=-1024)
        img = read_dicom_series(str(tmp_path / 'mf.dcm'))
        assert img.array.dtype == np.int16
        np.testing.assert_array_equal(
            img.array, raw.astype(np.int64) - 1024)

    def test_enhanced_rle(self, tmp_path):
        """RLE multi-frame: one fragment per frame (PS3.5 G.2)."""
        vol = self._vol(4)
        pos = [(0, 0, 1.0 * i) for i in range(4)]
        write_enhanced(str(tmp_path / 'mf.dcm'), vol, positions=pos,
                       transfer_syntax=_RLE)
        img = read_dicom_series(str(tmp_path / 'mf.dcm'))
        np.testing.assert_array_equal(img.array, vol)

    def test_enhanced_jpegll_split_fragments_with_bot(self, tmp_path):
        """JPEG Lossless frames split across two fragments each are
        regrouped via the Basic Offset Table."""
        vol = self._vol(3)
        pos = [(0, 0, 1.0 * i) for i in range(3)]
        write_enhanced(str(tmp_path / 'mf.dcm'), vol, positions=pos,
                       transfer_syntax=_JPLL_SV1, jll_split=40)
        img = read_dicom_series(str(tmp_path / 'mf.dcm'))
        np.testing.assert_array_equal(img.array, vol)

    def test_legacy_spacing_between_slices(self, tmp_path):
        vol = self._vol(4)
        write_legacy_multiframe(str(tmp_path / 'mf.dcm'), vol,
                                position0=(1.0, 2.0, -3.0), dz=3.5)
        img = read_dicom_series(str(tmp_path / 'mf.dcm'))
        np.testing.assert_array_equal(img.array, vol)
        assert img.spacing == pytest.approx((0.8, 0.7, 3.5))
        assert tuple(img.origin) == pytest.approx((1.0, 2.0, -3.0))

    def test_legacy_slice_thickness_fallback(self, tmp_path):
        vol = self._vol(3)
        write_legacy_multiframe(str(tmp_path / 'mf.dcm'), vol,
                                position0=(0, 0, 0), dz=1.25,
                                use_thickness=True,
                                transfer_syntax=_EXPLICIT)
        img = read_dicom_series(str(tmp_path / 'mf.dcm'))
        assert img.spacing[2] == pytest.approx(1.25)

    def test_multiframe_file_flattens_with_single_frame_slices(
            self, tmp_path):
        """A multi-frame file plus single-frame slices of the SAME series
        flatten into one consistent stack."""
        vol = self._vol(4)
        write_enhanced(str(tmp_path / 'a_mf.dcm'), vol[:2],
                       positions=[(5, -7, 0.0), (5, -7, 2.5)])
        for i, z in enumerate((2, 3)):
            write_slice(str(tmp_path / f'b{i}.dcm'), vol[z],
                        position=(5.0, -7.0, 2.5 * z), instance=i + 3)
        img = read_dicom_series(str(tmp_path))
        np.testing.assert_array_equal(img.array, vol)

    def test_missing_frame_geometry_rejected(self, tmp_path):
        """Multi-frame without per-frame positions AND without top-level
        position+spacing must raise, not guess."""
        vol = self._vol(3)
        rows, cols = vol.shape[1:]
        meta = _el_explicit(0x0002, 0x0010, b'UI', _EXPLICIT.encode())
        body = b''
        body += _el_explicit(0x0028, 0x0008, b'IS', b'3')
        body += _el_explicit(0x0028, 0x0010, b'US', struct.pack('<H', rows))
        body += _el_explicit(0x0028, 0x0011, b'US', struct.pack('<H', cols))
        body += _el_explicit(0x0028, 0x0100, b'US', struct.pack('<H', 16))
        body += _el_explicit(0x0028, 0x0103, b'US', struct.pack('<H', 1))
        body += _el_explicit(0x7FE0, 0x0010, b'OW', vol.tobytes())
        with open(tmp_path / 'mf.dcm', 'wb') as f:
            f.write(b'\x00' * 128 + b'DICM' + meta + body)
        with pytest.raises(DicomError, match='frame geometry'):
            read_dicom_series(str(tmp_path / 'mf.dcm'))

    def test_per_frame_orientation_mismatch_rejected(self, tmp_path):
        vol = self._vol(2)
        write_enhanced(str(tmp_path / 'mf.dcm'), vol,
                       positions=[(0, 0, 0), (0, 0, 1)],
                       per_frame_orientations=[(1, 0, 0, 0, 1, 0),
                                               (0, 1, 0, 1, 0, 0)])
        with pytest.raises(DicomError, match='disagree on'):
            read_dicom_series(str(tmp_path / 'mf.dcm'))

    def test_per_frame_rescale_mismatch_rejected(self, tmp_path):
        vol = self._vol(2).view(np.uint16)
        write_enhanced(str(tmp_path / 'mf.dcm'), vol,
                       positions=[(0, 0, 0), (0, 0, 1)],
                       per_frame_rescales=[(1, -1024), (2, -1024)])
        with pytest.raises(DicomError, match='rescale'):
            read_dicom_series(str(tmp_path / 'mf.dcm'))

    def test_per_frame_spacing_mismatch_rejected(self, tmp_path):
        """PS3.3 C.7.6.16 allows per-frame PixelMeasures; frames at
        different resolutions cannot share one volume geometry."""
        vol = self._vol(2)
        write_enhanced(str(tmp_path / 'mf.dcm'), vol,
                       positions=[(0, 0, 0), (0, 0, 1)],
                       pixel_spacing=None,
                       per_frame_spacings=[(0.7, 0.8), (0.9, 0.8)])
        with pytest.raises(DicomError, match='PixelSpacing'):
            read_dicom_series(str(tmp_path / 'mf.dcm'))

    def test_per_frame_spacing_consistent_used(self, tmp_path):
        vol = self._vol(2)
        write_enhanced(str(tmp_path / 'mf.dcm'), vol,
                       positions=[(0, 0, 0), (0, 0, 1)],
                       pixel_spacing=None,
                       per_frame_spacings=[(0.7, 0.8), (0.7, 0.8)])
        sl = read_dicom_file(str(tmp_path / 'mf.dcm'))
        assert sl['pixel_spacing'] == [0.7, 0.8]

    def test_per_frame_spacing_shared_conflict_rejected(self, tmp_path):
        vol = self._vol(2)
        write_enhanced(str(tmp_path / 'mf.dcm'), vol,
                       positions=[(0, 0, 0), (0, 0, 1)],
                       pixel_spacing=(0.5, 0.5),
                       per_frame_spacings=[(0.7, 0.8), (0.7, 0.8)])
        with pytest.raises(DicomError, match='PixelSpacing'):
            read_dicom_series(str(tmp_path / 'mf.dcm'))

    def test_per_frame_rescale_consistent_applied(self, tmp_path):
        vol = (self._vol(2).astype(np.int64) + 1024).astype(np.uint16)
        write_enhanced(str(tmp_path / 'mf.dcm'), vol,
                       positions=[(0, 0, 0), (0, 0, 1)],
                       per_frame_rescales=[(1, -1024), (1, -1024)])
        img = read_dicom_series(str(tmp_path / 'mf.dcm'))
        assert img.array.dtype == np.int16
        np.testing.assert_array_equal(img.array,
                                      vol.astype(np.int64) - 1024)

    def test_single_frame_via_file_api_unchanged(self, tmp_path):
        """read_dicom_file keeps its array/position aliases for
        single-frame files (frame 0)."""
        arr = self._vol(1)[0]
        write_slice(str(tmp_path / 'a.dcm'), arr, position=(1, 2, 3))
        sl = read_dicom_file(str(tmp_path / 'a.dcm'))
        np.testing.assert_array_equal(sl['array'], arr)
        assert len(sl['frames']) == 1
        np.testing.assert_array_equal(sl['frames'][0]['array'], arr)


def _pil_jpeg(arr, **kw) -> bytes:
    """Encode a uint8 grayscale array with Pillow/libjpeg (the independent
    oracle encoder for the baseline-JPEG tests)."""
    import io as _io
    from PIL import Image
    b = _io.BytesIO()
    Image.fromarray(arr, 'L').save(b, 'JPEG', **kw)
    return b.getvalue()


def _pil_decode(data: bytes):
    import io as _io
    from PIL import Image
    return np.asarray(Image.open(_io.BytesIO(data)))


def _xray8(shape=(317, 253), seed=0):
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:shape[0], 0:shape[1]]
    img = (120 + 60 * np.sin(x / 40.0) + 50 * np.cos(y / 30.0)
           + rng.normal(0, 8, x.shape))
    return img.clip(0, 255).astype(np.uint8)


class TestJpegDct:
    """Sequential-DCT JPEG decoder (io/jpegdct.py) for the DICOM lossy
    syntaxes 1.2.840.10008.1.2.4.50/.51."""

    @pytest.mark.parametrize('quality', [95, 75, 50])
    def test_decoder_matches_libjpeg(self, quality):
        """libjpeg (via Pillow) is the independent oracle; its integer
        IDCT is specified accurate to +/-1 of the exact float IDCT
        (T.83 compliance), so decoded samples must agree within 1."""
        from totalsegmentator2d_tpu.io.jpegdct import decode
        data = _pil_jpeg(_xray8(), quality=quality)
        ours = decode(data)
        ref = _pil_decode(data)
        assert ours.shape == ref.shape and ours.dtype == np.uint8
        assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1

    def test_decoder_matches_libjpeg_restart_intervals(self):
        from totalsegmentator2d_tpu.io.jpegdct import decode
        data = _pil_jpeg(_xray8(seed=1), quality=80, restart_marker_rows=2)
        assert b'\xff\xdd' in data  # DRI actually present
        ours = decode(data)
        ref = _pil_decode(data)
        assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1

    def test_optimized_huffman_tables(self):
        """PIL optimize=True emits image-specific Huffman tables."""
        from totalsegmentator2d_tpu.io.jpegdct import decode
        data = _pil_jpeg(_xray8(seed=2), quality=70, optimize=True)
        ours = decode(data)
        ref = _pil_decode(data)
        assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1

    def test_12bit_extended_matches_independent_idct(self):
        """The 12-bit SOF1 path, checked against an independent scipy
        reconstruction of the encoder's own quantized coefficients."""
        import scipy.fft
        from totalsegmentator2d_tpu.io.jpegdct import (_IDCT_M, _ZIGZAG,
                                                       decode)
        rng = np.random.default_rng(3)
        y, x = np.mgrid[0:41, 0:29]
        img = (2048 + 900 * np.sin(x / 10.0) + 800 * np.cos(y / 7.0)
               + rng.normal(0, 40, x.shape)).clip(0, 4095).astype(np.uint16)
        q = 16
        frame = _jpegdct_frame(img, precision=12, q=q)
        ours = decode(frame)
        assert ours.dtype == np.uint16

        # independent reconstruction: re-derive the quantized coefficients
        # exactly as the encoder did, then IDCT with scipy (norm='ortho'
        # type-II inverse == the T.81 IDCT up to the same scaling)
        rows, cols = img.shape
        bh, bw_ = (rows + 7) // 8, (cols + 7) // 8
        padded = np.pad(img.astype(np.float64),
                        ((0, bh * 8 - rows), (0, bw_ * 8 - cols)),
                        mode='edge')
        blocks = padded.reshape(bh, 8, bw_, 8).transpose(0, 2, 1, 3)
        blocks = blocks.reshape(-1, 8, 8) - 2048
        fdct = np.einsum('ux,nxy,yv->nuv', _IDCT_M.T, blocks, _IDCT_M)
        deq = np.rint(fdct / q) * q
        pix = scipy.fft.idctn(deq, axes=(1, 2), norm='ortho')
        ref = np.clip(np.rint(pix + 2048), 0, 4095)
        ref = ref.reshape(bh, bw_, 8, 8).transpose(0, 2, 1, 3).reshape(
            bh * 8, bw_ * 8)[:rows, :cols]
        assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1

    def test_12bit_restart_intervals(self):
        from totalsegmentator2d_tpu.io.jpegdct import decode
        img = (np.arange(48 * 24).reshape(48, 24) % 4096).astype(np.uint16)
        plain = decode(_jpegdct_frame(img, precision=12, q=8))
        with_rst = decode(_jpegdct_frame(img, precision=12, q=8, dri=5))
        np.testing.assert_array_equal(plain, with_rst)

    def test_progressive_rejected(self):
        from totalsegmentator2d_tpu.io.jpegdct import JpegError, decode
        data = _pil_jpeg(_xray8(), quality=80, progressive=True)
        with pytest.raises(JpegError, match='progressive'):
            decode(data)

    def test_color_rejected(self):
        import io as _io
        from PIL import Image
        from totalsegmentator2d_tpu.io.jpegdct import JpegError, decode
        rgb = np.dstack([_xray8()] * 3)
        b = _io.BytesIO()
        Image.fromarray(rgb, 'RGB').save(b, 'JPEG', quality=80)
        with pytest.raises(JpegError, match='component'):
            decode(b.getvalue())

    def test_dicom_baseline_file(self, tmp_path):
        """A .50 single-frame X-ray file decodes to libjpeg's pixels."""
        img = _xray8(seed=4)
        data = _pil_jpeg(img, quality=90)
        write_slice(str(tmp_path / 'xr.dcm'), img, position=(0, 0, 0),
                    transfer_syntax=_JPB, codestream=data)
        out = read_dicom_file(str(tmp_path / 'xr.dcm'))
        ref = _pil_decode(data)
        assert out['array'].dtype == np.uint8
        assert np.abs(out['array'].astype(int) - ref.astype(int)).max() <= 1

    def test_dicom_baseline_split_fragments(self, tmp_path):
        img = _xray8(seed=5)
        data = _pil_jpeg(img, quality=90)
        write_slice(str(tmp_path / 'xr.dcm'), img, position=(0, 0, 0),
                    transfer_syntax=_JPB, codestream=data,
                    jll_split=len(data) // 2)
        out = read_dicom_file(str(tmp_path / 'xr.dcm'))
        ref = _pil_decode(data)
        assert np.abs(out['array'].astype(int) - ref.astype(int)).max() <= 1

    def test_dicom_extended_12bit_with_rescale(self, tmp_path):
        """A .51 12-bit file (uint16 wire) with a rescale to Hounsfield."""
        img = (np.arange(40 * 32).reshape(40, 32) % 4096).astype(np.uint16)
        frame = _jpegdct_frame(img, precision=12, q=1)
        write_slice(str(tmp_path / 'ct.dcm'), img, position=(0, 0, 0),
                    transfer_syntax=_JPE, codestream=frame,
                    slope=1, intercept=-1024)
        out = read_dicom_file(str(tmp_path / 'ct.dcm'))
        from totalsegmentator2d_tpu.io.jpegdct import decode
        want = decode(frame).astype(np.int64) - 1024
        np.testing.assert_array_equal(out['array'], want)

    def test_size_mismatch_rejected(self, tmp_path):
        img = _xray8(seed=6)
        data = _pil_jpeg(img[:100, :100], quality=90)
        write_slice(str(tmp_path / 'xr.dcm'), img, position=(0, 0, 0),
                    transfer_syntax=_JPB, codestream=data)
        with pytest.raises(DicomError, match='dataset says'):
            read_dicom_file(str(tmp_path / 'xr.dcm'))

    def test_python_fallback_equals_native(self, monkeypatch):
        """When the native decoder is present both paths must agree
        bit-for-bit; without it this degenerates to self-consistency."""
        from totalsegmentator2d_tpu.io import jpegdct, native
        data = _pil_jpeg(_xray8(seed=7), quality=85)
        out_default = jpegdct.decode(data)
        monkeypatch.setattr(native, 'jpegdct_decode_blocks',
                            lambda *a, **k: None)
        monkeypatch.setattr(native, 'jpegdct_reconstruct',
                            lambda *a, **k: None)
        out_py = jpegdct.decode(data)
        # entropy decode is bit-identical; the native IDCT uses the same
        # constants and half-even rounding but a fixed summation order,
        # so a .5-boundary can land one code apart from numpy's BLAS
        # order — within the codec's own T.83 decoder tolerance
        assert np.abs(out_default.astype(int) - out_py.astype(int)).max() <= 1

    @pytest.mark.parametrize('force_py', [False, True])
    def test_truncated_entropy_rejected(self, monkeypatch, force_py):
        """A stream cut mid-entropy-segment must raise, not zero-pad its
        way to fabricated blocks (both the C and the Python decoder)."""
        from totalsegmentator2d_tpu.io import jpegdct, native
        if force_py:
            monkeypatch.setattr(native, 'jpegdct_decode_blocks',
                                lambda *a, **k: None)
        rng = np.random.default_rng(11)
        img = rng.integers(0, 256, size=(32, 32)).astype(np.uint8)
        frame = _jpegdct_frame(img, precision=8, q=1)
        body = frame[:-2]  # strip EOI
        cut = body[:len(body) - (len(body) - 120) // 2] + b'\xff\xd9'
        with pytest.raises(jpegdct.JpegError,
                           match='Truncated entropy|Invalid Huffman|AC run'):
            jpegdct.decode(cut)

    def test_rst_without_dri_rejected(self):
        """RSTn markers in the entropy data with the DRI segment missing
        must raise instead of decoding only the first interval."""
        from totalsegmentator2d_tpu.io import jpegdct
        img = (np.arange(24 * 24).reshape(24, 24) % 256).astype(np.uint8)
        frame = _jpegdct_frame(img, precision=8, q=8, dri=3)
        dri_seg = bytes([0xFF, 0xDD, 0x00, 0x04]) + struct.pack('>H', 3)
        assert dri_seg in frame
        with pytest.raises(jpegdct.JpegError, match='DRI'):
            jpegdct.decode(frame.replace(dri_seg, b''))

    def test_truncated_dqt_raises_jpeg_error(self):
        """A short DQT must raise JpegError (translated to DicomError by
        the reader), not numpy's uncontextualized ValueError."""
        from totalsegmentator2d_tpu.io import jpegdct
        seg = bytes([0xFF, 0xDB, 0x00, 0x21]) + bytes([0x00]) + bytes(30)
        buf = b'\xff\xd8' + seg + b'\xff\xd9'
        with pytest.raises(jpegdct.JpegError, match='Truncated DQT'):
            jpegdct.decode(buf)


class TestJ2kT1Differential:
    """Native vs pure-Python Tier-1 on RANDOM entropy bytes, across every
    code-block style combination — including vertically-causal, context
    reset, termination-on-each-pass, and segmentation symbols, which no
    encoder available here emits. MQ decisions over arbitrary bytes are
    deterministic, so the two independent implementations must produce
    bit-identical state (or reject with the identical error)."""

    @pytest.mark.parametrize('style', [0x00, 0x02, 0x04, 0x08, 0x20,
                                       0x28, 0x0E, 0x2A])
    def test_matches_python(self, style):
        from totalsegmentator2d_tpu.io import jpeg2k, native
        if not native.native_available():
            pytest.skip('native library not built')
        rng = np.random.default_rng(style)
        for _ in range(4):
            w, h = int(rng.integers(3, 40)), int(rng.integers(3, 40))
            orient = int(rng.integers(0, 4))
            npasses = int(rng.integers(1, 10))
            start_plane = int(rng.integers(3, 12))
            if style & 0x04:  # per-pass termination: one segment per pass
                segments = [(rng.bytes(int(rng.integers(1, 60))), 1)
                            for _ in range(npasses)]
            else:
                segments = [(rng.bytes(int(rng.integers(10, 200))),
                             npasses)]
            dec = jpeg2k._BlockDecoder(w, h, orient, style)
            py_err = nat_err = None
            try:
                dec.run(list(segments), start_plane)
            except jpeg2k.Jpeg2kError as ex:
                py_err = str(ex)
            try:
                nat = native.j2k_t1_decode(
                    segments, w, h, style, start_plane,
                    jpeg2k._SIG_CTX[dec.orient], jpeg2k._SIGN_LUT)
            except jpeg2k.Jpeg2kError as ex:
                nat_err = str(ex)
            if py_err or nat_err:
                assert py_err == nat_err
                continue
            assert nat is not None
            mag, lastp, signs = nat
            np.testing.assert_array_equal(mag, dec.mag)
            np.testing.assert_array_equal(lastp, dec.lastp)
            np.testing.assert_array_equal(signs.astype(bool),
                                          dec.signs[1:-1, 1:-1])
