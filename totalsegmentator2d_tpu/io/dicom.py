"""Minimal DICOM CT-series reader (pure Python, no pydicom).

Neither the reference tool nor nnU-Net reads DICOM directly — users convert
series to NRRD/NIfTI first. CT data, however, arrives from scanners as
DICOM, so this build reads the common cases natively: uncompressed
little-endian transfer syntaxes (implicit 1.2.840.10008.1.2 and explicit
1.2.840.10008.1.2.1), RLE Lossless (1.2.840.10008.1.2.5, the PackBits
scheme — decoded in _rle_decode_frame), and JPEG Lossless
(1.2.840.10008.1.2.4.57/.70, T.81 process 14 — the dominant compressed CT
archive syntax, decoded in io/jpegll.py with a native C hot loop),
single-frame single-sample slices, assembled into one (Z, Y, X) volume
with full LPS geometry (DICOM's patient coordinate system IS LPS, the
framework's world frame — no conversion needed).

Deliberately conservative: lossy-JPEG transfer syntaxes, JPEG-LS/2000,
multi-frame files, color images, and non-uniform slice stacks raise
informative errors rather than guessing. Geometry notes:
 - ImageOrientationPatient (0020,0037) gives the column-axis (x) and
   row-axis (y) direction cosines; the z column of the direction matrix
   comes from the actual slice-position delta (not the cross product), so
   flipped/descending stacks keep their true orientation.
 - PixelSpacing (0028,0030) is (row, col) = (y, x); ITK-order spacing is
   (x, y, z) with z from successive ImagePositionPatient distances.
 - Rescale slope/intercept (0028,1052/1053) are applied; integral results
   that fit int16 stay int16 (CT Hounsfield units), else float32.
"""

from __future__ import annotations

import os
import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

from .image import MedicalImage

_IMPLICIT_LE = '1.2.840.10008.1.2'
_EXPLICIT_LE = '1.2.840.10008.1.2.1'
_RLE_LOSSLESS = '1.2.840.10008.1.2.5'
_JPEG_LL = '1.2.840.10008.1.2.4.57'      # process 14, any predictor
_JPEG_LL_SV1 = '1.2.840.10008.1.2.4.70'  # process 14 selection value 1

# VRs whose explicit encoding uses a 2-byte reserved field + 4-byte length
_LONG_VRS = {b'OB', b'OW', b'OF', b'OD', b'OL', b'SQ', b'UC', b'UR',
             b'UT', b'UN'}

_ITEM = (0xFFFE, 0xE000)
_ITEM_DELIM = (0xFFFE, 0xE00D)
_SEQ_DELIM = (0xFFFE, 0xE0DD)

DICOM_EXTENSIONS = ('.dcm', '.dicom', '.ima')

# tags we collect (group, element)
_TAGS = {
    (0x0020, 0x000E): 'SeriesInstanceUID',
    (0x0020, 0x0013): 'InstanceNumber',
    (0x0020, 0x0032): 'ImagePositionPatient',
    (0x0020, 0x0037): 'ImageOrientationPatient',
    (0x0028, 0x0002): 'SamplesPerPixel',
    (0x0028, 0x0008): 'NumberOfFrames',
    (0x0028, 0x0010): 'Rows',
    (0x0028, 0x0011): 'Columns',
    (0x0028, 0x0030): 'PixelSpacing',
    (0x0028, 0x0100): 'BitsAllocated',
    (0x0028, 0x0103): 'PixelRepresentation',
    (0x0028, 0x1052): 'RescaleIntercept',
    (0x0028, 0x1053): 'RescaleSlope',
    (0x7FE0, 0x0010): 'PixelData',
}


class DicomError(ValueError):
    pass


def _read_file_meta(buf: bytes) -> Tuple[int, str]:
    """Return (offset of the first dataset element, transfer syntax UID).
    The file meta group (0002,xxxx) is always explicit VR little endian."""
    if len(buf) > 132 and buf[128:132] == b'DICM':
        pos = 132
    elif buf[:4] == b'DICM':  # preamble-less writers exist
        pos = 4
    else:
        # no file meta at all: raw implicit-LE dataset (legacy exports)
        return 0, _IMPLICIT_LE
    ts = _IMPLICIT_LE
    while pos + 8 <= len(buf):
        group, elem = struct.unpack_from('<HH', buf, pos)
        if group != 0x0002:
            break
        vr = buf[pos + 4:pos + 6]
        if vr in _LONG_VRS:
            (length,) = struct.unpack_from('<I', buf, pos + 8)
            value_at = pos + 12
        else:
            (length,) = struct.unpack_from('<H', buf, pos + 6)
            value_at = pos + 8
        if elem == 0x0010:
            ts = buf[value_at:value_at + length].decode(
                'ascii', 'replace').rstrip('\x00 ').strip()
        pos = value_at + length
    return pos, ts


def _element_header(buf: bytes, pos: int,
                    implicit: bool) -> Tuple[Tuple[int, int], int, int]:
    """Parse one data-element header at ``pos``; returns (tag, length,
    value offset). Delimiter pseudo-elements (group FFFE) always use the
    implicit 4-byte-length form, even in explicit files."""
    if pos + 8 > len(buf):
        raise DicomError('Truncated data element')
    group, elem = struct.unpack_from('<HH', buf, pos)
    tag = (group, elem)
    if implicit or group == 0xFFFE:
        (length,) = struct.unpack_from('<I', buf, pos + 4)
        return tag, length, pos + 8
    vr = buf[pos + 4:pos + 6]
    if vr in _LONG_VRS:
        (length,) = struct.unpack_from('<I', buf, pos + 8)
        return tag, length, pos + 12
    (length,) = struct.unpack_from('<H', buf, pos + 6)
    return tag, length, pos + 8


def _skip_sequence(buf: bytes, pos: int, implicit: bool) -> int:
    """Skip an undefined-length SQ value starting at ``pos``; returns the
    offset past the sequence delimiter. Items may themselves be
    undefined-length (terminated by an item delimiter, PS3.5 §7.5 — the
    standard layout scanners actually write) and may nest further
    sequences."""
    while True:
        tag, length, value_at = _element_header(buf, pos, implicit)
        if tag == _SEQ_DELIM:
            return value_at + length
        if tag != _ITEM:
            raise DicomError('Malformed sequence (expected an item)')
        if length == 0xFFFFFFFF:
            pos = _skip_item(buf, value_at, implicit)
        else:
            pos = value_at + length


def _skip_item(buf: bytes, pos: int, implicit: bool) -> int:
    """Skip an undefined-length item body (a stream of data elements up to
    the item delimiter)."""
    while True:
        tag, length, value_at = _element_header(buf, pos, implicit)
        if tag == _ITEM_DELIM:
            return value_at + length
        if length == 0xFFFFFFFF:  # nested undefined-length sequence
            pos = _skip_sequence(buf, value_at, implicit)
        else:
            pos = value_at + length


def _parse_fragments(buf: bytes, pos: int) -> Tuple[List[bytes], int]:
    """Parse an encapsulated PixelData value (PS3.5 A.4): a Basic Offset
    Table item followed by one fragment item per frame, closed by a
    sequence delimiter. Returns (fragments without the BOT, offset past
    the delimiter)."""
    frags: List[bytes] = []
    first = True
    while True:
        tag, length, value_at = _element_header(buf, pos, implicit=True)
        if tag == _SEQ_DELIM:
            return frags, value_at + length
        if tag != _ITEM or length == 0xFFFFFFFF:
            raise DicomError('Malformed encapsulated PixelData')
        if not first:  # the first item is the Basic Offset Table
            frags.append(buf[value_at:value_at + length])
        first = False
        pos = value_at + length


def _parse_dataset(buf: bytes, pos: int, implicit: bool) -> Dict[str, bytes]:
    """Collect the raw value bytes of the tags in _TAGS; stop after
    PixelData."""
    out: Dict[str, bytes] = {}
    n = len(buf)
    while pos + 8 <= n:
        tag, length, value_at = _element_header(buf, pos, implicit)
        if length == 0xFFFFFFFF:
            if tag in _TAGS and _TAGS[tag] == 'PixelData':
                # encapsulated (compressed) PixelData: collect the raw
                # fragments; whether the compression is decodable (RLE) is
                # the caller's decision based on the transfer syntax
                out['PixelDataFragments'], pos = _parse_fragments(
                    buf, value_at)
                return out
            pos = _skip_sequence(buf, value_at, implicit)
            continue
        if tag in _TAGS:
            out[_TAGS[tag]] = buf[value_at:value_at + length]
            if _TAGS[tag] == 'PixelData':
                return out
        pos = value_at + length
    return out


def _ds(raw: Optional[bytes]) -> List[float]:
    if raw is None:
        return []
    text = raw.decode('ascii', 'replace').strip('\x00 ')
    return [float(v) for v in text.split('\\') if v.strip()]


def _us(raw: Optional[bytes], default: Optional[int] = None) -> Optional[int]:
    if raw is None or len(raw) < 2:
        return default
    return struct.unpack_from('<H', raw, 0)[0]


def _int(raw: Optional[bytes], default: int = 0) -> int:
    if raw is None:
        return default
    try:
        return int(raw.decode('ascii', 'replace').strip('\x00 ') or default)
    except ValueError:
        return default


def _rle_decode_segment(data: bytes, expected: int) -> bytes:
    """PackBits decode (PS3.5 G.3.1): control byte n in [0,127] copies the
    next n+1 literal bytes, n in [129,255] repeats the next byte 257-n
    times, n=128 is a no-op. Stops once ``expected`` bytes are produced
    (encoders may pad the segment to even length)."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < expected:
        h = data[i]
        i += 1
        if h < 128:
            out += data[i:i + h + 1]
            i += h + 1
        elif h > 128:
            if i >= n:
                break
            out += data[i:i + 1] * (257 - h)
            i += 1
    if len(out) < expected:
        raise DicomError(f'Short RLE segment: {len(out)} of {expected} bytes')
    return bytes(out[:expected])


def _rle_decode_frame(frame: bytes, rows: int, cols: int,
                      bytes_per_sample: int) -> np.ndarray:
    """Decode one RLE frame (PS3.5 Annex G) into a (rows, cols) uint8 or
    uint16 array. The 64-byte header holds the segment count + 15 segment
    offsets; multi-byte samples split into one PackBits segment per byte
    plane, most significant first."""
    if len(frame) < 64:
        raise DicomError('RLE frame shorter than its 64-byte header')
    nseg = struct.unpack_from('<I', frame, 0)[0]
    offsets = struct.unpack_from('<15I', frame, 4)
    if nseg != bytes_per_sample:
        raise DicomError(
            f'RLE frame has {nseg} segments; expected {bytes_per_sample} '
            f'(grayscale, {bytes_per_sample * 8}-bit)')
    npix = rows * cols
    planes = []
    for s in range(nseg):
        start = offsets[s]
        end = offsets[s + 1] if s + 1 < nseg else len(frame)
        if not (64 <= start <= end <= len(frame)):
            raise DicomError('RLE segment offsets out of bounds')
        planes.append(np.frombuffer(
            _rle_decode_segment(frame[start:end], npix), np.uint8))
    if nseg == 1:
        return planes[0].reshape(rows, cols)
    # composite pixel code, most significant byte plane first
    val = (planes[0].astype(np.uint16) << 8) | planes[1]
    return val.reshape(rows, cols)


def read_dicom_file(path: str) -> dict:
    """Parse one DICOM file into {array (Y, X), position, orientation,
    pixel_spacing, instance}. Raises DicomError on unsupported encodings."""
    with open(path, 'rb') as f:
        buf = f.read()
    pos, ts = _read_file_meta(buf)
    rle = jpegll = False
    if ts == _IMPLICIT_LE:
        implicit = True
    elif ts == _EXPLICIT_LE:
        implicit = False
    elif ts == _RLE_LOSSLESS:
        implicit, rle = False, True
    elif ts in (_JPEG_LL, _JPEG_LL_SV1):
        implicit, jpegll = False, True
    else:
        raise DicomError(
            f'Unsupported transfer syntax {ts} in {os.path.basename(path)} '
            f'(uncompressed little endian, RLE lossless, and JPEG lossless '
            f'are read natively; convert lossy-JPEG/JPEG-2000 series to '
            f'NRRD/NIfTI)')
    el = _parse_dataset(buf, pos, implicit)
    rows, cols = _us(el.get('Rows')), _us(el.get('Columns'))
    if not rows or not cols:
        raise DicomError(f'{os.path.basename(path)}: missing Rows/Columns')
    if _us(el.get('SamplesPerPixel'), 1) != 1:
        raise DicomError('Only single-sample (grayscale) images are supported')
    if _int(el.get('NumberOfFrames'), 1) != 1:
        raise DicomError('Multi-frame DICOM files are not supported')
    bits = _us(el.get('BitsAllocated'), 16)
    signed = _us(el.get('PixelRepresentation'), 0) == 1
    dtype = {(8, False): np.uint8, (8, True): np.int8,
             (16, False): np.uint16, (16, True): np.int16}.get((bits, signed))
    if dtype is None:
        raise DicomError(f'Unsupported BitsAllocated={bits}')
    if rle or jpegll:
        frags = el.get('PixelDataFragments')
        if not frags:
            raise DicomError(
                f'{os.path.basename(path)}: compressed file without '
                f'encapsulated PixelData fragments')
        if rle:
            # PS3.5 A.4.2: an RLE frame occupies exactly one fragment; with
            # a single frame the first fragment is the whole frame
            arr = _rle_decode_frame(frags[0], rows, cols, bits // 8)
        else:
            # a JPEG frame may be SPLIT across fragments (PS3.5 A.4); with
            # one frame the full codestream is the fragment concatenation
            from .jpegll import JpegError, decode as jpegll_decode
            try:
                arr = jpegll_decode(b''.join(frags))
            except JpegError as ex:
                raise DicomError(
                    f'{os.path.basename(path)}: {ex}') from ex
            if arr.shape != (rows, cols):
                raise DicomError(
                    f'{os.path.basename(path)}: JPEG frame is '
                    f'{arr.shape[0]}x{arr.shape[1]}, dataset says '
                    f'{rows}x{cols}')
        arr = arr.view(dtype) if arr.itemsize == np.dtype(dtype).itemsize \
            else arr.astype(dtype)
    else:
        pix = el.get('PixelData')
        if pix is None:
            if el.get('PixelDataFragments') is not None:
                raise DicomError(
                    f'{os.path.basename(path)}: encapsulated PixelData in a '
                    f'non-RLE transfer syntax is not supported')
            raise DicomError(f'{os.path.basename(path)}: no PixelData')
        need = rows * cols * (bits // 8)
        if len(pix) < need:
            raise DicomError(f'{os.path.basename(path)}: truncated PixelData')
        arr = np.frombuffer(pix[:need], dtype=dtype).reshape(rows, cols)
    slope = (_ds(el.get('RescaleSlope')) or [1.0])[0]
    inter = (_ds(el.get('RescaleIntercept')) or [0.0])[0]
    if slope != 1.0 or inter != 0.0:
        scaled = arr.astype(np.float64) * slope + inter
        if float(slope).is_integer() and float(inter).is_integer() \
                and scaled.min() >= -32768 and scaled.max() <= 32767:
            arr = scaled.astype(np.int16)  # CT Hounsfield units
        else:
            arr = scaled.astype(np.float32)
    uid = el.get('SeriesInstanceUID')
    return {
        'array': arr,
        'position': _ds(el.get('ImagePositionPatient')),
        'orientation': _ds(el.get('ImageOrientationPatient')),
        'pixel_spacing': _ds(el.get('PixelSpacing')),
        'instance': _int(el.get('InstanceNumber')),
        'series_uid': (uid.decode('ascii', 'replace').rstrip('\x00 ').strip()
                       if uid else ''),
        'path': path,
    }


def _series_files(path: str) -> List[str]:
    files = sorted(
        os.path.join(path, f) for f in os.listdir(path)
        if f.lower().endswith(DICOM_EXTENSIONS) and not f.startswith('.'))
    if not files:
        raise DicomError(f'No DICOM files (*.dcm) found in {path}')
    return files


def read_dicom_series(path: str) -> MedicalImage:
    """Read a directory of single-frame DICOM slices (or one file) into a
    3D MedicalImage with LPS geometry."""
    files = _series_files(path) if os.path.isdir(path) else [path]
    slices = [read_dicom_file(f) for f in files]

    uids = {s['series_uid'] for s in slices if s['series_uid']}
    if len(uids) > 1:
        raise DicomError(
            f'{len(uids)} different series in one directory (mixed '
            f'SeriesInstanceUIDs); separate the series first')

    first = slices[0]
    # reference tags come from the first slice that HAS them — a missing
    # tag on slice 1 must not silence the consistency checks (or default
    # the orientation to identity when the rest of the stack is tilted)
    ref_iop = next((s['orientation'] for s in slices if s['orientation']),
                   None)
    ref_ps = next((s['pixel_spacing'] for s in slices if s['pixel_spacing']),
                  None)
    for s in slices:
        if s['array'].shape != first['array'].shape:
            raise DicomError('Slices disagree on Rows/Columns')
        if ref_iop and s['orientation'] and not np.allclose(
                s['orientation'], ref_iop, atol=1e-4):
            raise DicomError('Slices disagree on ImageOrientationPatient '
                             '(mixed series?)')
        if ref_ps and s['pixel_spacing'] and not np.allclose(
                s['pixel_spacing'], ref_ps, rtol=1e-4):
            raise DicomError('Slices disagree on PixelSpacing')

    iop = ref_iop or [1, 0, 0, 0, 1, 0]
    x_dir = np.asarray(iop[0:3], float)
    y_dir = np.asarray(iop[3:6], float)
    normal = np.cross(x_dir, y_dir)

    n_pos = sum(len(s['position']) == 3 for s in slices)
    if len(slices) > 1 and n_pos < len(slices):
        # guessing dz (and slice order) would silently produce wrong
        # physical geometry — refuse ("conservative, raise rather than
        # guess"); single slices fall through with dz=1
        raise DicomError(
            f'ImagePositionPatient present on {n_pos}/{len(slices)} slices; '
            f'cannot derive slice order/spacing — fix or convert the series')
    if len(slices) > 1:
        slices.sort(key=lambda s: float(np.dot(s['position'], normal)))
        locs = np.asarray([np.dot(s['position'], normal) for s in slices])
        deltas = np.diff(locs)
        if np.any(deltas <= 0):
            raise DicomError('Duplicate slice positions in the series')
        dz = float(np.median(deltas))
        if np.any(np.abs(deltas - dz) > max(1e-3, 0.01 * dz)):
            raise DicomError(
                f'Non-uniform slice spacing (deltas {deltas.min():.4f}..'
                f'{deltas.max():.4f} mm); resample the series first')
        z_dir = (np.asarray(slices[-1]['position'], float)
                 - np.asarray(slices[0]['position'], float))
        z_dir = z_dir / np.linalg.norm(z_dir)
    else:  # single slice: unit z spacing, normal from the orientation
        dz = 1.0
        z_dir = normal

    ps = ref_ps or [1.0, 1.0]
    spacing = (float(ps[1]), float(ps[0]), dz)  # (x, y, z): PixelSpacing is (row, col)
    origin = tuple(slices[0]['position']) if slices[0]['position'] \
        else (0.0, 0.0, 0.0)
    direction = np.stack([x_dir, y_dir, z_dir], axis=1)

    vol = np.stack([s['array'] for s in slices])  # (Z, Y, X)
    return MedicalImage(array=vol, spacing=spacing, origin=origin,
                        direction=direction)


def is_dicom_dir(path: str) -> bool:
    """A directory containing DICOM slice files and NO other supported
    image files — treated as ONE case (the series) by the CLI. A mixed
    directory (scans dir with a stray .dcm) is NOT a series: the CLI must
    enumerate its NRRD/NIfTI files normally rather than silently swallow
    them into a bogus one-slice volume."""
    if not os.path.isdir(path):
        return False
    from . import SUPPORTED_EXTENSIONS
    has_dicom = False
    for f in os.listdir(path):
        low = f.lower()
        if f.startswith('.'):
            continue
        if low.endswith(DICOM_EXTENSIONS):
            has_dicom = True
        elif low.endswith(tuple('.' + e for e in SUPPORTED_EXTENSIONS)):
            return False
    return has_dicom
