"""Ingest containment fuzzer: every untrusted-input parser in io/.

Mutates and truncates valid files of every supported format and asserts
the parser's error CONTRACT: each trial either decodes (to a bounded
array) or raises the format's documented error type — never a foreign
exception (KeyError, struct.error, zlib/gzip errors, PIL internals),
never a hang, never an unbounded allocation. The seeded slices in
tests/test_001_io.py and tests/test_017_dicom.py are subsets of this;
run this for the full campaign after touching any parser:

    python tools/fuzz_ingest.py [--trials N] [--truncation-step K]

Targets: NRRD (gzip+raw), NIfTI (.nii/.nii.gz), MetaImage (mha
compressed+raw), PNG rasters, the DICOM element parser (explicit /
implicit / RLE), and the four JPEG-family pixel codecs (via their DICOM
fixtures when the oracle encoders are available).
"""

import argparse
import io
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'tests'))


def _targets(tmp):
    """Yield (name, path_or_bytes_decoder, base_bytes, contract_error)."""
    from totalsegmentator2d_tpu.io import (MedicalImage, read_image,
                                           write_image)
    from totalsegmentator2d_tpu.io.dicom import DicomError
    from test_017_dicom import (write_slice, _EXPLICIT, _IMPLICIT, _RLE,
                                _jpegll_frame, _jpegdct_frame)

    rng = np.random.default_rng(0)
    arr3 = rng.integers(-500, 1500, (4, 8, 9)).astype(np.int16)
    img = MedicalImage(array=arr3, spacing=(0.7, 0.8, 2.5))
    for name, compress in [('a.nrrd', True), ('b.nrrd', False),
                           ('c.nii', False), ('d.nii.gz', True),
                           ('e.mha', True), ('f.mha', False)]:
        p = os.path.join(tmp, name)
        write_image(img, p, compress=compress)
        yield name, read_image, open(p, 'rb').read(), ValueError

    arr2 = rng.integers(-500, 1500, (10, 12)).astype(np.int16)
    for name, ts in [('exp.dcm', _EXPLICIT), ('imp.dcm', _IMPLICIT),
                     ('rle.dcm', _RLE)]:
        p = os.path.join(tmp, name)
        write_slice(p, arr2, position=(0, 0, 0), transfer_syntax=ts)
        yield name, read_image, open(p, 'rb').read(), DicomError

    from totalsegmentator2d_tpu.io import jpegll, jpegdct, jpegls, jpeg2k
    u12 = (arr2.astype(np.int32) + 1024).astype(np.uint16)
    yield 'jll', jpegll.decode, bytes(_jpegll_frame(u12)), jpegll.JpegError
    u8 = (u12 >> 4).astype(np.uint8)
    yield ('jdct', jpegdct.decode,
           bytes(_jpegdct_frame(u8, precision=8)), jpegll.JpegError)
    try:
        import charls_oracle as co
        if co.available():
            yield ('jls', jpegls.decode, co.encode(u12, 12),
                   jpegls.JpegLsError)
    except ImportError:
        pass
    try:
        from PIL import Image
        im = Image.frombytes('I;16', (u12.shape[1], u12.shape[0]),
                             u12.astype('<u2').tobytes())
        b = io.BytesIO()
        im.save(b, 'JPEG2000', irreversible=False, no_jp2=True)
        yield 'j2k', jpeg2k.decode, b.getvalue(), jpeg2k.Jpeg2kError
        b = io.BytesIO()
        Image.fromarray(u8).save(b, 'PNG')
        yield 'x.png', read_image, b.getvalue(), ValueError
    except Exception:
        pass


def run(trials: int, trunc_step: int) -> int:
    rng = np.random.default_rng(2026)
    failures = 0
    with tempfile.TemporaryDirectory() as tmp:
        for name, dec, base, err in list(_targets(tmp)):
            by_path = dec.__name__ == 'read_image'
            pm = os.path.join(tmp, 'mut_' + name)

            def attempt(data):
                nonlocal failures
                try:
                    if by_path:
                        open(pm, 'wb').write(data)
                        out = dec(pm)
                        size = out.array.size
                    else:
                        out = dec(data)
                        size = out.size
                    assert size <= 1 << 28, 'unbounded allocation'
                except err:
                    pass
                except Exception as ex:
                    failures += 1
                    print(f'LEAK {name}: {type(ex).__name__}: '
                          f'{str(ex)[:80]}')

            for _ in range(trials):
                data = bytearray(base)
                for _ in range(int(rng.integers(1, 8))):
                    data[int(rng.integers(0, len(data)))] = \
                        int(rng.integers(0, 256))
                attempt(bytes(data))
            for cut in range(1, len(base), trunc_step):
                attempt(bytes(base[:cut]))
            print(f'{name}: {trials} mutations + '
                  f'{(len(base) - 1 + trunc_step - 1) // trunc_step} '
                  f'truncations done')
    print('leaked:', failures)
    return 1 if failures else 0


if __name__ == '__main__':
    ap = argparse.ArgumentParser()
    ap.add_argument('--trials', type=int, default=800)
    ap.add_argument('--truncation-step', type=int, default=3)
    args = ap.parse_args()
    sys.exit(run(args.trials, args.truncation_step))
