"""IO layer: NRRD/NIfTI/MetaImage codecs against the bundled reference assets
(headers documented in SURVEY.md §4) and synthetic round-trips."""

import os

import numpy as np
import pytest

from tests.conftest import asset_path
from totalsegmentator2d_tpu.io import (MedicalImage, image_from_array,
                                       read_image, write_image)


class TestReferenceAssets:
    def test_ct_volume(self):
        img = read_image(asset_path('sample_s0521.nrrd'))
        assert img.size == (53, 120, 133)
        assert img.dim == 3
        assert img.ncomponents == 1
        assert img.array.dtype == np.int16
        assert np.allclose(img.spacing, (1.5, 1.5, 1.5))
        # space directions (-1.5,0,0) (0,-1.5,0) (0,0,1.5) => direction diag(-1,-1,1)
        assert np.allclose(img.direction, np.diag([-1, -1, 1]))
        arr = img.array
        assert arr.shape == (133, 120, 53)
        assert arr.min() < -500 and arr.max() > 500  # plausible CT HU range

    def test_preprojected_2ch(self):
        img = read_image(asset_path('sample_s0332.nrrd'))
        assert img.is_vector
        assert img.ncomponents == 2
        assert img.size == (269, 1, 505)
        assert img.dim == 3
        assert img.array.dtype == np.float32
        assert np.allclose(img.spacing, (1.5, 403.5, 1.5))
        assert img.actual_dimension() == 2

    def test_true_2d_vector(self):
        img = read_image(asset_path('sample_s0616.nrrd'))
        assert img.dim == 2
        assert img.is_vector and img.ncomponents == 2
        assert img.size == (337, 644)
        assert img.array.dtype == np.float64
        # rotated direction matrix must be unit-norm columns
        assert np.allclose(np.linalg.norm(img.direction, axis=0), 1.0)
        assert np.allclose(img.spacing, (1.4991536, 1.4999976), atol=1e-4)

    def test_xray_2d(self):
        img = read_image(asset_path('sample_chexpert.nrrd'))
        assert img.dim == 2
        assert not img.is_vector
        assert img.size == (320, 320)
        assert img.array.dtype == np.uint8
        assert np.allclose(img.spacing, (1.25, 1.25))


class TestRoundTrips:
    def _mk3d(self, rng, dtype=np.int16):
        arr = rng.integers(-1000, 1000, size=(7, 6, 5)).astype(dtype)
        return MedicalImage(
            array=arr, spacing=(1.5, 2.0, 2.5), origin=(10.0, -5.0, 3.25),
            direction=np.diag([-1.0, -1.0, 1.0]),
            meta={'who': 'ts2d-tpu', 'k': 'v'})

    @pytest.mark.parametrize('ext,compress', [
        ('nrrd', True), ('nrrd', False), ('nii', False), ('nii.gz', True),
        ('mha', True), ('mha', False), ('mhd', True),
    ])
    def test_scalar_3d(self, tmp_path, rng, ext, compress):
        img = self._mk3d(rng)
        p = str(tmp_path / f'img.{ext}')
        write_image(img, p, compress=compress)
        back = read_image(p)
        np.testing.assert_array_equal(back.array, img.array)
        assert back.array.dtype == img.array.dtype
        assert np.allclose(back.spacing, img.spacing)
        assert np.allclose(back.origin, img.origin, atol=1e-5)
        assert np.allclose(back.direction, img.direction, atol=1e-6)

    def test_nrrd_meta_roundtrip(self, tmp_path, rng):
        img = self._mk3d(rng)
        img.meta = {'Segment0_Name': 'heart', 'Segment0_LabelValue': '1'}
        p = str(tmp_path / 'img.nrrd')
        write_image(img, p)
        back = read_image(p)
        assert back.meta['Segment0_Name'] == 'heart'
        assert back.meta['Segment0_LabelValue'] == '1'

    @pytest.mark.parametrize('ext', ['nrrd', 'mha', 'nii.gz'])
    def test_vector_2d(self, tmp_path, rng, ext):
        arr = rng.random((10, 8, 2)).astype(np.float32)
        img = MedicalImage(array=arr, spacing=(1.0, 2.0), origin=(1.0, 2.0),
                           direction=np.eye(2), is_vector=True)
        p = str(tmp_path / f'img.{ext}')
        write_image(img, p)
        back = read_image(p)
        assert back.is_vector and back.ncomponents == 2
        np.testing.assert_allclose(back.array, arr, rtol=1e-6)
        assert np.allclose(back.spacing, img.spacing)

    def test_reference_asset_rewrite(self, tmp_path):
        """Round-trip a real reference asset bit-exactly."""
        src = read_image(asset_path('sample_s0332.nrrd'))
        p = str(tmp_path / 'copy.nrrd')
        write_image(src, p)
        back = read_image(p)
        np.testing.assert_array_equal(back.array, src.array)
        assert np.allclose(back.spacing, src.spacing)
        assert np.allclose(back.direction, src.direction)
        assert np.allclose(back.origin, src.origin)


class TestGeometry:
    def test_index_physical_roundtrip(self, rng):
        img = MedicalImage(
            array=np.zeros((4, 5, 6), np.float32), spacing=(1.5, 2.0, 0.5),
            origin=(4.0, -3.0, 9.0),
            direction=np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], float))
        idx = np.array([3.0, 2.0, 1.0])
        p = img.index_to_physical(idx)
        back = img.physical_to_index(p)
        np.testing.assert_allclose(back, idx, atol=1e-9)

    def test_compose_split(self, rng):
        a = image_from_array(rng.random((5, 4)).astype(np.float32))
        b = image_from_array(rng.random((5, 4)).astype(np.float32))
        v = MedicalImage.compose([a, b])
        assert v.ncomponents == 2
        chans = v.split_channels()
        np.testing.assert_array_equal(chans[0].array, a.array)
        np.testing.assert_array_equal(chans[1].array, b.array)

    def test_png_roundtrip(self, tmp_path, rng):
        arr = rng.integers(0, 255, size=(16, 16, 3)).astype(np.uint8)
        img = MedicalImage(array=arr, is_vector=True)
        p = str(tmp_path / 'x.png')
        write_image(img, p)
        back = read_image(p)
        np.testing.assert_array_equal(back.array, arr)


class TestNrrdEdgeCases:
    def _header(self, **over):
        base = {
            'type': 'short', 'dimension': '2', 'space dimension': '2',
            'sizes': '4 3', 'space directions': '(1,0) (0,1)',
            'kinds': 'domain domain', 'encoding': 'raw',
            'space origin': '(0,0)',
        }
        base.update(over)
        return 'NRRD0004\n' + ''.join(f'{k}: {v}\n' for k, v in base.items()) + '\n'

    def test_ascii_encoding(self, tmp_path):
        arr = np.arange(12, dtype=np.int16).reshape(3, 4)
        p = tmp_path / 'a.nrrd'
        p.write_text(self._header(encoding='ascii')
                     + ' '.join(str(v) for v in arr.ravel()))
        img = read_image(str(p))
        np.testing.assert_array_equal(img.array, arr)

    def test_big_endian(self, tmp_path):
        arr = np.arange(12, dtype=np.int16).reshape(3, 4)
        p = tmp_path / 'b.nrrd'
        p.write_bytes(self._header(endian='big').encode()
                      + arr.astype('>i2').tobytes())
        img = read_image(str(p))
        np.testing.assert_array_equal(img.array, arr)

    def test_detached_header(self, tmp_path):
        arr = np.arange(12, dtype=np.int16).reshape(3, 4)
        (tmp_path / 'c.raw').write_bytes(arr.astype('<i2').tobytes())
        p = tmp_path / 'c.nhdr'
        p.write_text(self._header(**{'endian': 'little',
                                     'data file': 'c.raw'}))
        img = read_image(str(p))
        np.testing.assert_array_equal(img.array, arr)

    def test_nifti_nan_slope_ignored(self, tmp_path, rng):
        """scl_slope=NaN means 'unset' — the volume must come back intact."""
        import struct
        from totalsegmentator2d_tpu.io import nifti, MedicalImage, write_image
        img = MedicalImage(array=rng.integers(-100, 100, (4, 5, 6)).astype(np.int16),
                           spacing=(1.0, 1.0, 1.0))
        p = str(tmp_path / 'x.nii')
        write_image(img, p)
        raw = bytearray(open(p, 'rb').read())
        struct.pack_into('<f', raw, 112, float('nan'))  # scl_slope = NaN
        struct.pack_into('<f', raw, 116, float('nan'))  # scl_inter = NaN
        open(p, 'wb').write(bytes(raw))
        back = read_image(p)
        np.testing.assert_array_equal(back.array, img.array)
        assert not np.isnan(back.array.astype(np.float64)).any()


class TestGzipAndSkips:
    def test_multimember_gzip(self, tmp_path, rng):
        """Concatenated gzip members (pigz/bgzip style) must decode fully."""
        import gzip as pygzip
        from totalsegmentator2d_tpu.io import native
        a = rng.integers(0, 255, 50_000).astype('uint8').tobytes()
        b = rng.integers(0, 255, 30_000).astype('uint8').tobytes()
        multi = pygzip.compress(a) + pygzip.compress(b)
        assert native.gzip_decompress(multi) == a + b

    def test_nrrd_byte_skip(self, tmp_path):
        arr = np.arange(12, dtype=np.int16).reshape(3, 4)
        hdr = ('NRRD0004\ntype: short\ndimension: 2\nspace dimension: 2\n'
               'sizes: 4 3\nspace directions: (1,0) (0,1)\n'
               'kinds: domain domain\nendian: little\nencoding: raw\n'
               'space origin: (0,0)\nbyte skip: 7\n\n')
        p = tmp_path / 's.nrrd'
        p.write_bytes(hdr.encode() + b'JUNK!!!' + arr.astype('<i2').tobytes())
        img = read_image(str(p))
        np.testing.assert_array_equal(img.array, arr)

    def test_unannotated_label_visual_not_blank(self, rng):
        """Label images without color metadata must render visible colors."""
        from totalsegmentator2d_tpu.ops import create_visual
        arr = np.zeros((20, 20), np.uint8)
        arr[2:10, 2:10] = 1
        arr[12:18, 12:18] = 2
        vis = create_visual(MedicalImage(array=arr, spacing=(1.0, 1.0)))
        assert vis.ncomponents == 3
        # the two labels must not both be white
        px1 = vis.array[5, 5]
        px2 = vis.array[15, 15]
        assert not np.array_equal(px1, [255, 255, 255])
        assert not np.array_equal(px1, px2)


class TestReaderContainment:
    """Malformed container files must surface as ValueError (the io error
    contract), never a foreign exception — KeyError from header lookups,
    zlib/gzip errors from corrupt payloads, FileNotFoundError from a
    mutated detached-data reference (seeded slice of a 4800-case
    development fuzz that found all of those leaking)."""

    @pytest.mark.parametrize('name,compress', [
        ('a.nrrd', True), ('b.nrrd', False), ('c.nii', False),
        ('d.nii.gz', True), ('e.mha', True), ('f.mha', False)])
    def test_mutations_contained(self, tmp_path, name, compress):
        import zlib
        from totalsegmentator2d_tpu.io import read_image, write_image
        # crc32, not hash(): str hashes are salted per process, and a
        # seeded fuzz slice must reproduce across runs
        rng = np.random.default_rng(zlib.crc32(name.encode()))
        arr = rng.integers(-500, 1500, (4, 8, 9)).astype(np.int16)
        img = MedicalImage(array=arr, spacing=(0.7, 0.8, 2.5))
        p = tmp_path / name
        write_image(img, str(p), compress=compress)
        base = bytearray(p.read_bytes())
        pm = tmp_path / ('mut_' + name)
        for trial in range(120):
            data = bytearray(base)
            for _ in range(int(rng.integers(1, 6))):
                data[int(rng.integers(0, len(data)))] = \
                    int(rng.integers(0, 256))
            pm.write_bytes(bytes(data))
            try:
                out = read_image(str(pm))
                assert out.array.size <= 1 << 28
            except ValueError:
                pass
        for _ in range(40):
            cut = int(rng.integers(1, len(base)))
            pm.write_bytes(bytes(base[:cut]))
            try:
                read_image(str(pm))
            except ValueError:
                pass

    def test_datafile_traversal_rejected(self, tmp_path):
        """A detached header is untrusted input: absolute or escaping
        data-file references must be refused, not followed."""
        from totalsegmentator2d_tpu.io import metaimage, nrrd
        victim = tmp_path / 'victim.bin'
        victim.write_bytes(b'\x01\x02' * 40)
        sub = tmp_path / 'sub'
        sub.mkdir()
        for ref in ['../victim.bin', str(victim)]:
            mhd = sub / 'x.mhd'
            mhd.write_text('NDims = 2\nDimSize = 4 5\n'
                           'ElementType = MET_SHORT\n'
                           f'ElementDataFile = {ref}\n')
            with pytest.raises(ValueError, match='data file reference'):
                metaimage.read(str(mhd))
            nhdr = sub / 'x.nhdr'
            nhdr.write_text('NRRD0004\ntype: short\ndimension: 2\n'
                            f'sizes: 4 5\ndata file: {ref}\n\n')
            with pytest.raises(ValueError, match='data file reference'):
                nrrd.read(str(nhdr))

    def test_sibling_datafile_still_reads(self, tmp_path):
        """The guard must not break legitimate detached headers."""
        from totalsegmentator2d_tpu.io import nrrd
        arr = (np.arange(20) % 7).astype(np.int16).reshape(4, 5)
        (tmp_path / 'x.raw').write_bytes(arr.tobytes())
        nhdr = tmp_path / 'x.nhdr'
        nhdr.write_text('NRRD0004\ntype: short\ndimension: 2\n'
                        'sizes: 5 4\nencoding: raw\n'
                        'data file: x.raw\n\n')
        out = nrrd.read(str(nhdr))
        np.testing.assert_array_equal(out.array, arr)
