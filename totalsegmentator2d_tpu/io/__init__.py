"""Host-side medical image IO.

Format dispatch for the extensions the TS2D pipeline supports
(reference main.py:25: nrrd / nii / nii.gz / mha / mhd), plus PNG export
for visuals.
"""

from __future__ import annotations

import os

import numpy as np

from .image import MedicalImage, image_from_array, is_label_image, is_label_dtype  # noqa: F401
from . import metaimage, nifti, nrrd

SUPPORTED_EXTENSIONS = ('nrrd', 'nii', 'nii.gz', 'mha', 'mhd')


def _ext(path: str) -> str:
    base = os.path.basename(path).lower()
    if base.endswith('.nii.gz'):
        return 'nii.gz'
    return base.rsplit('.', 1)[-1] if '.' in base else ''


def read_image(path: str) -> MedicalImage:
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    if os.path.isdir(path):
        # a directory input is a DICOM slice series (one case)
        from . import dicom
        return dicom.read_dicom_series(path)
    ext = _ext(path)
    if ext == 'zip':
        # a zipped DICOM slice series (one case): extract with the CRC +
        # traversal + declared-size guards, then read the series inside
        import tempfile
        from . import dicom
        from ..inference.database import extract_zip
        with tempfile.TemporaryDirectory(prefix='ts2d-zip-') as tmp:
            extract_zip(path, tmp, max_total_bytes=8 << 30)
            return dicom.read_dicom_series(dicom.resolve_series_root(tmp))
    from .dicom import DICOM_EXTENSIONS
    if '.' + ext in DICOM_EXTENSIONS:
        from . import dicom
        return dicom.read_dicom_series(path)
    if ext == 'nrrd' or ext == 'nhdr':
        return nrrd.read(path)
    if ext in ('nii', 'nii.gz'):
        return nifti.read(path)
    if ext in ('mha', 'mhd'):
        return metaimage.read(path)
    if ext in ('png', 'bmp', 'tif', 'tiff'):
        # plain 2D raster inputs (the nnU-Net v2 2D extension set,
        # reference wrapper.py:276-277) — unit spacing, identity geometry
        return _read_raster(path)
    raise ValueError(f'Unsupported image format: {path}')


def write_image(img: MedicalImage, path: str, compress: bool = True) -> None:
    ext = _ext(path)
    if ext in ('nrrd', 'nhdr'):
        return nrrd.write(img, path, compress=compress)
    if ext in ('nii', 'nii.gz'):
        return nifti.write(img, path)
    if ext in ('mha', 'mhd'):
        return metaimage.write(img, path, compress=compress)
    if ext == 'png':
        return write_png(img, path)
    raise ValueError(f'Unsupported image format: {path}')


def _read_raster(path: str) -> MedicalImage:
    from PIL import Image as PILImage
    try:
        with PILImage.open(path) as im:
            arr = np.asarray(im)
    except (OSError, SyntaxError,
            PILImage.DecompressionBombError) as ex:
        # PIL raises UnidentifiedImageError/OSError/SyntaxError on broken
        # rasters and DecompressionBombError (a bare Exception subclass)
        # on absurd declared dimensions; surface per the io ValueError
        # contract
        raise ValueError(
            f'Corrupt raster image file ({type(ex).__name__}: {ex})') from ex
    is_vector = arr.ndim == 3
    return MedicalImage(array=arr, is_vector=is_vector)


def write_png(img: MedicalImage, path: str) -> None:
    """Export a 2D uint8 image (scalar or RGB) as PNG."""
    from PIL import Image as PILImage
    arr = np.asarray(img.array)
    if img.dim != 2 and not (img.dim == 3 and 1 in img.size):
        raise ValueError(f'PNG export needs a 2D image, got size {img.size}')
    arr = np.squeeze(arr) if not img.is_vector else arr.reshape(
        [s for s in arr.shape[:-1] if s > 1] + [arr.shape[-1]])
    if arr.dtype != np.uint8:
        arr = np.clip(arr, 0, 255).astype(np.uint8)
    PILImage.fromarray(arr).save(path)
