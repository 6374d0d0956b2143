"""Deterministic synthetic test assets.

Regenerates the four sample inputs the suite and bench exercise, with the
SAME NRRD headers (dtype, sizes, encoding, space/geometry — including the
corner cases each one exists to pin: the size-1 coronal axis of the
projected CT, the true-2D rotated direction matrix, the uchar raw X-ray)
as the reference's bundled assets (reference ``assets/*.nrrd``; headers
transcribed field-for-field), but with phantom CONTENT synthesized here.
This removes the test/bench dependency on the read-only reference mount
(VERDICT r3 item 4): the suite runs green anywhere.

Content is deterministic (fixed seeds) and built to preserve the
properties tests rely on:

* ``sample_s0521`` — int16 torso-like CT (air -1024 background, soft
  tissue, lungs, spine/rib bone) so projections, CT normalization and the
  int16 upload wire behave as on a real scan.
* ``sample_s0332`` — float32 2-channel (MIP, AIP) coronal projection of an
  int-valued phantom volume: the MIP channel is EXACTLY integral (drives
  ``wire_detect``'s int16 wire) while the AIP channel is not.
* ``sample_s0616`` — float64 2-channel true-2D image (space dimension 2)
  with the rotated direction matrix.
* ``sample_chexpert`` — uint8 320x320 X-ray-like image, raw encoding.

Files are written once into ``tests/assets/`` (gitignored) and reused.
"""

import gzip
import os
import threading

import numpy as np

ASSET_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), 'assets')

_LOCK = threading.Lock()

_HEADERS = {
    'sample_s0521.nrrd': """\
NRRD0004
# Complete NRRD file format specification at:
# http://teem.sourceforge.net/nrrd/format.html
type: short
dimension: 3
space: left-posterior-superior
sizes: 53 120 133
space directions: (-1.5,0,0) (0,-1.5,0) (0,0,1.5)
kinds: domain domain domain
endian: little
encoding: gzip
space origin: (38.487998962402344,-30.97625732421875,-18.341812133789062)
ITK_InputFilterName:=NrrdImageIO
""",
    'sample_s0332.nrrd': """\
NRRD0004
# Complete NRRD file format specification at:
# http://teem.sourceforge.net/nrrd/format.html
type: float
dimension: 4
space: left-posterior-superior
sizes: 2 269 1 505
space directions: none (-1.5,0,0) (0,-403.5,0) (0,0,-1.5)
kinds: vector domain domain domain
endian: little
encoding: gzip
space origin: (205.1064453125,52.1064453125,836)
ITK_InputFilterName:=NrrdImageIO
""",
    'sample_s0616.nrrd': """\
NRRD0004
# Complete NRRD file format specification at:
# http://teem.sourceforge.net/nrrd/format.html
type: double
dimension: 3
space dimension: 2
sizes: 2 337 644
space directions: none (-1.4971531808440928,-0.077440443302518328) (-0.077451893881387873,1.4979973962715605)
kinds: vector domain domain
endian: little
encoding: gzip
space origin: (216.50281455848636,277.97050451355085)
""",
    'sample_chexpert.nrrd': """\
NRRD0004
# Complete NRRD file format specification at:
# http://teem.sourceforge.net/nrrd/format.html
type: unsigned char
dimension: 2
space dimension: 2
sizes: 320 320
space directions: (1.25,0) (0,1.25)
kinds: domain domain
encoding: raw
space origin: (0,0)
""",
}


def _write_nrrd(path: str, name: str, data: np.ndarray) -> None:
    """Write ``data`` (C-order; LAST numpy axis = FIRST/fastest NRRD size)
    under the transcribed header. Data must already match the header's
    dtype and (reversed) sizes."""
    header = _HEADERS[name]
    sizes = [int(s) for line in header.splitlines() if line.startswith('sizes:')
             for s in line.split(':')[1].split()]
    assert tuple(data.shape) == tuple(reversed(sizes)), (data.shape, sizes)
    payload = np.ascontiguousarray(data).tobytes()
    if 'encoding: gzip' in header:
        payload = gzip.compress(payload, compresslevel=6)
    tmp = path + '.part'
    with open(tmp, 'wb') as f:
        f.write(header.encode('ascii'))
        f.write(b'\n')
        f.write(payload)
    os.replace(tmp, path)


def _torso_volume(shape_zyx, seed) -> np.ndarray:
    """Torso-like int16 CT phantom: air background, elliptic soft-tissue
    body tapering along z, two low-density lungs, a bony spine column and
    rib arcs, plus mild texture noise.

    bench.make_realistic_volume is intentionally a SEPARATE recipe — it
    is calibration-coupled to the bench seg-head bias (probe19); realism
    changes here must not move the benchmark workload."""
    z, y, x = shape_zyx
    rng = np.random.default_rng(seed)
    zz, yy, xx = np.meshgrid(np.arange(z), np.arange(y), np.arange(x),
                             indexing='ij')
    zc = (zz / max(z - 1, 1)).astype(np.float32)
    yn = (yy - y * 0.52) / (y * 0.38 * (0.85 + 0.3 * np.sin(zc * np.pi)))
    xn = (xx - x * 0.50) / (x * 0.42 * (0.85 + 0.3 * np.sin(zc * np.pi)))
    body = (yn ** 2 + xn ** 2) <= 1.0
    vol = np.full(shape_zyx, -1024.0, np.float32)
    soft = 35 + 25 * np.sin(zc * 7.0) + rng.normal(0, 12, shape_zyx)
    vol[body] = soft[body]
    # lungs: two air-ish ellipsoids in the upper half of z
    for side in (-1, 1):
        ln = (((zz - z * 0.30) / (z * 0.22)) ** 2
              + ((yy - y * 0.42) / (y * 0.20)) ** 2
              + ((xx - x * (0.5 + side * 0.18)) / (x * 0.16)) ** 2)
        lung = (ln <= 1.0) & body
        vol[lung] = -820 + rng.normal(0, 25, shape_zyx)[lung]
    # spine: posterior bone column with vertebral density modulation
    sp = (((yy - y * 0.78) / (y * 0.07)) ** 2
          + ((xx - x * 0.5) / (x * 0.10)) ** 2)
    spine = (sp <= 1.0) & body
    vert = 650 + 350 * (np.sin(zc * z / 3.4) > 0)
    vol[spine] = (vert + rng.normal(0, 40, shape_zyx))[spine]
    # ribs: thin high-density shell bands on the body surface
    shell = (yn ** 2 + xn ** 2 >= 0.82) & body & (np.sin(zc * z / 2.1) > 0.3)
    vol[shell] = 420 + rng.normal(0, 60, shape_zyx)[shell]
    return np.clip(np.round(vol), -1024, 3071).astype(np.int16)


def _build_s0521() -> np.ndarray:
    # NRRD sizes 53 120 133 -> numpy (z=133, y=120, x=53) int16
    return _torso_volume((133, 120, 53), seed=521)


def _build_s0332() -> np.ndarray:
    # float32 (MIP, AIP) coronal projection pair of an int-valued phantom:
    # numpy (z=505, y=1, x=269, c=2); MIP stays exactly integral.
    vol = _torso_volume((505, 64, 269), seed=332).astype(np.float32)
    mip = vol.max(axis=1)
    aip = vol.mean(axis=1, dtype=np.float64).astype(np.float32)
    out = np.stack([mip, aip], axis=-1)[:, None, :, :]
    return np.ascontiguousarray(out, np.float32)


def _build_s0616() -> np.ndarray:
    # float64 true-2D projection pair: numpy (y=644, x=337, c=2)
    vol = _torso_volume((644, 48, 337), seed=616).astype(np.float64)
    mip = vol.max(axis=1)
    aip = vol.mean(axis=1)
    return np.ascontiguousarray(np.stack([mip, aip], axis=-1))


def _build_chexpert() -> np.ndarray:
    # uint8 320x320 chest-X-ray-like: bright mediastinum column, darker
    # lung fields, vignetting, film-grain noise
    rng = np.random.default_rng(320)
    y, x = np.meshgrid(np.arange(320), np.arange(320), indexing='ij')
    yn, xn = y / 319.0, x / 319.0
    img = 90 + 110 * np.exp(-((xn - 0.5) / 0.13) ** 2)  # spine/mediastinum
    for side in (-1, 1):
        ln = (((yn - 0.45) / 0.30) ** 2
              + ((xn - (0.5 + side * 0.22)) / 0.16) ** 2)
        img -= 70 * np.exp(-ln)
    img += 25 * np.sin(yn * 40) * np.exp(-((xn - 0.5) / 0.35) ** 2)  # ribs
    img *= 1.0 - 0.35 * ((yn - 0.5) ** 2 + (xn - 0.5) ** 2)
    img += rng.normal(0, 6, (320, 320))
    return np.clip(np.round(img), 0, 255).astype(np.uint8)


_BUILDERS = {
    'sample_s0521.nrrd': _build_s0521,
    'sample_s0332.nrrd': _build_s0332,
    'sample_s0616.nrrd': _build_s0616,
    'sample_chexpert.nrrd': _build_chexpert,
}


def ensure_assets(names=None) -> str:
    """Generate any missing synthetic assets; return the asset directory."""
    names = list(_BUILDERS) if names is None else list(names)
    with _LOCK:
        os.makedirs(ASSET_DIR, exist_ok=True)
        for name in names:
            path = os.path.join(ASSET_DIR, name)
            if not os.path.exists(path):
                _write_nrrd(path, name, _BUILDERS[name]())
    return ASSET_DIR


def asset_path(name: str) -> str:
    if name not in _BUILDERS:
        raise KeyError(f'unknown test asset {name!r}; available: '
                       f'{sorted(_BUILDERS)}')
    ensure_assets([name])
    return os.path.join(ASSET_DIR, name)


if __name__ == '__main__':
    print(ensure_assets())
