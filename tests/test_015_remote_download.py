"""Remote model download path, exercised fully offline: a localhost HTTP
server serves a real model zip, URLDataBase downloads + extracts it, and the
zoo/TS2D stack predicts with it (the reference covers this against live
Zenodo in test_010_database; here the network is local)."""

import http.server
import os
import threading
import zipfile

import numpy as np
import pytest

from tests.model_fixtures import build_model_dir
from totalsegmentator2d_tpu.inference import URLDataBase, Zoo


@pytest.fixture(scope='module')
def served_registry(tmp_path_factory):
    """Build a model dir, zip it, serve it over localhost."""
    src = tmp_path_factory.mktemp('src')
    webroot = tmp_path_factory.mktemp('web')
    mid = build_model_dir(str(src), model='ts2d-v9-dl', group='cardiac',
                          labels=('heart',), patch=(64, 64))
    zip_path = webroot / f'{mid}.zip'
    with zipfile.ZipFile(zip_path, 'w') as zf:
        for root, _, files in os.walk(src):
            for fn in files:
                fp = os.path.join(root, fn)
                zf.write(fp, os.path.relpath(fp, src))

    handler = lambda *a, **kw: http.server.SimpleHTTPRequestHandler(
        *a, directory=str(webroot), **kw)
    httpd = http.server.ThreadingHTTPServer(('127.0.0.1', 0), handler)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    urls = {'ts2d-v9-dl': {'r001': {
        'cardiac': f'http://127.0.0.1:{port}/{mid}.zip'}}}
    yield urls, mid
    httpd.shutdown()


class TestRemoteDownload:
    def test_urldatabase_copy_downloads_and_extracts(self, served_registry,
                                                     tmp_path):
        urls, mid = served_registry
        remote = URLDataBase(urls)
        assert remote.has(key=mid)
        assert remote.latest(key=mid) == 1
        remote.copy(str(tmp_path), key=mid)
        assert (tmp_path / mid / 'r001' / 'model.json').exists()

    def test_zoo_download_on_miss_and_predict(self, served_registry, tmp_path):
        from totalsegmentator2d_tpu.io import MedicalImage
        urls, mid = served_registry
        zoo = Zoo(remote=URLDataBase(urls), local=str(tmp_path / 'local'))
        assert not zoo.local.has(key=mid)
        model = zoo.load(mid)          # triggers download-on-miss
        assert zoo.local.has(key=mid)  # cached locally now
        rng = np.random.default_rng(0)
        img = MedicalImage(
            array=(rng.standard_normal((70, 60, 2)) + 2).astype(np.float32),
            spacing=(1.5, 1.5), is_vector=True)
        seg = model.apply(img)
        assert seg.meta['Segment0_Name'] == 'heart'
        # second load is served from the local cache (no remote dependency)
        zoo2 = Zoo(remote=False, local=str(tmp_path / 'local'))
        assert zoo2.load(mid).labels == {1: 'heart'}

    @pytest.mark.slow
    def test_download_failure_raises(self, tmp_path):
        urls = {'ts2d-v9-bad': {'r001': {
            'cardiac': 'http://127.0.0.1:1/nope.zip'}}}
        zoo = Zoo(remote=URLDataBase(urls), local=str(tmp_path))
        with pytest.raises(Exception):
            zoo.access('ts2d-v9-bad_cardiac')


class TestDownloadHardening:
    def test_retries_transient_failures(self, tmp_path, monkeypatch):
        """The first two attempts fail, the third succeeds."""
        from totalsegmentator2d_tpu.inference import database as db
        monkeypatch.setattr('time.sleep', lambda s: None)
        calls = {'n': 0}
        payload = b'hello-model-zip'

        class FakeResponse:
            headers = {'Content-Length': str(len(payload))}

            def __enter__(self):
                return self

            def __exit__(self, *a):
                return False

            def raise_for_status(self):
                pass

            def iter_content(self, chunk_size):
                calls['n'] += 1
                if calls['n'] < 3:
                    yield payload[:4]  # truncated -> size check fails
                else:
                    yield payload

        import requests
        monkeypatch.setattr(requests, 'get',
                            lambda *a, **kw: FakeResponse())
        dest = tmp_path / 'model.zip'
        db._download('http://example/model.zip', str(dest))
        assert calls['n'] == 3
        assert dest.read_bytes() == payload

    def test_gives_up_after_attempts(self, tmp_path, monkeypatch):
        from totalsegmentator2d_tpu.inference import database as db
        monkeypatch.setattr('time.sleep', lambda s: None)
        import requests

        def boom(*a, **kw):
            raise IOError('connection reset')

        monkeypatch.setattr(requests, 'get', boom)
        with pytest.raises(RuntimeError, match='after 3 attempts'):
            db._download('http://example/model.zip', str(tmp_path / 'x.zip'))

    def test_drive_url_recognition(self):
        """Every Drive URL shape gdown's fuzzy mode tolerates maps to its
        file id; plain HTTPS does not."""
        from totalsegmentator2d_tpu.inference.database import drive_file_id
        fid = '1A2b-C3d_E4f'
        assert drive_file_id(
            f'https://drive.google.com/file/d/{fid}/view?usp=sharing') == fid
        assert drive_file_id(
            f'https://drive.google.com/open?id={fid}') == fid
        assert drive_file_id(
            f'https://drive.google.com/uc?export=download&id={fid}') == fid
        assert drive_file_id(
            f'https://drive.usercontent.google.com/download?id={fid}'
            f'&export=download') == fid
        assert drive_file_id('https://zenodo.org/record/1/files/m.zip') is None

    def test_drive_confirm_interstitial(self, tmp_path, monkeypatch):
        """A Drive large-file download first answers with the virus-scan
        HTML page; the downloader must follow the hidden confirm form (with
        session cookies) and stream the second response."""
        from totalsegmentator2d_tpu.inference import database as db
        payload = b'drive-model-zip-bytes'
        seen = []

        class FakeResponse:
            def __init__(self, ctype, body):
                self.headers = {'Content-Type': ctype,
                                'Content-Length': str(len(body))}
                self._body = body

            def __enter__(self):
                return self

            def __exit__(self, *a):
                return False

            def raise_for_status(self):
                pass

            @property
            def text(self):
                return self._body.decode()

            def iter_content(self, chunk_size):
                yield self._body

        html = (b'<html><form id="download-form" '
                b'action="https://drive.usercontent.google.com/download" '
                b'method="get">'
                b'<input type="hidden" name="id" value="FILEID123">'
                b'<input type="hidden" name="export" value="download">'
                b'<input type="hidden" name="confirm" value="t">'
                b'<input type="hidden" name="uuid" value="u-u-i-d">'
                b'</form></html>')

        class FakeSession:
            def __enter__(self):
                return self

            def __exit__(self, *a):
                return False

            def get(self, url, params=None, **kw):
                seen.append((url, params))
                if 'uc?export=download' in url:
                    return FakeResponse('text/html; charset=utf-8', html)
                assert params['confirm'] == 't' and params['uuid'] == 'u-u-i-d'
                return FakeResponse('application/zip', payload)

        import requests
        monkeypatch.setattr(requests, 'Session', FakeSession)
        dest = tmp_path / 'drive.zip'
        db._download('https://drive.google.com/file/d/FILEID123/view',
                     str(dest))
        assert dest.read_bytes() == payload
        assert len(seen) == 2

    def test_zip_traversal_rejected(self, tmp_path):
        """A zip member with '..' must not extract outside the destination."""
        from totalsegmentator2d_tpu.inference.database import extract_zip
        zp = tmp_path / 'evil.zip'
        with zipfile.ZipFile(zp, 'w') as zf:
            zf.writestr('../pwned.txt', 'outside')
        dest = tmp_path / 'dest'
        dest.mkdir()
        with pytest.raises(RuntimeError, match='escapes'):
            extract_zip(str(zp), str(dest))
        assert not (tmp_path / 'pwned.txt').exists()

    def test_corrupt_zip_rejected(self, tmp_path):
        from totalsegmentator2d_tpu.inference.database import extract_zip
        zp = tmp_path / 'corrupt.zip'
        with zipfile.ZipFile(zp, 'w', zipfile.ZIP_DEFLATED) as zf:
            zf.writestr('model.json', '{"a": 1}' * 100)
        raw = bytearray(zp.read_bytes())
        raw[40] ^= 0xFF  # flip a payload byte, keep the directory intact
        zp.write_bytes(raw)
        with pytest.raises(Exception):
            extract_zip(str(zp), str(tmp_path / 'dest2'))


class TestPackZip:
    """FileDataBase.pack_zip: the inverse of extract_zip — the share loop
    train -> pack -> serve over HTTP -> download-on-miss -> predict."""

    def test_pack_roundtrip_through_urldatabase(self, tmp_path):
        import http.server
        import threading
        from totalsegmentator2d_tpu.inference import FileDataBase

        src = tmp_path / 'src'
        mid = build_model_dir(str(src), model='ts2d-v9-pk', group='ribs',
                              labels=('rib1', 'rib2'), patch=(64, 64))
        webroot = tmp_path / 'web'
        webroot.mkdir()
        out = FileDataBase(str(src)).pack_zip(mid, str(webroot / f'{mid}.zip'))
        assert out.endswith(f'{mid}.zip')

        handler = lambda *a, **kw: http.server.SimpleHTTPRequestHandler(
            *a, directory=str(webroot), **kw)
        httpd = http.server.ThreadingHTTPServer(('127.0.0.1', 0), handler)
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            port = httpd.server_address[1]
            urls = {'ts2d-v9-pk': {'r001': {
                'ribs': f'http://127.0.0.1:{port}/{mid}.zip'}}}
            zoo = Zoo(remote=URLDataBase(urls), local=str(tmp_path / 'local'))
            model = zoo.load(mid)  # download-on-miss of OUR packed zip
            assert model.labels == {1: 'rib1', 2: 'rib2'}
            rng = np.random.default_rng(1)
            from totalsegmentator2d_tpu.io import MedicalImage
            img = MedicalImage(
                array=(rng.standard_normal((70, 60, 2)) + 2).astype(
                    np.float32),
                spacing=(1.5, 1.5), is_vector=True)
            seg = model.apply(img)
            assert seg.ncomponents == 2
        finally:
            httpd.shutdown()

    def test_pack_missing_model_raises(self, tmp_path):
        from totalsegmentator2d_tpu.inference import FileDataBase
        with pytest.raises(LookupError):
            FileDataBase(str(tmp_path)).pack_zip('nope_x',
                                                 str(tmp_path / 'x.zip'))
