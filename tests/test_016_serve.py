"""HTTP serving endpoint."""

import json
import os
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from tests.conftest import asset_path
from tests.model_fixtures import build_group_set
from totalsegmentator2d_tpu.api import TS2D
from totalsegmentator2d_tpu.serve import TS2DServer


@pytest.fixture(scope='module')
def server(tmp_path_factory):
    # batching=False: this fixture backs tests that assert byte-identical
    # responses across concurrent requests — a property only the solo
    # program guarantees (the batched program flips borderline sigmoid
    # pixels; docs/performance.md). The batched contract is asserted
    # separately with a tolerance in test_concurrent_predicts_batched.
    root = str(tmp_path_factory.mktemp('zoo'))
    build_group_set(root, model='ts2d-v9-test', groups=('cardiac', 'ribs'))
    with TS2D(key='ts2d-v9-test', use_remote=False, local=root,
              batching=False) as tool:
        with TS2DServer(tool, port=0) as srv:
            yield srv


def _get(srv, path):
    with urllib.request.urlopen(f'http://127.0.0.1:{srv.port}{path}') as r:
        return r.status, r.read(), dict(r.headers)


class TestServer:
    def test_health(self, server):
        status, body, _ = _get(server, '/health')
        data = json.loads(body)
        assert status == 200
        assert data['status'] == 'ok'
        assert len(data['models']) == 2

    def test_labels(self, server):
        status, body, _ = _get(server, '/labels')
        data = json.loads(body)
        assert 'ts2d-v9-test_cardiac' in data
        assert data['ts2d-v9-test_cardiac']['1'] == 'heart'

    def test_predict_roundtrip(self, server, tmp_path):
        payload = open(asset_path('sample_s0332.nrrd'), 'rb').read()
        req = urllib.request.Request(
            f'http://127.0.0.1:{server.port}/predict?format=nrrd',
            data=payload, method='POST')
        with urllib.request.urlopen(req) as r:
            assert r.status == 200
            labels = json.loads(r.headers['X-TS2D-Labels'])
            body = r.read()
        assert 'heart' in labels and 'rib-left-1' in labels
        out = tmp_path / 'seg.nrrd'
        out.write_bytes(body)
        from totalsegmentator2d_tpu.io import read_image
        seg = read_image(str(out))
        assert seg.ncomponents == 5

    def test_predict_zipped_dicom_series(self, server, tmp_path):
        """input_format=zip: a zipped DICOM slice series (wrapped in a
        subdirectory, as archives usually are) predicts like the same
        volume posted as NRRD."""
        import io as _io
        import sys
        import zipfile
        sys.path.insert(0, os.path.dirname(__file__))
        from test_017_dicom import write_slice
        from totalsegmentator2d_tpu.io import read_image
        vol = read_image(asset_path('sample_s0521.nrrd'))
        arr = np.asarray(vol.array)
        series = tmp_path / 'inner' / 'series'
        series.mkdir(parents=True)
        for i in range(arr.shape[0]):
            write_slice(str(series / f's{i:04d}.dcm'), arr[i],
                        position=(0.0, 0.0, 1.5 * i), instance=i + 1,
                        pixel_spacing=(1.5, 1.5))
        buf = _io.BytesIO()
        with zipfile.ZipFile(buf, 'w') as zf:
            for f in sorted(series.iterdir()):
                zf.write(f, f'inner/series/{f.name}')
        req = urllib.request.Request(
            f'http://127.0.0.1:{server.port}/predict'
            f'?input_format=zip&format=nrrd',
            data=buf.getvalue(), method='POST')
        with urllib.request.urlopen(req) as r:
            assert r.status == 200
            labels = json.loads(r.headers['X-TS2D-Labels'])
            body = r.read()
        assert 'heart' in labels
        out = tmp_path / 'seg.nrrd'
        out.write_bytes(body)
        seg = read_image(str(out))
        assert seg.ncomponents == 5

    def test_predict_finder_style_zip(self, server, tmp_path):
        """macOS Finder archives add __MACOSX/ and ._* AppleDouble
        entries next to the real series — the descend logic must skip
        the junk instead of rejecting the upload."""
        import io as _io
        import sys
        import zipfile
        sys.path.insert(0, os.path.dirname(__file__))
        from test_017_dicom import write_slice
        arr = np.zeros((3, 16, 16), np.int16)
        series = tmp_path / 'fseries'
        series.mkdir()
        for i in range(3):
            write_slice(str(series / f's{i}.dcm'), arr[i],
                        position=(0.0, 0.0, 1.5 * i), instance=i + 1)
        buf = _io.BytesIO()
        with zipfile.ZipFile(buf, 'w') as zf:
            zf.writestr('__MACOSX/series/._s0.dcm', b'apple double junk')
            for f in sorted(series.iterdir()):
                zf.write(f, f'series/{f.name}')
                zf.writestr(f'series/._{f.name}', b'apple double junk')
        req = urllib.request.Request(
            f'http://127.0.0.1:{server.port}/predict?input_format=zip',
            data=buf.getvalue(), method='POST')
        with urllib.request.urlopen(req) as r:
            assert r.status == 200

    def test_predict_zip_without_dicom_rejected(self, server):
        import io as _io
        import zipfile
        buf = _io.BytesIO()
        with zipfile.ZipFile(buf, 'w') as zf:
            zf.writestr('readme.txt', 'not a series')
        req = urllib.request.Request(
            f'http://127.0.0.1:{server.port}/predict?input_format=zip',
            data=buf.getvalue(), method='POST')
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            urllib.request.urlopen(req)
        assert exc_info.value.code == 400

    def test_predict_bad_payload(self, server):
        req = urllib.request.Request(
            f'http://127.0.0.1:{server.port}/predict',
            data=b'not an image', method='POST')
        try:
            urllib.request.urlopen(req)
            assert False, 'expected HTTPError'
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert 'error' in json.loads(e.read())

    def test_unknown_route(self, server):
        try:
            _get(server, '/nope')
            assert False
        except urllib.error.HTTPError as e:
            assert e.code == 404

    def test_bad_output_format(self, server):
        payload = open(asset_path('sample_s0332.nrrd'), 'rb').read()
        req = urllib.request.Request(
            f'http://127.0.0.1:{server.port}/predict?format=exe',
            data=payload, method='POST')
        try:
            urllib.request.urlopen(req)
            assert False
        except urllib.error.HTTPError as e:
            assert e.code == 400

    def test_input_format_traversal_rejected(self, server, tmp_path):
        """input_format is interpolated into a filesystem path; traversal
        values must be rejected, not written to disk."""
        import urllib.parse
        target = tmp_path / 'pwned.txt'
        evil = urllib.parse.quote(f'/../../../..{target}', safe='')
        req = urllib.request.Request(
            f'http://127.0.0.1:{server.port}/predict?input_format={evil}',
            data=b'owned', method='POST')
        try:
            urllib.request.urlopen(req)
            assert False, 'expected HTTPError'
        except urllib.error.HTTPError as e:
            assert e.code == 400
        assert not target.exists()

    def test_oversized_body_rejected(self, tmp_path_factory):
        """A Content-Length over the cap gets 413 before the body is read:
        server memory stays bounded no matter what a client announces."""
        import http.client

        root = str(tmp_path_factory.mktemp('zoo-cap'))
        build_group_set(root, model='ts2d-v9-test', groups=('cardiac',))
        with TS2D(key='ts2d-v9-test', use_remote=False, local=root,
                  batching=False) as tool:
            with TS2DServer(tool, port=0, max_body_bytes=1024) as srv:
                conn = http.client.HTTPConnection('127.0.0.1', srv.port)
                try:
                    # announce 10 MB but send nothing: a pre-read reject
                    # answers immediately; reading-first would block
                    conn.putrequest('POST', '/predict')
                    conn.putheader('Content-Length', str(10 * 1024 * 1024))
                    conn.endheaders()
                    resp = conn.getresponse()
                    assert resp.status == 413
                    assert 'exceeds limit' in json.loads(resp.read())['error']
                finally:
                    conn.close()
                # an in-limit request on a fresh connection still works
                status, body, _ = _get(srv, '/health')
                assert status == 200

    @pytest.mark.slow
    def test_concurrent_predicts(self, server):
        """No host-side serialization: concurrent requests must all succeed
        and — with batching OFF (the fixture pins it) — return the same
        segmentation bytes as a lone request. Bitwise equality is only the
        solo program's contract; the batched path is asserted with its
        documented tolerance in test_concurrent_predicts_batched."""
        import concurrent.futures as cf

        payload = open(asset_path('sample_s0332.nrrd'), 'rb').read()

        def post():
            req = urllib.request.Request(
                f'http://127.0.0.1:{server.port}/predict?format=nrrd',
                data=payload, method='POST')
            with urllib.request.urlopen(req) as r:
                return r.status, r.read()

        solo = post()[1]
        with cf.ThreadPoolExecutor(max_workers=4) as pool:
            results = list(pool.map(lambda _: post(), range(4)))
        assert all(status == 200 for status, _ in results)
        assert all(body == solo for _, body in results)

    @pytest.mark.slow
    def test_concurrent_predicts_batched(self, tmp_path_factory, tmp_path):
        """With micro-batching ON (the production default) concurrent
        requests may coalesce into a batched program whose conv scheduling
        flips borderline sigmoid pixels — the documented bound is <=0.1% of
        voxels vs the solo program (docs/performance.md). Assert that
        tolerance, not bitwise equality."""
        import concurrent.futures as cf
        from totalsegmentator2d_tpu.io import read_image

        root = str(tmp_path_factory.mktemp('zoo-batched'))
        build_group_set(root, model='ts2d-v9-test', groups=('cardiac',))
        payload = open(asset_path('sample_s0332.nrrd'), 'rb').read()
        with TS2D(key='ts2d-v9-test', use_remote=False, local=root,
                  batching=True) as tool:
            with TS2DServer(tool, port=0) as srv:
                def post(i):
                    req = urllib.request.Request(
                        f'http://127.0.0.1:{srv.port}/predict?format=nrrd',
                        data=payload, method='POST')
                    with urllib.request.urlopen(req) as r:
                        return r.status, r.read()

                solo_status, solo_body = post(0)
                assert solo_status == 200
                with cf.ThreadPoolExecutor(max_workers=4) as pool:
                    results = list(pool.map(post, range(4)))
                # with batching on, /metrics exposes dispatch occupancy
                metrics = json.loads(_get(srv, '/metrics')[1])
                assert metrics['batch_scans'] == 5  # 1 solo + 4 concurrent
                assert metrics['batch_programs'] >= 1
                assert sum(metrics['batch_occupancy']) == \
                    metrics['batch_programs']
        assert all(status == 200 for status, _ in results)

        def to_seg(body, name):
            p = tmp_path / name
            p.write_bytes(body)
            img = read_image(str(p))
            return np.asarray(img.array)

        solo = to_seg(solo_body, 'solo.nrrd')
        for i, (_, body) in enumerate(results):
            seg = to_seg(body, f'b{i}.nrrd')
            assert seg.shape == solo.shape
            # <=0.1% voxel flips between batched and solo programs
            assert (seg != solo).mean() <= 1e-3


class TestMetrics:
    def test_metrics_counts_and_latency(self, server):
        # counters reflect completed predicts; reset is not exposed, so
        # read deltas around one request
        before = json.loads(_get(server, '/metrics')[1])
        payload = open(asset_path('sample_s0332.nrrd'), 'rb').read()
        req = urllib.request.Request(
            f'http://127.0.0.1:{server.port}/predict?format=nrrd',
            data=payload, method='POST')
        with urllib.request.urlopen(req) as r:
            assert r.status == 200
        after = json.loads(_get(server, '/metrics')[1])
        assert after['predict_requests'] == before['predict_requests'] + 1
        assert after['predict_errors'] == before['predict_errors']
        assert after['predict_seconds_total'] > before['predict_seconds_total']
        assert after['predict_seconds_mean'] > 0
        assert after['predict_seconds_max'] > 0

    def test_metrics_counts_errors(self, server):
        before = json.loads(_get(server, '/metrics')[1])
        req = urllib.request.Request(
            f'http://127.0.0.1:{server.port}/predict',
            data=b'not an image', method='POST')
        try:
            urllib.request.urlopen(req)
        except urllib.error.HTTPError:
            pass
        after = json.loads(_get(server, '/metrics')[1])
        assert after['predict_errors'] == before['predict_errors'] + 1


class TestProductionKnobs:
    """Round-4 serving polish: auth token, non-local bind warning,
    per-request timeout, shutdown drain, zip per-member cap."""

    def test_auth_token_required(self, server):
        srv = TS2DServer(server.tool, port=0, auth_token='sekret')
        srv.start()
        try:
            base = f'http://127.0.0.1:{srv.port}'
            # /health stays open (load-balancer probes)
            with urllib.request.urlopen(f'{base}/health') as r:
                assert r.status == 200
            for hdrs in ({}, {'Authorization': 'Bearer wrong'}):
                req = urllib.request.Request(f'{base}/labels', headers=hdrs)
                with pytest.raises(urllib.error.HTTPError) as ei:
                    urllib.request.urlopen(req)
                assert ei.value.code == 401
                assert ei.value.headers['WWW-Authenticate'] == 'Bearer'
            req = urllib.request.Request(
                f'{base}/labels',
                headers={'Authorization': 'Bearer sekret'})
            with urllib.request.urlopen(req) as r:
                assert r.status == 200
            # POST path is guarded too: junk body with the right token gets
            # a 400 (parse failure), not a 401
            req = urllib.request.Request(
                f'{base}/predict', data=b'junk', method='POST',
                headers={'Authorization': 'Bearer sekret'})
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(req)
            assert ei.value.code == 400
        finally:
            srv.stop()

    def test_auth_non_ascii_header_gets_401(self, server):
        # hmac.compare_digest raises TypeError on non-ASCII str: a garbage
        # header byte must answer 401, not kill the handler thread
        srv = TS2DServer(server.tool, port=0, auth_token='sekret')
        srv.start()
        try:
            import http.client
            conn = http.client.HTTPConnection('127.0.0.1', srv.port,
                                              timeout=5)
            conn.request('GET', '/labels',
                         headers={'Authorization': b'Bearer caf\xe9'})
            resp = conn.getresponse()
            assert resp.status == 401
            conn.close()
        finally:
            srv.stop()

    def test_auth_non_ascii_token_authenticates(self, server):
        # http.server hands headers to the app latin-1-decoded; the
        # compare must recover the RAW WIRE BYTES, so a client sending
        # the UTF-8 bytes of a non-ASCII token must authenticate
        # (re-encoding the supplied header as UTF-8 double-encodes and
        # would 401 every request for such a token)
        srv = TS2DServer(server.tool, port=0, auth_token='tökn')
        srv.start()
        try:
            import http.client
            conn = http.client.HTTPConnection('127.0.0.1', srv.port,
                                              timeout=5)
            conn.request('GET', '/labels', headers={
                'Authorization': 'Bearer tökn'.encode('utf-8')})
            resp = conn.getresponse()
            assert resp.status == 200
            resp.read()
            conn.close()
        finally:
            srv.stop()

    def test_stop_closes_listening_socket(self, server):
        # shutdown() alone leaves the listening socket open: clients
        # would handshake into the accept backlog and hang forever
        import socket
        srv = TS2DServer(server.tool, port=0)
        srv.start()
        port = srv.port
        assert srv.stop()
        with pytest.raises(OSError):
            socket.create_connection(('127.0.0.1', port), timeout=2)

    @pytest.mark.slow
    def test_request_timeout_budget_starts_at_execution(self, server):
        # a burst deeper than the worker pool must not 504 requests whose
        # own predict fits the budget: the clock starts at execution, and
        # a request still QUEUED past a full budget 504s honestly
        import time
        from concurrent.futures import ThreadPoolExecutor
        srv = TS2DServer(server.tool, port=0, request_timeout=1.0)
        srv._handle_predict = lambda body, query: (
            time.sleep(0.4),
            (200, 'application/json', b'{}'))[1]
        srv.start()
        try:
            with srv._active_cv:  # shrink the pool: 2 queued behind 1
                srv._pool = ThreadPoolExecutor(1)
            statuses = []

            def post():
                req = urllib.request.Request(
                    f'http://127.0.0.1:{srv.port}/predict',
                    data=b'x', method='POST')
                try:
                    with urllib.request.urlopen(req) as r:
                        statuses.append(r.status)
                except urllib.error.HTTPError as ex:
                    statuses.append(ex.code)

            threads = [threading.Thread(target=post) for _ in range(3)]
            for t in threads:
                t.start()
                time.sleep(0.05)  # deterministic queue order
            for t in threads:
                t.join(10.0)
            # 3 x 0.4 s through a 1-wide pool: the third waits ~0.8 s in
            # queue — over budget under the old queue-inclusive clock,
            # fine under the execution clock
            assert statuses == [200, 200, 200], statuses
            srv._handle_predict = lambda body, query: (
                time.sleep(3.0),
                (200, 'application/json', b'{}'))[1]
            threads = [threading.Thread(target=post) for _ in range(2)]
            for t in threads:
                t.start()
                time.sleep(0.05)
            for t in threads:
                t.join(10.0)
            # first executes past budget, second never leaves the queue
            assert statuses[3:] == [504, 504], statuses
        finally:
            srv.stop(drain_timeout=5.0)

    def test_nonlocal_bind_without_token_warns(self, server, capsys):
        srv = TS2DServer(server.tool, host='0.0.0.0', port=0)
        srv.start()
        srv.stop()
        err = capsys.readouterr().err
        assert 'no auth token' in err and 'non-loopback' in err
        srv2 = TS2DServer(server.tool, host='0.0.0.0', port=0,
                          auth_token='x')
        srv2.start()
        srv2.stop()
        assert 'no auth token' not in capsys.readouterr().err

    def test_request_timeout_times_out(self, server):
        import time
        srv = TS2DServer(server.tool, port=0, request_timeout=0.2)
        srv._handle_predict = lambda body, query: (
            time.sleep(1.0),
            (200, 'application/json', b'{}'))[1]
        srv.start()
        try:
            req = urllib.request.Request(
                f'http://127.0.0.1:{srv.port}/predict',
                data=b'x', method='POST')
            t0 = time.perf_counter()
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(req)
            assert ei.value.code == 504
            assert time.perf_counter() - t0 < 0.9  # answered before the work
            m = json.loads(_get(srv, '/metrics')[1])
            assert m['predict_timeouts'] == 1
        finally:
            assert srv.stop()  # drain waits for the orphaned predict

    def test_shutdown_drains_inflight_predicts(self, server):
        import threading
        import time
        srv = TS2DServer(server.tool, port=0)
        release = threading.Event()
        done = []

        def slow(body, query):
            release.wait(5.0)
            done.append(True)
            return 200, 'application/json', b'{}'

        srv._handle_predict = slow
        srv.start()
        port = srv.port
        resp = {}

        def post():
            req = urllib.request.Request(
                f'http://127.0.0.1:{port}/predict', data=b'x',
                method='POST')
            with urllib.request.urlopen(req) as r:
                resp['status'] = r.status

        t = threading.Thread(target=post)
        t.start()
        deadline = time.monotonic() + 5.0
        while not srv._active and time.monotonic() < deadline:
            time.sleep(0.01)
        assert srv._active == 1
        stopper = {}

        def stop():
            stopper['drained'] = srv.stop()

        ts = threading.Thread(target=stop)
        ts.start()
        time.sleep(0.1)
        assert ts.is_alive()  # stop() blocks on the in-flight predict
        release.set()
        ts.join(5.0)
        t.join(5.0)
        assert stopper['drained'] is True
        assert done == [True]
        assert resp['status'] == 200

    def test_draining_rejects_new_predicts(self, server):
        srv = TS2DServer(server.tool, port=0)
        srv.start()
        try:
            with srv._active_cv:
                srv._draining = True
            req = urllib.request.Request(
                f'http://127.0.0.1:{srv.port}/predict', data=b'x',
                method='POST')
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(req)
            assert ei.value.code == 503
        finally:
            srv.stop()

    def test_zip_member_cap(self, tmp_path):
        import zipfile
        from totalsegmentator2d_tpu.inference.database import extract_zip
        zp = tmp_path / 'big.zip'
        with zipfile.ZipFile(zp, 'w') as zf:
            zf.writestr('small.dcm', b'x' * 8)
            zf.writestr('big.dcm', b'y' * 32)
        dest = tmp_path / 'out'
        dest.mkdir()
        with pytest.raises(RuntimeError, match='per-member limit'):
            extract_zip(str(zp), str(dest), max_member_bytes=16)
        assert not (dest / 'big.dcm').exists()
        ok = tmp_path / 'ok'
        ok.mkdir()
        extract_zip(str(zp), str(ok), max_member_bytes=64)
        assert (ok / 'big.dcm').read_bytes() == b'y' * 32


def test_production_wire_from_channel_names():
    """--warmup warms the int16 wire CT streams will hit: voxel-picking
    projection channels (max/mip/min/first) are integral, averaging
    channels are not."""
    from totalsegmentator2d_tpu.serve import production_wire
    assert production_wire({0: 'max', 1: 'mean'}) == (True, False)
    assert production_wire({0: 'xray'}) == (False,)
    assert production_wire({1: 'mean', 0: 'MIP'}) == (True, False)
