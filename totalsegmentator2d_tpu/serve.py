"""REST serving endpoint.

The reference's zoo API names a server interface ('svc'/'server',
zoo.py:137-141) but never implements one; this provides it for production
deployment: a lightweight HTTP server wrapping a resident TS2D tool. The
device programs stay compiled and warm across requests; request handling
runs on threads and the async XLA dispatch queue serializes device work.

Endpoints
---------
GET  /health            -> {"status": "ok", "models": [...]}
GET  /labels            -> {"<model id>": {"1": "heart", ...}, ...}
GET  /metrics           -> request/latency counters (JSON)
POST /predict           body: a medical image file (nrrd/nii/nii.gz/mha/
                        mhd/dcm via input_format=...), or a zipped DICOM
                        slice series (input_format=zip — the PACS-push
                        shape; CRC + path-traversal guarded extraction)
     query params:      input_format=..., collapse=0|1, format=nrrd|nii.gz
     response:          merged multilabel segmentation in the requested
                        format; label metadata rides in X-TS2D-Labels (JSON)

Start:  python -m totalsegmentator2d_tpu.serve --model ts2d --port 8008
        [--warmup ZxX ...]   pre-compile the device programs for the given
                             projection shapes (a cold shape costs a full
                             XLA compile on first request)

Production knobs: ``--auth-token`` (or $TS2D_AUTH_TOKEN) requires a Bearer
token on everything but /health and is strongly recommended for
non-loopback ``--host`` binds (the server warns otherwise — there is no
TLS here; front it with a reverse proxy); ``--request-timeout`` answers
504 past a per-predict wall-clock budget; ``--max-body-mb`` caps request
bodies (413), zipped series additionally cap at 8 GiB declared total and
1 GiB per member; shutdown (SIGINT / ``stop()``) drains in-flight
predicts — new ones answer 503 — before returning.
"""

from __future__ import annotations

import json
import os
import tempfile
import threading
from contextlib import contextmanager
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

from .utils.logging import log, warn


#: default request-body ceiling (512 MiB covers any realistic CT upload;
#: the largest published test asset is ~30 MB)
DEFAULT_MAX_BODY = 512 * 1024 * 1024


#: per-member declared-size cap for zipped-series uploads (a DICOM slice
#: is a few MB; one member claiming more than this is an attack, not a
#: scan). Applies on top of the global request-body cap and the 8 GiB
#: declared-total cap.
ZIP_MEMBER_MAX_BYTES = 1 << 30


class TS2DServer:
    def __init__(self, tool, host: str = '127.0.0.1', port: int = 8008,
                 max_body_bytes: int = DEFAULT_MAX_BODY,
                 request_timeout: Optional[float] = None,
                 auth_token: Optional[str] = None):
        self.tool = tool
        self.host = host
        self.port = port
        # requests are buffered in memory (temp-file write + predict): an
        # unbounded Content-Length is an OOM; over-limit posts get 413
        self.max_body_bytes = int(max_body_bytes)
        # per-request wall-clock budget: when set, a predict exceeding it
        # answers 504. The underlying work is NOT killed (a device program
        # cannot be safely interrupted mid-flight) — it finishes in its
        # worker and the shutdown drain waits for it; the worker pool
        # bounds how many such orphans can pile up.
        self.request_timeout = (float(request_timeout)
                                if request_timeout else None)
        # shared-secret auth: when set, every request must carry
        # 'Authorization: Bearer <token>' (constant-time compare)
        self.auth_token = auth_token or None
        self._httpd: Optional[ThreadingHTTPServer] = None
        self._thread: Optional[threading.Thread] = None
        # in-flight predict accounting for the shutdown drain
        self._active_cv = threading.Condition()
        self._active = 0
        self._draining = False
        self._pool = None  # lazy; only when request_timeout is set
        # request/latency counters served at /metrics (the reference has no
        # observability surface, SURVEY.md §5; production serving needs one)
        self._metrics_lock = threading.Lock()
        self._metrics = {'predict_requests': 0, 'predict_errors': 0,
                         'predict_timeouts': 0,
                         'predict_seconds_total': 0.0,
                         'predict_seconds_max': 0.0}

    def _check_auth(self, headers) -> bool:
        if self.auth_token is None:
            return True
        import hmac
        # compare BYTES: compare_digest raises TypeError on non-ASCII str,
        # and the header can carry any byte — a malformed header must 401,
        # not kill the handler with a traceback. http.server decodes header
        # bytes as latin-1, so encoding the supplied value back as latin-1
        # recovers the raw wire bytes (lossless: latin-1 round-trips every
        # byte); the expected side is the UTF-8 bytes a client puts on the
        # wire for the configured token. Encoding supplied as UTF-8 instead
        # would double-encode non-ASCII tokens and 401 every request.
        supplied = headers.get('Authorization', '')
        return hmac.compare_digest(
            supplied.encode('latin-1', 'surrogateescape'),
            f'Bearer {self.auth_token}'.encode('utf-8'))

    @contextmanager
    def _track(self):
        """Account one REQUEST SPAN in the shutdown drain: yields False
        (the caller answers 503) once draining. The span must wrap the
        whole handler — predict AND response write — so stop() never
        reports 'drained' while a thread is still streaming a multi-MB
        segmentation to a slow client."""
        with self._active_cv:
            draining = self._draining
            if not draining:
                self._active += 1
        if draining:
            # yield OUTSIDE the lock: the caller writes the 503 response
            # inside this span, and a stalled client socket must not hold
            # _active_cv (finishing predicts need it to decrement, and
            # stop()'s drain wait would see them as still in flight)
            yield False
            return
        try:
            yield True
        finally:
            with self._active_cv:
                self._active -= 1
                self._active_cv.notify_all()

    def _predict_guarded(self, body: bytes, query: dict):
        """Run a predict; with ``request_timeout`` set, under a wall-clock
        budget that starts when the predict BEGINS EXECUTING — queue wait
        behind a full worker pool is budgeted separately, so a burst does
        not spuriously 504 requests whose own predict would fit the
        budget. Past either budget: HTTP 504. Timed-out work itself
        finishes in its pool worker (a device program cannot be safely
        interrupted mid-flight) holding its own drain count, so stop()
        still waits for it; the pool bounds how many such orphans pile
        up."""
        if self.request_timeout is None:
            return self._handle_predict(body, query)
        from concurrent.futures import ThreadPoolExecutor
        from concurrent.futures import TimeoutError as FutTimeout
        with self._active_cv:
            if self._pool is None:
                self._pool = ThreadPoolExecutor(
                    8, thread_name_prefix='ts2d-serve-predict')
            # the task's OWN drain count: it may outlive this handler
            # span (the timeout paths) and stop() must still wait for it
            self._active += 1
        started = threading.Event()

        def task():
            started.set()
            try:
                return self._handle_predict(body, query)
            finally:
                with self._active_cv:
                    self._active -= 1
                    self._active_cv.notify_all()

        def timed_out(kind: str):
            with self._metrics_lock:
                self._metrics['predict_timeouts'] += 1
            return 504, 'application/json', json.dumps(
                {'error': f'predict {kind} the {self.request_timeout}s '
                          f'request timeout'}).encode()

        fut = self._pool.submit(task)
        if not started.wait(self.request_timeout) and fut.cancel():
            # never started: still queued behind a full pool after a full
            # budget. The cancelled task never runs — release its count.
            with self._active_cv:
                self._active -= 1
                self._active_cv.notify_all()
            return timed_out('queued past')
        try:
            return fut.result(timeout=self.request_timeout)
        except FutTimeout:
            return timed_out('exceeded')

    def _record(self, seconds: float, error: bool) -> None:
        with self._metrics_lock:
            m = self._metrics
            m['predict_requests'] += 1
            if error:
                m['predict_errors'] += 1
            else:
                m['predict_seconds_total'] += seconds
                m['predict_seconds_max'] = max(m['predict_seconds_max'],
                                               seconds)

    def _handle_metrics(self):
        with self._metrics_lock:
            m = dict(self._metrics)
        ok = m['predict_requests'] - m['predict_errors']
        m['predict_seconds_mean'] = (m['predict_seconds_total'] / ok
                                     if ok else 0.0)
        # micro-batching occupancy (inference/batching.py): whether
        # concurrent requests actually coalesce is invisible from latency
        # alone, and coalesced programs have load-dependent borderline
        # pixels — operators need to see it happening
        fused = getattr(self.tool, '_fused', None)
        batcher = getattr(fused, '_batcher', None) if fused else None
        if batcher is not None:
            m.update(batcher.stats())
        return 200, 'application/json', json.dumps(m).encode()

    # -- request handling --------------------------------------------------

    def _handle_health(self):
        return 200, 'application/json', json.dumps({
            'status': 'ok',
            'models': sorted(self.tool.models),
        }).encode()

    def _handle_labels(self):
        return 200, 'application/json', json.dumps({
            mid: {str(v): n for v, n in model.labels.items()}
            for mid, model in self.tool.models.items()
        }).encode()

    def _handle_predict(self, body: bytes, query: dict):
        from .io import read_image, write_image
        from .ops.annotations import get_annotation_labels

        ext = query.get('input_format', ['nrrd'])[0]
        out_fmt = query.get('format', ['nrrd'])[0]
        collapse = query.get('collapse', ['0'])[0] in ('1', 'true')
        # both extensions are interpolated into filesystem paths below:
        # whitelist strictly to the supported formats (no traversal).
        # 'dcm' is one DICOM file (incl. Enhanced multi-frame); 'zip' is a
        # zipped DICOM slice series — the PACS-push shape.
        if ext not in ('nrrd', 'nii', 'nii.gz', 'mha', 'mhd', 'dcm', 'zip'):
            return 400, 'application/json', json.dumps(
                {'error': f'unsupported input format {ext}'}).encode()
        if out_fmt not in ('nrrd', 'nii', 'nii.gz', 'mha'):
            return 400, 'application/json', json.dumps(
                {'error': f'unsupported output format {out_fmt}'}).encode()

        with tempfile.TemporaryDirectory(prefix='ts2d-serve-') as tmp:
            in_path = os.path.join(tmp, f'input.{ext}')
            with open(in_path, 'wb') as f:
                f.write(body)
            if ext == 'zip':
                from .inference.database import extract_zip
                from .io.dicom import DicomError, resolve_series_root
                series = os.path.join(tmp, 'series')
                os.mkdir(series)
                try:
                    # CRC + traversal guard + declared-size caps: 8 GiB
                    # total (far above any real series, far below a zip
                    # bomb) and ZIP_MEMBER_MAX_BYTES per member (a series
                    # is many small slices; one huge member is an attack)
                    extract_zip(in_path, series,
                                max_total_bytes=8 << 30,
                                max_member_bytes=ZIP_MEMBER_MAX_BYTES)
                except Exception as ex:
                    return 400, 'application/json', json.dumps(
                        {'error': f'failed to extract zip: {ex}'}).encode()
                try:
                    in_path = resolve_series_root(series)
                except DicomError:
                    return 400, 'application/json', json.dumps(
                        {'error': 'zip contains no DICOM series'}).encode()
            try:
                img = read_image(in_path)
            except Exception as ex:
                return 400, 'application/json', json.dumps(
                    {'error': f'failed to parse input image: {ex}'}).encode()

            # no host-side serialization: predict is thread-safe (the engine
            # locks only its program cache) and the XLA dispatch queue orders
            # device work, so concurrent requests overlap their host-side
            # parse/export with each other's device time
            res = self.tool.predict(img, collapse=collapse)
            seg = res.get_segmentation()
            out_path = os.path.join(tmp, f'seg.{out_fmt}')
            write_image(seg, out_path)
            payload = open(out_path, 'rb').read()
            labels = {name: info['value'] for name, info in
                      get_annotation_labels(seg).items()}
        return 200, 'application/octet-stream', payload, {
            'X-TS2D-Labels': json.dumps(labels),
            'Content-Disposition': f'attachment; filename="seg.{out_fmt}"',
        }

    # -- http plumbing ------------------------------------------------------

    def _make_handler(self):
        server = self

        class Handler(BaseHTTPRequestHandler):
            # socket idle timeout: a stalled client (slow-loris) holds a
            # handler thread at most this long before the connection closes
            timeout = 60

            def log_message(self, fmt, *args):
                log(f'[serve] {fmt % args}')

            def _unauthorized(self, path) -> bool:
                if path == '/health' or server._check_auth(self.headers):
                    return False
                self._send(401, 'application/json', json.dumps(
                    {'error': 'missing or invalid Authorization: Bearer '
                              'token'}).encode(),
                           {'WWW-Authenticate': 'Bearer'})
                return True

            def _send(self, status, ctype, payload, headers=None):
                self.send_response(status)
                self.send_header('Content-Type', ctype)
                self.send_header('Content-Length', str(len(payload)))
                for k, v in (headers or {}).items():
                    self.send_header(k, v)
                self.end_headers()
                self.wfile.write(payload)

            def do_GET(self):
                path = self.path.split('?')[0]
                if self._unauthorized(path):
                    return
                if path == '/health':
                    self._send(*server._handle_health())
                elif path == '/labels':
                    self._send(*server._handle_labels())
                elif path == '/metrics':
                    self._send(*server._handle_metrics())
                else:
                    self._send(404, 'application/json',
                               json.dumps({'error': 'not found'}).encode())

            def do_POST(self):
                from urllib.parse import parse_qs, urlparse
                parsed = urlparse(self.path)
                if self._unauthorized(parsed.path):
                    return
                if parsed.path != '/predict':
                    self._send(404, 'application/json',
                               json.dumps({'error': 'not found'}).encode())
                    return
                try:
                    length = int(self.headers.get('Content-Length', 0))
                except (TypeError, ValueError):
                    length = -1
                if length < 0:
                    self._send(411, 'application/json', json.dumps(
                        {'error': 'Content-Length required'}).encode())
                    return
                if length > server.max_body_bytes:
                    # reject BEFORE buffering: an over-limit body never
                    # accumulates in memory. A bounded lingering drain
                    # (nginx-style) lets a plain client finish writing and
                    # actually READ the 413 — responding and closing
                    # immediately gives it EPIPE instead of the status.
                    self._send(413, 'application/json', json.dumps(
                        {'error': f'request body {length} bytes exceeds '
                                  f'limit {server.max_body_bytes}'}).encode())
                    try:
                        self.wfile.flush()
                        import time as _time
                        deadline = _time.monotonic() + 5.0
                        left = length
                        while left > 0 and _time.monotonic() < deadline:
                            chunk = self.rfile.read(min(left, 1 << 20))
                            if not chunk:
                                break
                            left -= len(chunk)
                    except OSError:
                        pass  # client already went away
                    self.close_connection = True
                    return
                body = self.rfile.read(length)
                import time
                t0 = time.perf_counter()
                with server._track() as accepted:
                    if not accepted:
                        self._send(503, 'application/json', json.dumps(
                            {'error': 'server is shutting down'}).encode())
                        return
                    try:
                        result = server._predict_guarded(
                            body, parse_qs(parsed.query))
                    except Exception as ex:
                        warn(f'[serve] predict failed: {ex}')
                        result = (500, 'application/json',
                                  json.dumps({'error': str(ex)}).encode())
                    server._record(time.perf_counter() - t0,
                                   error=result[0] != 200)
                    self._send(*result)

        return Handler

    def start(self) -> 'TS2DServer':
        with self._active_cv:
            self._draining = False
        self._httpd = ThreadingHTTPServer((self.host, self.port),
                                          self._make_handler())
        self.port = self._httpd.server_address[1]
        self._thread = threading.Thread(target=self._httpd.serve_forever,
                                        daemon=True, name='ts2d-server')
        self._thread.start()
        log(f'TS2D serving on http://{self.host}:{self.port}')
        if (self.host not in ('127.0.0.1', 'localhost', '::1')
                and self.auth_token is None):
            warn(f'serving on non-loopback address {self.host!r} with no '
                 f'auth token: the endpoint has no authentication or TLS. '
                 f'Set auth_token / --auth-token / TS2D_AUTH_TOKEN, or put '
                 f'it behind an authenticated reverse proxy.')
        return self

    def stop(self, drain_timeout: float = 30.0) -> bool:
        """Stop accepting work and DRAIN in-flight predicts: new predicts
        answer 503 immediately; the call returns once running ones finish
        (or ``drain_timeout`` passes — then their daemon threads are
        abandoned and False is returned)."""
        import time
        with self._active_cv:
            self._draining = True
        if self._httpd is not None:
            self._httpd.shutdown()
            # shutdown() only exits serve_forever; the listening socket
            # stays open without server_close() — new clients would
            # handshake into the accept backlog and hang (nothing accepts
            # anymore), and every start/stop cycle would leak the fd
            self._httpd.server_close()
            self._httpd = None
        drained = True
        deadline = time.monotonic() + drain_timeout
        with self._active_cv:
            while self._active > 0:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    warn(f'{self._active} predict(s) still in flight after '
                         f'the {drain_timeout:.0f}s shutdown drain; '
                         f'abandoning them')
                    drained = False
                    break
                self._active_cv.wait(remaining)
        if self._pool is not None:
            self._pool.shutdown(wait=False)
            self._pool = None
        return drained

    def __enter__(self):
        return self.start()

    def __exit__(self, exc_type, exc_val, exc_tb):
        self.stop()


def production_wire(channel_names) -> tuple:
    """The int16 wire a CT stream will hit (ensemble_engine.wire_detect):
    projection modes that PICK a voxel of an integer volume (max/min/first/
    mip) stay exactly integral; averaging modes (mean/avg/std) are
    fractional and ride float32. --warmup warms this variant alongside the
    plain float32 wire so the first real request pays no cold compile."""
    names = [str(n).lower() for _, n in sorted(channel_names.items())]
    return tuple(n in ('max', 'mip', 'min', 'first') for n in names)


def main() -> None:
    import argparse
    from .api import TS2D

    parser = argparse.ArgumentParser(description='Serve TS2D over HTTP.')
    parser.add_argument('--model', type=str, default=None)
    parser.add_argument('--host', type=str, default='127.0.0.1')
    parser.add_argument('--port', type=int, default=8008)
    parser.add_argument('--no-remote', action='store_true')
    parser.add_argument('--no-fetch', action='store_true')
    parser.add_argument('--local', type=str, default=None)
    parser.add_argument('--batch-linger-ms', type=float, default=0.0,
                        help='hold a partial micro-batch up to this long '
                             'waiting for it to fill (throughput mode; '
                             '0 = dispatch immediately, latency mode)')
    parser.add_argument('--max-body-mb', type=int,
                        default=DEFAULT_MAX_BODY // (1024 * 1024),
                        help='reject request bodies larger than this '
                             '(HTTP 413); bounds server memory per request')
    parser.add_argument('--request-timeout', type=float, default=0.0,
                        metavar='SECONDS',
                        help='answer 504 when a predict exceeds this '
                             'wall-clock budget (0 = no timeout); the '
                             'orphaned work finishes in a bounded worker '
                             'pool and shutdown drains it')
    parser.add_argument('--auth-token', type=str,
                        default=os.environ.get('TS2D_AUTH_TOKEN'),
                        help='require "Authorization: Bearer <token>" on '
                             'every endpoint except /health (default: '
                             '$TS2D_AUTH_TOKEN); strongly recommended for '
                             'non-loopback --host binds')
    parser.add_argument('--pad-quantum', type=int, default=None,
                        metavar='N',
                        help='quantized-shape serving: scans ride shape '
                             'buckets (next multiple of N per axis, one '
                             'geometry-as-data program per bucket) so '
                             'heterogeneous sizes share a bounded set of '
                             'compiled programs and co-batch; results '
                             'match exact mode up to float-noise '
                             'borderline flips (omit for exact per-shape '
                             'programs)')
    parser.add_argument('--warmup', type=str, nargs='*', default=(),
                        metavar='HxW',
                        help='pre-compile the fused device program for these '
                             'projection shapes (e.g. 350x280) before '
                             'serving — a cold shape otherwise pays a full '
                             'XLA compile on its first request')
    args = parser.parse_args()

    from .utils.config import get_default_model
    key = args.model or get_default_model()
    with TS2D(key=key, use_remote=not args.no_remote,
              fetch_remote=not args.no_fetch, local=args.local,
              pad_quantum=args.pad_quantum) as tool:
        fused = getattr(tool, '_fused', None)
        if args.batch_linger_ms:
            if fused is not None:
                fused.set_batch_linger(args.batch_linger_ms)
            else:
                warn('--batch-linger-ms requires a fused model set; '
                     'requests will run unbatched')
        # validate EVERY --warmup shape before compiling any: a typo in the
        # second shape must not surface only after the first one's
        # minutes-long XLA compile has already run
        warmup_shapes = []
        for shape in args.warmup:
            try:
                h, w = (int(v) for v in shape.lower().split('x'))
            except ValueError:
                parser.error(f"--warmup expects HxW (e.g. 350x280); "
                             f"got '{shape}'")
            warmup_shapes.append((h, w))
        if warmup_shapes and fused is None:
            warn('--warmup requires a fused model set; skipping')
            warmup_shapes = []
        prod_wire = production_wire(fused.spec.channel_names) \
            if fused is not None else ()
        for h, w in warmup_shapes:
            log(f'warming up {h}x{w} ...')
            fused.warmup((h, w))
            if any(prod_wire):
                log(f'warming up {h}x{w} int16 wire {prod_wire} ...')
                fused.warmup((h, w), wire=prod_wire)
        server = TS2DServer(
            tool, host=args.host, port=args.port,
            max_body_bytes=args.max_body_mb * 1024 * 1024,
            request_timeout=args.request_timeout or None,
            auth_token=args.auth_token).start()
        try:
            threading.Event().wait()
        except KeyboardInterrupt:
            server.stop()


if __name__ == '__main__':
    main()
