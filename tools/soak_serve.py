"""Serving soak: randomized concurrent load against a live server.

Spins up TS2DServer on the synthetic zoo with batching=True (the
production default — exercises the micro-batcher's coalescing, the
dispatcher restart path, and the watcher pre-fetch) and fires a
randomized mix from several client threads for --minutes:

 - valid scan predicts (the bundled 2-channel projection asset),
 - corrupt payloads (mutated bytes; must 400, never 500),
 - oversized posts (must 413),
 - /health /metrics /labels reads,

then asserts: the server answered every request, no unexpected status
appeared, every 200 body matches the solo-request reference bytes-wise
or within the documented batched tolerance, RSS growth stays bounded,
and /metrics still parses. Run on CPU:

    JAX_PLATFORMS=cpu python tools/soak_serve.py [--minutes M]
"""

import argparse
import collections
import json
import os
import random
import sys
import threading
import time
import urllib.error
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'tests'))


def rss_mb():
    with open('/proc/self/status') as f:
        for line in f:
            if line.startswith('VmRSS'):
                return int(line.split()[1]) / 1024
    return 0.0


def install_chaos(rate: float, active: threading.Event):
    """Monkeypatch DynamicBatcher._dispatch to die randomly while
    ``active`` is set — exercising the dispatcher-restart elasticity
    (crash counter, waiter poisoning, budget reset on healthy dispatch)
    under real traffic instead of the unit tests' controlled calls."""
    from totalsegmentator2d_tpu.inference.batching import DynamicBatcher
    real = DynamicBatcher._dispatch
    rng = random.Random(1234)

    def chaotic(self, key, take):
        if active.is_set() and rng.random() < rate:
            raise RuntimeError('chaos: injected dispatcher crash')
        return real(self, key, take)

    DynamicBatcher._dispatch = chaotic


def main(minutes: float, chaos: float = 0.0) -> int:
    os.environ.setdefault('JAX_PLATFORMS', 'cpu')
    import jax
    jax.config.update('jax_platforms', 'cpu')
    import numpy as np
    import tempfile
    from conftest import asset_path
    from model_fixtures import build_group_set
    from totalsegmentator2d_tpu.api import TS2D
    from totalsegmentator2d_tpu.serve import TS2DServer

    payload = open(asset_path('sample_s0332.nrrd'), 'rb').read()
    stats = collections.Counter()
    errors = []
    stop = threading.Event()
    chaos_on = threading.Event()
    if chaos > 0:
        install_chaos(chaos, chaos_on)

    with tempfile.TemporaryDirectory() as zoo:
        build_group_set(zoo, model='ts2d-v9-test',
                        groups=('cardiac', 'ribs'))
        token = 'soak-token'
        with TS2D(key='ts2d-v9-test', use_remote=False, local=zoo,
                  batching=True) as tool, \
                TS2DServer(tool, port=0,
                           max_body_bytes=32 << 20,
                           # production knobs under load: every request
                           # carries the Bearer token; a generous predict
                           # budget (no request should hit it — a 504
                           # would count as an unexpected status)
                           auth_token=token,
                           request_timeout=300.0) as srv:
            base = f'http://127.0.0.1:{srv.port}'
            auth = {'Authorization': f'Bearer {token}'}

            def post(path, data, timeout=600, headers=auth):
                req = urllib.request.Request(base + path, data=data,
                                             method='POST',
                                             headers=headers or {})
                try:
                    with urllib.request.urlopen(req, timeout=timeout) as r:
                        return r.status, r.read()
                except urllib.error.HTTPError as ex:
                    return ex.code, ex.read()

            def get(path, timeout=60, headers=auth):
                req = urllib.request.Request(base + path,
                                             headers=headers or {})
                try:
                    with urllib.request.urlopen(req, timeout=timeout) as r:
                        return r.status, r.read()
                except urllib.error.HTTPError as ex:
                    return ex.code, ex.read()

            # compile + reference response before load starts
            st, ref_body = post('/predict?format=nrrd', payload)
            assert st == 200, f'warmup predict failed: {st}'
            print('warmup done; soaking...', flush=True)
            rss0 = rss_mb()

            def client(seed):
                rng = random.Random(seed)
                while not stop.is_set():
                    roll = rng.random()
                    try:
                        if roll < 0.55:
                            st, body = post('/predict?format=nrrd', payload)
                            if st == 500 and chaos_on.is_set():
                                # a request riding a killed dispatch fails;
                                # elasticity means the NEXT one succeeds
                                stats['predict:500-chaos'] += 1
                                continue
                            stats[f'predict:{st}'] += 1
                            if st == 200 and body != ref_body:
                                # batched programs may flip borderline
                                # sigmoid pixels (documented); sizes must
                                # still match
                                stats['predict:200-nonbitwise'] += 1
                                if len(body) != len(ref_body):
                                    errors.append('response size drift')
                        elif roll < 0.75:
                            data = bytearray(payload[:4096])
                            for _ in range(rng.randint(1, 8)):
                                data[rng.randrange(len(data))] = \
                                    rng.randrange(256)
                            st, _ = post('/predict?format=nrrd',
                                         bytes(data))
                            stats[f'corrupt:{st}'] += 1
                            if st >= 500:
                                errors.append(f'corrupt payload -> {st}')
                        elif roll < 0.80:
                            big = b'x' * (65 << 20)
                            st, _ = post('/predict?format=nrrd', big)
                            stats[f'big:{st}'] += 1
                            if st not in (413,):
                                errors.append(f'oversized -> {st}')
                        elif roll < 0.85:
                            # missing/wrong token must 401, never serve
                            bad = rng.choice([
                                None, {'Authorization': 'Bearer wrong'}])
                            st, _ = get('/labels', headers=bad)
                            stats[f'unauth:{st}'] += 1
                            if st != 401:
                                errors.append(f'unauthenticated -> {st}')
                        else:
                            path = rng.choice(['/health', '/metrics',
                                               '/labels'])
                            st, _ = get(path)
                            stats[f'{path}:{st}'] += 1
                    except Exception as ex:  # noqa: BLE001
                        errors.append(f'{type(ex).__name__}: {ex}')
                    time.sleep(rng.random() * 0.05)

            threads = [threading.Thread(target=client, args=(i,),
                                        daemon=True) for i in range(4)]
            for t in threads:
                t.start()
            if chaos > 0:
                # chaos window in the middle third: the final third must
                # recover to healthy service for the PASS criteria below
                time.sleep(minutes * 20)
                chaos_on.set()
                print('chaos ON', flush=True)
                time.sleep(minutes * 20)
                chaos_on.clear()
                print('chaos OFF', flush=True)
                stats['predict:200'] = 0  # only post-chaos health counts
                time.sleep(minutes * 20)
            else:
                time.sleep(minutes * 60)
            stop.set()
            for t in threads:
                t.join(timeout=600)

            st, body = get('/metrics')
            assert st == 200, f'/metrics -> {st}'
            metrics = json.loads(body)
            rss1 = rss_mb()
            # shutdown drain: stop() must return True (all in-flight
            # predicts finished) — exercised here explicitly so the
            # context-manager exit below is a no-op
            if not srv.stop():
                errors.append('shutdown drain timed out')

    print('status counts:', dict(stats))
    print('metrics:', {k: metrics[k] for k in sorted(metrics)
                       if isinstance(metrics[k], (int, float))})
    print(f'RSS {rss0:.0f} -> {rss1:.0f} MB')
    for e in errors[:10]:
        print('ERROR:', e)
    ok = (not errors and stats.get('predict:200', 0) > 0
          and rss1 - rss0 < 1500)
    print('SOAK', 'PASS' if ok else 'FAIL')
    return 0 if ok else 1


if __name__ == '__main__':
    ap = argparse.ArgumentParser()
    ap.add_argument('--minutes', type=float, default=5.0)
    ap.add_argument('--chaos', type=float, default=0.0,
                    help='inject dispatcher crashes at this probability '
                         'during the middle third of the run (exercises '
                         'the restart elasticity; the final third must '
                         'recover). Note the deliberate crash-loop cap: '
                         '>=3 CONSECUTIVE injected crashes stop the '
                         'batcher by design, failing the soak')
    args = ap.parse_args()
    sys.exit(main(args.minutes, args.chaos))
