"""Host runtime: async runner, scan pipeline, stage timers."""

import threading
import time

import numpy as np
import pytest

from tests.conftest import asset_path
from tests.model_fixtures import build_group_set
from totalsegmentator2d_tpu.inference.runner import AsyncRunner
from totalsegmentator2d_tpu.utils.trace import StageTimer, device_trace


# full tier: heavy integration on a 1-core CPU box (run with pytest -m '')
pytestmark = pytest.mark.slow


class TestAsyncRunner:
    def test_submit_and_result(self):
        with AsyncRunner(num_workers=2) as r:
            futs = [r.submit(lambda i=i: i * i) for i in range(10)]
            assert [f.result(timeout=5) for f in futs] == \
                [i * i for i in range(10)]

    def test_warmup_runs_before_tasks(self):
        order = []
        with AsyncRunner(num_workers=1) as r:
            r.stop()
            r2 = AsyncRunner(num_workers=1)
            r2.start(warmup=lambda: order.append('warm'))
            r2.submit(lambda: order.append('task')).result(timeout=5)
            r2.stop()
        assert order == ['warm', 'task']

    def test_task_exception_propagates(self):
        with AsyncRunner() as r:
            fut = r.submit(lambda: 1 / 0)
            with pytest.raises(ZeroDivisionError):
                fut.result(timeout=5)

    def test_wait_blocks_until_done(self):
        with AsyncRunner(num_workers=2) as r:
            done = []
            for i in range(4):
                r.submit(lambda i=i: (time.sleep(0.05), done.append(i)))
            r.wait(timeout=5)
            assert len(done) == 4

    def test_timestamps_recorded(self):
        with AsyncRunner() as r:
            fut = r.submit(lambda: time.sleep(0.01), task_id='t1')
            fut.result(timeout=5)
            marks = r.timestamps('t1')
            assert set(marks) >= {'start', 'get', 'done'}

    def test_stop_cancels_pending(self):
        r = AsyncRunner(num_workers=1)
        r.start()
        r.submit(lambda: time.sleep(0.3))
        fut = r.submit(lambda: 42)
        r.stop(timeout=2)
        assert fut.cancelled() or fut.done()
        assert not r.alive()

    def test_stop_with_many_pending_does_not_raise(self):
        # cancel() runs the done-callback synchronously, popping _tasks
        # while stop() iterates it — must not RuntimeError
        import threading
        r = AsyncRunner(num_workers=1)
        r.start()
        release = threading.Event()
        r.submit(release.wait)
        futs = [r.submit(lambda i=i: i) for i in range(8)]
        try:
            r.stop(timeout=0.3)  # expires while the blocker runs
        finally:
            release.set()
        assert all(f.cancelled() or f.done() for f in futs)

    def test_cancel_inflight_does_not_kill_worker(self):
        # a future is RUNNING once its task starts: cancel() must fail on
        # it (not succeed and then blow up the worker on set_result)
        import threading
        r = AsyncRunner(num_workers=1)
        r.start()
        started, release = threading.Event(), threading.Event()

        def slow():
            started.set()
            release.wait(5.0)
            return 'done'

        fut = r.submit(slow)
        assert started.wait(5.0)
        assert fut.cancel() is False  # in-flight: not cancellable
        release.set()
        assert fut.result(timeout=5) == 'done'
        assert r.alive()
        assert r.submit(lambda: 7).result(timeout=5) == 7
        r.stop()

    def test_restart_after_timed_out_stop(self):
        # a worker that misses its pill (exits via the abort flag) leaves
        # the pill in the queue; the NEXT generation's workers must ignore
        # it instead of dying immediately
        import threading
        r = AsyncRunner(num_workers=1)
        r.start()
        release = threading.Event()
        r.submit(release.wait)
        r.stop(timeout=0.2)   # expires; pill stays enqueued
        release.set()
        time.sleep(0.3)       # old worker drains out via _stopping
        r.start()
        assert r.submit(lambda: 11).result(timeout=5) == 11
        assert r.alive()
        r.stop()

    def test_worker_outliving_stop_exits_on_restart(self):
        # a worker still mid-task when stop() times out must EXIT once a
        # new generation starts (its own pill was discarded as stale by
        # the replacement) instead of re-entering the loop and competing
        # with the new worker for queue tasks forever
        import threading
        r = AsyncRunner(num_workers=1, name='ts2d-zombie')
        r.start()
        release = threading.Event()
        r.submit(release.wait)
        r.stop(timeout=0.2)   # expires: the worker is still in the task
        r.start()             # gen 2 spawns while the gen-1 worker lives
        release.set()         # gen-1 finishes its task...
        deadline = time.monotonic() + 5
        stale = True
        while time.monotonic() < deadline:
            stale = [t for t in threading.enumerate()
                     if t.name.startswith('ts2d-zombie-worker')
                     and t not in r._threads]
            if not stale:
                break
            time.sleep(0.05)
        assert not stale      # ...and exits via the generation check
        assert r.submit(lambda: 7).result(timeout=5) == 7
        r.stop()


class TestStageTimer:
    def test_deltas_and_report(self):
        t = StageTimer('x')
        time.sleep(0.01)
        t.mark('read')
        time.sleep(0.01)
        t.mark('predict')
        d = t.deltas()
        assert list(d) == ['read', 'predict']
        assert all(v > 0 for v in d.values())
        assert 'total' in t.report()

    def test_device_trace_noop(self):
        with device_trace(None):
            pass

    def test_device_trace_writes(self, tmp_path):
        import jax.numpy as jnp
        with device_trace(str(tmp_path)):
            jnp.ones(8).sum().block_until_ready()
        # profiler output lands under the dir (plugins/profile/...)
        assert any(tmp_path.rglob('*'))


class TestScanPipeline:
    def test_pipeline_end_to_end(self, tmp_path):
        import shutil
        from totalsegmentator2d_tpu.api import TS2D
        from totalsegmentator2d_tpu.inference.pipeline import ScanPipeline

        zoo_root = tmp_path / 'zoo'
        build_group_set(str(zoo_root))
        src = tmp_path / 'src'
        src.mkdir()
        shutil.copy(asset_path('sample_s0332.nrrd'), src / 'a.nrrd')
        shutil.copy(asset_path('sample_s0616.nrrd'), src / 'b.nrrd')
        out = tmp_path / 'out'

        with TS2D(key='ts2d-v9-test', use_remote=False,
                  local=str(zoo_root)) as tool:
            pipe = ScanPipeline(tool, prefetch=2, save_workers=2)
            cases = [('a', str(src / 'a.nrrd')), ('b', str(src / 'b.nrrd'))]
            timers = pipe.run(cases, save_kwargs=dict(
                dest=str(out), targets=['segmentation'], content='file'))
        assert (out / 'a.seg.nrrd').exists()
        assert (out / 'b.seg.nrrd').exists()
        assert len(timers) == 2
        assert all('predict' in t.marks for t in timers)

    def test_pipeline_skips_bad_case(self, tmp_path):
        import shutil
        from totalsegmentator2d_tpu.api import TS2D
        from totalsegmentator2d_tpu.inference.pipeline import ScanPipeline

        zoo_root = tmp_path / 'zoo'
        build_group_set(str(zoo_root))
        src = tmp_path / 'src'
        src.mkdir()
        shutil.copy(asset_path('sample_s0332.nrrd'), src / 'ok.nrrd')
        out = tmp_path / 'out'
        with TS2D(key='ts2d-v9-test', use_remote=False,
                  local=str(zoo_root)) as tool:
            pipe = ScanPipeline(tool)
            results = []
            timers = pipe.run(
                [('bad', str(src / 'missing.nrrd')), ('ok', str(src / 'ok.nrrd'))],
                on_result=lambda n, r: results.append(n),
                save_kwargs=dict(dest=str(out), targets=['segmentation'],
                                 content='file'))
        assert results == ['ok']
        assert (out / 'ok.seg.nrrd').exists()

    def test_pipeline_async_window_matches_sync(self, tmp_path):
        """With several scans in flight (predict_async + micro-batching),
        the pipeline's outputs must equal one-at-a-time predicts."""
        import shutil
        import numpy as np
        from totalsegmentator2d_tpu.api import TS2D
        from totalsegmentator2d_tpu.inference.pipeline import ScanPipeline
        from totalsegmentator2d_tpu.io import read_image

        zoo_root = tmp_path / 'zoo'
        build_group_set(str(zoo_root))
        src = tmp_path / 'src'
        src.mkdir()
        for i in range(4):
            shutil.copy(asset_path('sample_s0332.nrrd'), src / f'c{i}.nrrd')
        out = tmp_path / 'out'
        with TS2D(key='ts2d-v9-test', use_remote=False,
                  local=str(zoo_root)) as tool:
            ref = tool.predict(str(src / 'c0.nrrd')).get_segmentation()
            pipe = ScanPipeline(tool, in_flight=4)
            cases = [(f'c{i}', str(src / f'c{i}.nrrd')) for i in range(4)]
            timers = pipe.run(cases, save_kwargs=dict(
                dest=str(out), targets=['segmentation'], content='file'))
        assert len(timers) == 4
        assert all('dispatch' in t.marks for t in timers)
        for i in range(4):
            seg = read_image(str(out / f'c{i}.seg.nrrd'))
            np.testing.assert_array_equal(seg.array, ref.array)
