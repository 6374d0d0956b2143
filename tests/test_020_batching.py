"""Unit tests for the arrival-aware DynamicBatcher policy
(totalsegmentator2d_tpu/inference/batching.py) against a fake engine.

The policy under test is the TPU-native replacement for the reference's
host process pool (reference predictor.py:42-96): device idle -> dispatch
immediately; device busy -> accumulate while arrivals stream, dispatch on a
full head batch or an arrival pause; below min_fill queued scans go out as
solos (a padded partial batch costs the full max_batch program); a burst
ramp sends the first dispatches after idle as solos; partial batches slice
their padding rows off before the host fetch.

A fake engine records every dispatched program and its batch size, and a
SlowArray output simulates the result-download wire (the watcher's fetch)
taking real time, which is what keeps the device 'busy' for the policy.
"""

import threading
import time

import numpy as np
import pytest

from totalsegmentator2d_tpu.inference.batching import DynamicBatcher


class SlowArray:
    """Stands in for a device array whose host fetch (``__array__``) takes
    ``delay`` seconds — jax.device_get resolves leaves via __array__."""

    def __init__(self, arr, delay):
        self.arr = np.asarray(arr)
        self.delay = delay
        self.fetched = threading.Event()

    def __array__(self, dtype=None, copy=None):
        time.sleep(self.delay)
        self.fetched.set()
        out = self.arr if dtype is None else self.arr.astype(dtype)
        return np.array(out) if copy else out

    def __getitem__(self, key):
        # the device-side padding slice in _dispatch
        sliced = SlowArray(self.arr[key], self.delay)
        sliced.parent_rows = self.arr.shape[0]
        return sliced


class FakeEngine:
    """Looks enough like EnsembleEngine for DynamicBatcher: `_program` /
    `_batched_program` return identity functions over the input stack and
    record every dispatch's batch size."""

    def __init__(self, fetch_delay=0.0):
        self.params = {'w': np.zeros(1)}
        self.fetch_delay = fetch_delay
        self.dispatches = []      # list of (kind, program_rows)
        self.outputs = []         # SlowArray handed back per dispatch
        self._lock = threading.Lock()

    def _program(self, shape, spacing, wire=None):
        def fn(params, x, mask=None):
            arr = np.asarray(x)[None]  # (1, H, W, C): solo program
            out = SlowArray(arr, self.fetch_delay)
            with self._lock:
                self.dispatches.append(('solo', 1))
                self.outputs.append(out)
            return out
        return fn, {}  # meta dict, like the real builders

    # the dispatcher selects via _serving_program (pad_quantum indirection)
    _serving_program = _program

    def _batched_program(self, max_batch, shape, spacing, has_mask,
                         wire=None):
        def fnb(params, xb, mb=None):
            arr = np.asarray(xb)
            assert arr.shape[0] == max_batch, 'batch pads to max_batch'
            out = SlowArray(arr, self.fetch_delay)
            with self._lock:
                self.dispatches.append(('batch', arr.shape[0]))
                self.outputs.append(out)
            return out
        return fnb, {}


def _mk(i, shape=(16, 12)):
    """A scan whose content encodes its submission index."""
    return np.full(shape + (2,), float(i), np.float32)


def _submit_locked(b, items):
    """Queue every item before the dispatcher can run (the Condition lock
    is an RLock, so submit() re-enters it)."""
    futs = []
    with b._cv:
        for it in items:
            futs.append(b.submit(it, None, (1.5, 1.5), (0, 0), it.shape))
    return futs


def _drain(futs, timeout=30):
    return [f.result(timeout=timeout) for f in futs]


class TestArrivalAwarePolicy:
    def test_idle_device_dispatches_solo_immediately(self):
        eng = FakeEngine()
        b = DynamicBatcher(eng, max_batch=8)
        try:
            t0 = time.monotonic()
            fut = b.submit(_mk(0), None, (1.5, 1.5), (0, 0), (16, 12))
            br, idx, bbox, full = fut.result(timeout=10)
            # no accumulate_gap wait on an idle device
            assert time.monotonic() - t0 < 0.5 * b.accumulate_gap_ms / 1e3 + 1
            assert idx is None
            assert eng.dispatches == [('solo', 1)]
            np.testing.assert_array_equal(br.get()[0], _mk(0))
        finally:
            b.stop()

    def test_deep_queue_cancels_the_ramp(self):
        # 12 scans queued at once: a full batch of one shape is ALREADY
        # waiting, so the adaptive ramp must cancel (solo ramp dispatches
        # cost ~3.5x the per-scan batch cost and throttle a streaming
        # caller) — 8 coalesce immediately, the 4 leftover ride a padded
        # batch (>= min_fill).
        eng = FakeEngine(fetch_delay=1.0)
        b = DynamicBatcher(eng, max_batch=8, accumulate_gap_ms=30.0)
        try:
            futs = _submit_locked(b, [_mk(i) for i in range(12)])
            res = _drain(futs)
            sizes = [d for d in eng.dispatches]
            assert sizes == [('batch', 8), ('batch', 8)], sizes
            # every scan got its own content back through its (br, idx)
            for i, (br, idx, _, _) in enumerate(res):
                row = br.get()[0 if idx is None else idx]
                np.testing.assert_array_equal(row, _mk(i))
            # occupancy counters reflect the dispatch pattern (/metrics)
            st = b.stats()
            assert st['batch_occupancy'][7] == 1   # the full batch
            assert st['batch_occupancy'][3] == 1   # the padded leftover
            assert st['batch_programs'] == 2
            assert st['batch_scans'] == 12
            assert st['batch_scans_coalesced'] == 12
            assert st['batch_mean_occupancy'] == pytest.approx(6.0)
        finally:
            b.stop()

    def test_burst_ramp_engages_on_shallow_queue(self):
        # 5 scans queued at once (no full batch waiting): the burst ramp
        # sends ramp_solos=3 solos first so results start moving at solo
        # latency, then the 2 leftover flush as solos (below min_fill).
        eng = FakeEngine(fetch_delay=1.0)
        b = DynamicBatcher(eng, max_batch=8, accumulate_gap_ms=30.0)
        try:
            futs = _submit_locked(b, [_mk(i) for i in range(5)])
            res = _drain(futs)
            sizes = [d for d in eng.dispatches]
            assert sizes == [('solo', 1)] * 5, sizes
            for i, (br, idx, _, _) in enumerate(res):
                row = br.get()[0 if idx is None else idx]
                np.testing.assert_array_equal(row, _mk(i))
        finally:
            b.stop()

    def test_below_min_fill_goes_solo(self):
        eng = FakeEngine(fetch_delay=1.0)
        b = DynamicBatcher(eng, max_batch=8, min_fill=4,
                           accumulate_gap_ms=20.0)
        b.ramp_solos = 0
        try:
            futs = _submit_locked(b, [_mk(i) for i in range(3)])
            _drain(futs)
            assert eng.dispatches == [('solo', 1)] * 3
        finally:
            b.stop()

    def test_partial_batch_slices_padding_before_fetch(self):
        eng = FakeEngine()
        b = DynamicBatcher(eng, max_batch=8, min_fill=4)
        b.ramp_solos = 0
        try:
            futs = _submit_locked(b, [_mk(i) for i in range(5)])
            res = _drain(futs)
            # one batched program padded to 8 ...
            assert eng.dispatches == [('batch', 8)]
            for i, (br, idx, _, _) in enumerate(res):
                assert idx == i
                np.testing.assert_array_equal(br.get()[idx], _mk(i))
            # ... but the fetched array was the device-side [:5] slice of
            # the 8-row program output, not the padded batch
            fetched = res[0][0].get()
            assert fetched.shape[0] == 5
        finally:
            b.stop()

    def test_different_keys_never_co_batch(self):
        eng = FakeEngine()
        b = DynamicBatcher(eng, max_batch=8, min_fill=2)
        b.ramp_solos = 0
        try:
            a = [_mk(i, shape=(16, 12)) for i in range(4)]
            c = [_mk(10 + i, shape=(20, 12)) for i in range(4)]
            futs = _submit_locked(b, a + c)
            res = _drain(futs)
            assert eng.dispatches == [('batch', 8), ('batch', 8)]
            # shapes stayed uniform within each dispatched program
            assert eng.outputs[0].arr.shape[1:3] == (16, 12)
            assert eng.outputs[1].arr.shape[1:3] == (20, 12)
            for i, (br, idx, _, _) in enumerate(res[:4]):
                np.testing.assert_array_equal(br.get()[idx], a[i])
            for i, (br, idx, _, _) in enumerate(res[4:]):
                np.testing.assert_array_equal(br.get()[idx], c[i])
        finally:
            b.stop()

    def test_watcher_prefetches_and_clears_inflight(self):
        eng = FakeEngine(fetch_delay=0.2)
        b = DynamicBatcher(eng, max_batch=8)
        try:
            fut = b.submit(_mk(0), None, (1.5, 1.5), (0, 0), (16, 12))
            fut.result(timeout=10)
            # the watcher thread fetches the result without any consumer
            assert eng.outputs[0].fetched.wait(timeout=5)
            deadline = time.monotonic() + 5
            while time.monotonic() < deadline:
                with b._cv:
                    if b._inflight == 0:
                        break
                time.sleep(0.01)
            assert b._inflight == 0
        finally:
            b.stop()

    def test_small_max_batch_still_coalesces(self):
        # max_batch below the default min_fill: min_fill must clamp to
        # max_batch, else FULL batches dispatch as solos and coalescing
        # silently never engages (the regression the occupancy metric
        # exists to catch).
        eng = FakeEngine()
        b = DynamicBatcher(eng, max_batch=2)
        assert b.min_fill == 2
        b.ramp_solos = 0
        try:
            futs = _submit_locked(b, [_mk(i) for i in range(4)])
            res = _drain(futs)
            assert eng.dispatches == [('batch', 2)] * 2
            for i, (br, idx, _, _) in enumerate(res):
                np.testing.assert_array_equal(br.get()[idx], _mk(i))
        finally:
            b.stop()

    def test_full_batch_of_other_key_skips_minority_head(self):
        # device busy, a lone minority-shape request heads the queue and a
        # FULL batch of another shape is queued behind it: the full batch
        # must dispatch immediately (the head keeps FIFO priority within
        # its own shape), not wait out the arrival gap / in-flight drain.
        eng = FakeEngine(fetch_delay=1.0)
        b = DynamicBatcher(eng, max_batch=4, min_fill=2,
                           accumulate_gap_ms=2000.0)
        b.ramp_solos = 0
        try:
            # make the device busy first
            warm = b.submit(_mk(99), None, (1.5, 1.5), (0, 0), (16, 12))
            warm.result(timeout=10)
            a = _mk(0, shape=(16, 12))
            c = [_mk(10 + i, shape=(20, 12)) for i in range(4)]
            futs = _submit_locked(b, [a] + c)
            t0 = time.monotonic()
            deadline = t0 + 10
            while time.monotonic() < deadline:
                with eng._lock:
                    if ('batch', 4) in eng.dispatches:
                        break
                time.sleep(0.005)
            waited = time.monotonic() - t0
            assert ('batch', 4) in eng.dispatches
            # dispatched well before the 2 s gap or the 1 s fetch drain
            assert waited < 0.5, waited
            res = _drain(futs)
            for i, (br, idx, _, _) in enumerate(res[1:]):
                np.testing.assert_array_equal(br.get()[idx], c[i])
            br, idx, _, _ = res[0]
            np.testing.assert_array_equal(
                br.get()[0 if idx is None else idx], a)
        finally:
            b.stop()

    def test_arrival_pause_flushes_partial_as_solos(self):
        # device busy, 2 queued, arrivals stop: after accumulate_gap_ms the
        # queue flushes (as solos, below min_fill) instead of waiting for a
        # batch that will never fill.
        eng = FakeEngine(fetch_delay=1.0)
        b = DynamicBatcher(eng, max_batch=8, accumulate_gap_ms=40.0)
        b.ramp_solos = 1
        try:
            futs = _submit_locked(b, [_mk(i) for i in range(3)])
            t0 = time.monotonic()
            _drain(futs)
            took = time.monotonic() - t0
            assert eng.dispatches == [('solo', 1)] * 3
            # flushed after ~one gap, not after the 1 s fetch completes
            assert took < 0.9, took
        finally:
            b.stop()


class TestCancellation:
    def test_cancelled_future_skips_dispatch(self):
        eng = FakeEngine(fetch_delay=0.5)
        b = DynamicBatcher(eng, max_batch=8, min_fill=2)
        b.ramp_solos = 0
        try:
            with b._cv:
                futs = [b.submit(_mk(i), None, (1.5, 1.5), (0, 0), (16, 12))
                        for i in range(4)]
                assert futs[2].cancel()
            res = [f.result(timeout=10) for f in futs if not f.cancelled()]
            assert len(res) == 3
            for want, (br, idx, _, _) in zip([0, 1, 3], res):
                np.testing.assert_array_equal(br.get()[idx], _mk(want))
        finally:
            b.stop()


@pytest.mark.filterwarnings(
    'ignore::pytest.PytestUnhandledThreadExceptionWarning')
class TestElasticRestart:
    """A dispatcher that dies of an internal error restarts on the next
    submit (the reference only DETECTS dead workers; a resident server
    must also recover), with a crash-loop cap. (The dying dispatcher
    re-raises on purpose — threading.excepthook prints the traceback —
    which pytest reports as an unhandled thread exception: expected here.)"""

    @staticmethod
    def _kill_dispatcher(b):
        """Crash the dispatcher loop deterministically: poison _take_batch
        for exactly one call, then submit to wake it."""
        orig = b._take_batch
        def boom(cap=None):
            b._take_batch = orig
            raise RuntimeError('injected dispatcher fault')
        b._take_batch = boom
        fut = b.submit(_mk(99), None, (1.5, 1.5), (0, 0), (16, 12))
        with pytest.raises(RuntimeError, match='dispatcher died'):
            fut.result(timeout=10)
        b._thread.join(timeout=10)
        assert not b._thread.is_alive()

    def test_restart_after_crash_serves_again(self):
        eng = FakeEngine()
        b = DynamicBatcher(eng, max_batch=8)
        try:
            self._kill_dispatcher(b)
            # next submit restarts the dispatcher and gets served
            fut = b.submit(_mk(1), None, (1.5, 1.5), (0, 0), (16, 12))
            br, idx, _, _ = fut.result(timeout=10)
            np.testing.assert_array_equal(br.get()[0], _mk(1))
            assert b._crashes == 0  # healthy dispatch reset the budget
        finally:
            b.stop()

    def test_crash_loop_gives_up(self):
        eng = FakeEngine()
        b = DynamicBatcher(eng, max_batch=8)
        try:
            for _ in range(b.max_restarts):
                self._kill_dispatcher(b)
            with pytest.raises(RuntimeError, match='giving up'):
                b.submit(_mk(0), None, (1.5, 1.5), (0, 0), (16, 12))
        finally:
            b.stop()

    def test_user_stop_never_restarts(self):
        eng = FakeEngine()
        b = DynamicBatcher(eng, max_batch=8)
        assert b.stop()
        with pytest.raises(RuntimeError, match='stopped'):
            b.submit(_mk(0), None, (1.5, 1.5), (0, 0), (16, 12))

    def test_crash_with_inflight_watcher_keeps_counter_balanced(self):
        """A watcher thread from the crashed incarnation still holds +1 on
        _inflight; the restart must NOT zero the counter, or the stale
        decrement drives it negative forever (idle detection then misfires
        both ways)."""
        eng = FakeEngine(fetch_delay=0.6)
        b = DynamicBatcher(eng, max_batch=8)
        try:
            fut = b.submit(_mk(0), None, (1.5, 1.5), (0, 0), (16, 12))
            fut.result(timeout=10)   # dispatched; watcher still fetching
            self._kill_dispatcher(b)
            fut2 = b.submit(_mk(1), None, (1.5, 1.5), (0, 0), (16, 12))
            fut2.result(timeout=10)  # served by the restarted dispatcher
            deadline = time.monotonic() + 5
            while time.monotonic() < deadline and b._inflight != 0:
                time.sleep(0.05)
            assert b._inflight == 0, b._inflight  # -1 with the reset bug
        finally:
            b.stop()


class TestSplitFetch:
    """_BatchResult downloads large results as a FIXED number of
    concurrent contiguous-slab fetches (tools/perf_probe16/18.py: one
    tunnel stream moves ~16 MB/s, 2+ streams aggregate ~38 MB/s, and the
    whole-array fetch loses to split fetches 2-4x). Must be bit-identical
    to the whole fetch, must not trigger for small results, and must never
    fan out per-row (a solo output's axis 0 is the image height)."""

    def test_large_batch_split_is_bit_identical(self):
        import jax
        from totalsegmentator2d_tpu.inference.batching import _BatchResult

        rng = np.random.default_rng(3)
        arr = rng.integers(0, 255, (8, 600_001), dtype=np.uint8)  # 4.8 MB
        br = _BatchResult(jax.device_put(arr))
        out = br.get()
        assert out.dtype == np.uint8
        assert out.shape == arr.shape
        assert np.array_equal(out, arr)
        # fetch-once: second get returns the cached host copy
        assert br.get() is out

    def test_small_or_solo_results_fetch_whole(self):
        from totalsegmentator2d_tpu.inference.batching import _BatchResult

        class Spy(SlowArray):
            ndim, sliced = 2, False

            @property
            def shape(self):
                return self.arr.shape

            @property
            def nbytes(self):
                return self.arr.nbytes

            def __getitem__(self, key):
                type(self).sliced = True
                return super().__getitem__(key)

        small = Spy(np.ones((8, 16), np.uint8), 0.0)   # under threshold
        assert np.array_equal(_BatchResult(small).get(), small.arr)
        assert not Spy.sliced

    def test_solo_tall_result_splits_into_bounded_slabs(self):
        """A solo program output (axis 0 = image HEIGHT, not a batch) over
        the size threshold must split into at most _SPLIT_STREAMS contiguous
        slabs — never per-row (advisor r3: a tall solo result fanned out
        into hundreds of per-row tunnel RPCs, a latency regression in
        exactly the large-download case the split targets)."""
        from totalsegmentator2d_tpu.inference.batching import _BatchResult

        class Counting(SlowArray):
            ndim, slices = 2, 0

            @property
            def shape(self):
                return self.arr.shape

            @property
            def nbytes(self):
                return int(5_000_000)  # over the split threshold

            def __getitem__(self, key):
                type(self).slices += 1
                return super().__getitem__(key)

        arr = np.arange(600 * 40, dtype=np.uint8).reshape(600, 40)
        out = _BatchResult(Counting(arr, 0.0)).get()
        assert np.array_equal(out, arr)
        assert 2 <= Counting.slices <= _BatchResult._SPLIT_STREAMS, \
            Counting.slices

    def test_split_fetch_runs_streams_concurrently(self):
        from totalsegmentator2d_tpu.inference.batching import _BatchResult

        class BigSlow(SlowArray):
            ndim = 2

            @property
            def shape(self):
                return self.arr.shape

            @property
            def nbytes(self):
                return int(4_000_000)  # over the split threshold

        delay = 0.08
        arr = np.arange(8 * 32, dtype=np.uint8).reshape(8, 32)
        dev = BigSlow(arr, delay)
        t0 = time.perf_counter()
        out = _BatchResult(dev).get()
        dt = time.perf_counter() - t0
        assert np.array_equal(out, arr)
        # 8 rows x 0.08 s serial = 0.64 s; 4 streams bound it near 0.16
        assert dt < 8 * delay * 0.7, dt
