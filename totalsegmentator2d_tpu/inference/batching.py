"""Dynamic micro-batching for the fused ensemble engine.

Requests that arrive while the device is busy are stacked into ONE batched
program dispatch (a ``vmap`` of the per-scan fused program). Measured on the
tunneled v5e (tools/perf_probe5.py): a single torso-projection scan runs the
fused 2D program in ~98 ms (MFU ~12%) while 6 stacked scans run at
~48 ms/scan (MFU ~24%) — the per-dispatch fixed costs (RPC upload latency,
InstanceNorm reductions underfeeding the MXU at small batch) amortize across
the batch.

This is the TPU-native replacement for the reference's host process pool as
the production concurrency mechanism (`ParallelPredictor`, reference
predictor.py:42-96): instead of one resident predictor process per model fed
round-robin, concurrent requests coalesce into larger device batches on one
chip.

Batching policy: requests group by (cropped shape, spacing, masked-norm);
whatever is queued when the dispatcher frees goes out as one batch. Batches
are padded to either 1 or ``max_batch`` (repeating the last scan; padding
results are dropped) so each input shape compiles exactly two programs —
through a remote tunnel a compile costs seconds-to-minutes, so intermediate
bucket sizes are not worth their compile time. The batch size self-balances
under load: while a batch executes, new arrivals queue and ride the next one.
"""

from __future__ import annotations

import threading
from concurrent.futures import Future
from typing import List, Optional, Tuple

import numpy as np


class _BatchResult:
    """Fetch-once holder for a batched device output: the first consumer
    downloads the whole batch; the rest read the cached host copy.

    Large results download as CONCURRENT contiguous-slab fetches: through
    the remote tunnel a single device_get stream moves only ~16 MB/s while
    two-plus parallel streams aggregate ~38 MB/s, and split fetches beat
    the one whole-array fetch 2-4x (tools/perf_probe16/18.py) — the
    download wire is the pipeline floor there (probe14), so this halves
    it. The split is a FIXED number of index-range slabs along axis 0
    (never per-row: _BatchResult also wraps SOLO program outputs whose
    axis 0 is the image height, and a per-row fan-out there would turn one
    download into hundreds of tunnel RPCs). The slab slices are tiny async
    device programs whose dispatch overlaps the fetches themselves;
    np.concatenate of contiguous slabs is bit-identical to the whole-array
    fetch.

    With a ``compact`` layout (ensemble_engine._compact_pack — the default
    mask wire), the device value is a (buf, occupancy-bitmap) pair: the
    tiny bitmap (whose popcount sizes a bucketed PREFIX of the buffer)
    fetches concurrently with a speculative fetch of the bucket the last
    result of the same program needed (fetch_compact's hint), so only the
    prefix crosses the wire and a covering hint hides the bitmap
    round-trip entirely — sparse anatomy masks ship 4-15x fewer bytes.
    ``get`` still returns the plain packed (B, H, W, nB) / (H, W, nB)
    array, reconstructed bit-identically.
    """

    # below this, one fetch stream is fine (small-CT/X-ray batches whose
    # downloads are nowhere near the pipeline bound) and the extra slice
    # dispatches aren't worth their queue hops
    _SPLIT_MIN_BYTES = 1_000_000
    _SPLIT_STREAMS = 4

    def __init__(self, dev, compact: Optional[dict] = None):
        self._dev = dev
        self._compact = compact
        self._np: Optional[np.ndarray] = None
        self._lock = threading.Lock()

    def get(self) -> np.ndarray:
        with self._lock:
            if self._np is None:
                if self._compact is not None:
                    self._np = self._fetch_compacted()
                else:
                    self._np = self._fetch_split(self._dev)
                self._dev = None
        return self._np

    def _fetch_split(self, dev) -> np.ndarray:
        from .ensemble_engine import fetch_split
        return fetch_split(dev, min_bytes=self._SPLIT_MIN_BYTES,
                           streams=self._SPLIT_STREAMS)

    def _fetch_compacted(self) -> np.ndarray:
        from .ensemble_engine import fetch_compact, fetch_compact_batch
        buf, _ = self._dev
        if buf.ndim == 2:  # solo program output
            return fetch_compact(self._dev, self._compact)
        return fetch_compact_batch(self._dev, self._compact)


class DynamicBatcher:
    """Coalesces concurrent ``predict_array`` requests into batched device
    dispatches. One daemon dispatcher thread; submissions return futures
    resolving to ``(_BatchResult, index | None, bbox, full_shape)``.
    """

    def __init__(self, engine, max_batch: int = 8, linger_ms: float = 0.0,
                 accumulate_gap_ms: float = 50.0, min_fill: int = 4):
        if max_batch < 1:
            raise ValueError('max_batch must be >= 1')
        self.engine = engine
        self.max_batch = int(max_batch)
        # throughput knob (Triton's queue-delay analogue): when > 0 the
        # dispatcher holds a partial batch up to this long waiting for it to
        # fill — partial batches pad to max_batch and cost a full program
        # execution, so under sustained load a short linger trades a little
        # latency for near-2x throughput. Mutable at runtime. When 0 the
        # arrival-aware policy below applies instead.
        self.linger_ms = float(linger_ms)
        # arrival-aware coalescing (probe13): JAX dispatch is async —
        # device_put + the program call return in ~1-8 ms — so a dispatcher
        # that pops eagerly outruns any realistic arrival rate and every
        # request rides a SOLO program (24/24 solo observed in the pipelined
        # bench: ~97 ms/scan against the 43 ms/scan batch-8 device floor).
        # Batches only form if the dispatcher holds the queue while the
        # device is busy. Policy: device idle -> dispatch immediately (solo
        # latency unchanged); device busy -> accumulate while submissions
        # keep streaming in, dispatch when the head batch FILLS or arrivals
        # pause for accumulate_gap_ms. Program completion (tracked by a
        # watcher that pre-fetches the batch to host) is only the
        # idle-detection signal, never a dispatch gate — through the remote
        # tunnel completions lag far behind the device queue, and gating on
        # them starves stragglers (measured 152-186 ms/scan, worse than no
        # batching at all).
        self.accumulate_gap_ms = float(accumulate_gap_ms)
        # a padded partial batch costs the FULL max_batch program (~3.5x the
        # solo program for the torso shapes) no matter how few scans ride
        # it; below this occupancy, queued scans go out as individual solo
        # dispatches instead. Clamped to max_batch: otherwise a small
        # max_batch (< the default min_fill) would dispatch even FULL
        # batches as solos and coalescing could never engage.
        self.min_fill = max(1, min(int(min_fill), self.max_batch))
        # burst ramp: when the device comes off idle, the first dispatches
        # go out as solos even if a batch could form — the first results
        # (and the result-download wire, which IS the pipeline floor
        # through the remote tunnel, probe14) start moving at solo latency
        # instead of waiting a full batch-program behind the burst
        self.ramp_solos = 3
        self._ramp_left = 0
        self._inflight = 0
        self._last_submit = 0.0
        # occupancy accounting for /metrics: whether coalescing actually
        # engages under production load is invisible from latency alone
        # (probe13 found it silently never did) — count every dispatched
        # program by how many real scans rode it
        self._occupancy = [0] * self.max_batch
        # FIFO of (key, t_enqueued, item);
        # item = (cropped, mask, bbox, full, future)
        self._pending: List[Tuple[tuple, float, tuple]] = []
        self._cv = threading.Condition()
        self._stopped = False
        # elasticity: a dispatcher that died of an internal error (already
        # drained — its waiters got the exception) restarts transparently on
        # the next submit, up to this many consecutive failures; a
        # successful dispatch resets the budget. The reference only DETECTS
        # dead workers (predictor.py:207-229, wait() raises); a resident
        # server should also recover.
        self.max_restarts = 3
        self._crashes = 0          # consecutive (resets on a healthy dispatch)
        self._crashes_total = 0    # lifetime, for /metrics
        self._user_stopped = False
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name='ts2d-batcher')
        self._thread.start()

    def submit(self, cropped: np.ndarray, mask: Optional[np.ndarray],
               spacing, bbox, full, wire=None) -> Future:
        if wire is not None and not any(wire):
            wire = None
        key = (cropped.shape[:2],
               tuple(round(float(s), 6) for s in spacing),
               mask is not None,
               # scans on different int16 wires (ensemble_engine.wire_detect)
               # run different programs and must not co-batch
               wire)
        import time
        fut: Future = Future()
        item = (cropped, mask, bbox, full, fut)
        with self._cv:
            if self._user_stopped:
                raise RuntimeError('batcher is stopped')
            if self._stopped or not self._thread.is_alive():
                # the dispatcher died of an internal error (its waiters were
                # drained with that error); restart it rather than leaving
                # the engine permanently unserviceable — unless it is
                # crash-looping
                if self._crashes >= self.max_restarts:
                    raise RuntimeError(
                        f'batcher dispatcher died {self._crashes} '
                        f'consecutive times; giving up (see prior errors)')
                from ..utils.logging import warn
                warn(f'batcher dispatcher died; restarting '
                     f'({self._crashes}/{self.max_restarts} consecutive '
                     f'failures)')
                self._stopped = False
                # _inflight is deliberately NOT reset: watcher threads from
                # the crashed incarnation still hold +1 each and decrement
                # when their fetches finish — zeroing here would let their
                # decrements drive the counter negative forever (idle
                # detection would then misfire both ways)
                self._ramp_left = 0
                self._thread = threading.Thread(target=self._run, daemon=True,
                                                name='ts2d-batcher')
                self._thread.start()
            self._pending.append((key, time.monotonic(), item))
            self._last_submit = time.monotonic()
            self._cv.notify()
        return fut

    def stats(self) -> dict:
        """Dispatch-occupancy counters: ``occupancy[i]`` programs carried
        ``i+1`` real scans. Derived totals make the batching behavior
        observable at /metrics (serve.py)."""
        with self._cv:
            occ = list(self._occupancy)
            crashes = self._crashes_total
        programs = sum(occ)
        scans = sum((i + 1) * c for i, c in enumerate(occ))
        return {
            'batch_occupancy': occ,
            'batch_programs': programs,
            'batch_scans': scans,
            'batch_scans_coalesced': scans - occ[0] if occ else 0,
            'batch_mean_occupancy': (scans / programs) if programs else 0.0,
            'batch_dispatcher_crashes': crashes,
        }

    def stop(self, timeout: float = 10.0) -> bool:
        """Signal the dispatcher to drain and wait for it to exit.

        :returns: True when the dispatcher actually exited. False means the
            join timed out — a dispatch can sit in a seconds-to-minutes
            remote XLA compile — and the daemon thread is still running;
            callers dropping their engine reference should know the orphan
            exists (it dies with the process, but can race interpreter
            shutdown)."""
        with self._cv:
            self._stopped = True
            self._user_stopped = True
            self._cv.notify()
        self._thread.join(timeout=timeout)
        if self._thread.is_alive():
            from ..utils.logging import warn
            warn(f'batcher dispatcher still running after {timeout:.0f}s '
                 f'stop timeout (likely mid-compile); it will exit after '
                 f'the in-flight dispatch completes')
            return False
        return True

    # -- dispatcher ----------------------------------------------------------

    def _take_batch(self, cap: Optional[int] = None):
        """Pop the oldest request plus every queued request with the same
        (shape, spacing, masked) key, up to ``cap`` (default max_batch).
        Caller holds _cv."""
        key = self._pending[0][0]
        cap = self.max_batch if cap is None else cap
        take, rest = [], []
        for entry in self._pending:
            if entry[0] == key and len(take) < cap:
                take.append(entry[2])
            else:
                rest.append(entry)
        self._pending = rest
        return key, take

    def _full_key(self):
        """First request key with a full batch pending, else None. The
        fullness criterion for every dispatcher policy (linger, ramp
        cancel, accumulate) lives here so they cannot silently diverge.
        Caller holds the lock."""
        counts: dict = {}
        for k, _, _ in self._pending:
            counts[k] = counts.get(k, 0) + 1
            if counts[k] >= self.max_batch:
                return k
        return None

    def _run(self):
        try:
            self._loop()
        except BaseException as ex:  # dispatcher is dying: fail all waiters
            with self._cv:
                # mark stopped FIRST so a concurrent submit() cannot slip an
                # item in after the drain (the thread still reads as alive
                # until this except block finishes)
                self._stopped = True
                self._crashes += 1
                self._crashes_total += 1
                pending, self._pending = self._pending, []
            for _, _, (*_, fut) in pending:
                if not fut.done():
                    fut.set_exception(
                        RuntimeError(f'batcher dispatcher died: {ex!r}'))
            raise

    def _loop(self):
        import time
        while True:
            with self._cv:
                while not self._pending and not self._stopped:
                    self._cv.wait()
                if not self._pending:
                    return  # stopped and drained
                linger = self.linger_ms / 1e3
                if linger > 0 and not self._stopped:
                    # wait for the OLDEST request's own batch to fill. The
                    # deadline is anchored at that request's ENQUEUE time —
                    # re-arming it per iteration would let sustained
                    # majority-shape traffic postpone a minority request
                    # indefinitely (each full batch would reset the clock).
                    # A full batch of another shape may dispatch first, but
                    # once the oldest request's deadline expires it goes
                    # out (partial) no matter what else is ready.
                    key0, t0, _ = self._pending[0]
                    deadline = t0 + linger

                    def _mine():
                        return sum(1 for k, _, _ in self._pending
                                   if k == key0)

                    while (_mine() < self.max_batch
                           and self._full_key() is None
                           and not self._stopped):
                        remaining = deadline - time.monotonic()
                        if remaining <= 0:
                            break
                        self._cv.wait(timeout=remaining)
                    full = self._full_key()
                    if (full is not None and full != key0
                            and time.monotonic() < deadline):
                        # a ready-full batch of another shape goes first;
                        # key0 keeps its original deadline for next round
                        self._pending.sort(key=lambda e: e[0] != full)
                take_cap = None
                if linger <= 0 and not self._stopped:
                    if self._ramp_left <= 0 and self._inflight == 0:
                        # device went idle: a fresh burst begins
                        self._ramp_left = self.ramp_solos
                    if self._ramp_left > 0:
                        # adaptive ramp (round 4): the burst ramp exists to
                        # get FIRST results moving at solo latency when
                        # arrivals trickle in — not to throttle a stream.
                        # When a full batch of one shape is already queued,
                        # the caller is submitting faster than solos retire
                        # and ramp solos only burn device time (~3.5x the
                        # per-scan cost of riding the batch; the compacted
                        # mask wire removed the old start-the-download-
                        # wire-early rationale, probe14 vs round 4). Cancel
                        # the ramp and ride the batch.
                        if self._full_key() is not None:
                            self._ramp_left = 0
                    if self._ramp_left > 0:
                        self._ramp_left -= 1
                        take_cap = 1
                    else:
                        # arrival-aware coalescing (see __init__): while
                        # the device is busy and submissions keep streaming
                        # in, hold the queue so it fills; dispatch on a
                        # full head batch or an arrival pause
                        gap = self.accumulate_gap_ms / 1e3
                        cnt = 0
                        while not self._stopped and self._pending:
                            head = self._pending[0][0]
                            cnt = sum(1 for k, _, _ in self._pending
                                      if k == head)
                            if (cnt >= self.max_batch
                                    or self._inflight == 0
                                    or self._full_key() is not None):
                                break
                            since = time.monotonic() - self._last_submit
                            if since >= gap:
                                break
                            self._cv.wait(timeout=gap - since + 1e-3)
                        if not self._pending:
                            continue
                        full = self._full_key()
                        if full is not None and full != self._pending[0][0]:
                            # a ready-full batch of another key must not
                            # wait behind a minority-shape head: under
                            # mixed-shape streaming arrivals neither break
                            # above would fire for the head's own batch and
                            # the device would idle on a full queue. Stable
                            # sort preserves FIFO within each key; the head
                            # request keeps its place among its own key for
                            # the next round.
                            self._pending.sort(key=lambda e: e[0] != full)
                            cnt = self.max_batch
                        if cnt < self.min_fill:
                            # a padded partial batch costs the full
                            # max_batch program; this few scans run
                            # cheaper as solos
                            take_cap = 1
                key, take = self._take_batch(take_cap)
            try:
                self._dispatch(key, take)
                with self._cv:
                    self._crashes = 0  # healthy dispatch: reset the budget
            except BaseException as ex:  # surface to every waiting caller
                for *_, fut in take:
                    if not fut.done():
                        fut.set_exception(ex)
                if not isinstance(ex, Exception):
                    raise  # fatal (KeyboardInterrupt/SystemExit): die loudly

    def _track(self, br: _BatchResult) -> None:
        """Count a dispatched program against the in-flight cap and watch
        for its completion from a side thread. The watcher's signal is the
        actual host fetch (``br.get``) — ``block_until_ready`` returns
        early through the remote tunnel — which doubles as a download
        pre-fetch: by the time a consumer reads the result, the transfer
        has already happened."""
        with self._cv:
            self._inflight += 1

        def watch():
            try:
                br.get()
            except BaseException:
                pass  # the consumer surfaces fetch errors on its own read
            finally:
                with self._cv:
                    self._inflight -= 1
                    self._cv.notify()

        threading.Thread(target=watch, daemon=True,
                         name='ts2d-batch-watch').start()

    def _dispatch(self, key, take):
        import jax
        from .ensemble_engine import _wire_pack
        engine = self.engine
        _, spacing, has_mask, wire = key
        # claim every future before doing work: a caller that cancelled its
        # handle (e.g. a timed-out request) must neither receive a result
        # nor poison its co-batched siblings with InvalidStateError
        take = [it for it in take if it[-1].set_running_or_notify_cancel()]
        if not take:
            return
        B = len(take)
        if B == 1:
            # reuse the single-scan program (no extra compile for the
            # sequential / low-load case)
            cropped, mask, bbox, full, fut = take[0]
            fn, meta = engine._serving_program(cropped.shape[:2], spacing,
                                               wire)
            args = (engine.params, jax.device_put(_wire_pack(cropped, wire)))
            if mask is not None:
                args += (jax.device_put(mask),)
            br = _BatchResult(fn(*args), compact=meta.get('compact'))
            self._track(br)
            with self._cv:
                self._occupancy[0] += 1
            fut.set_result((br, None, bbox, full))
            return
        # batched-program numerics differ from the solo program's (borderline
        # sigmoid pixels, ~0.06% measured; docs/performance.md): tell the
        # user once when coalescing actually kicks in so load-dependent
        # outputs are not a surprise
        from ..utils.logging import log
        log(f'micro-batching engaged ({B} concurrent scans coalesced into '
            f'one device program); results may differ from solo runs on '
            f'borderline pixels — use batching=False / --no-batching for '
            f'bitwise reproducibility', once=True)
        fnb, meta = engine._batched_program(
            self.max_batch, take[0][0].shape[:2], spacing, has_mask, wire)
        compact = meta.get('compact')
        pad = self.max_batch - B
        stacked = np.stack([it[0] for it in take] + [take[-1][0]] * pad)
        if wire is not None:
            xb = _wire_pack(stacked, wire)  # splits along the channel axis
        else:
            xb = stacked
        args = (engine.params, jax.device_put(xb))
        if has_mask:
            mb = np.stack([it[1] for it in take] + [take[-1][1]] * pad)
            args += (jax.device_put(mb),)
        out = fnb(*args)
        if B < self.max_batch:
            # drop the padding rows on DEVICE before the host fetch: the
            # tunnel's ~20 MB/s download bandwidth is the pipeline floor
            # (probe14), and a padded batch would ship max_batch/B x the
            # mask bytes. The slice is a tiny cached device program.
            out = (tuple(o[:B] for o in out) if compact is not None
                   else out[:B])
        br = _BatchResult(out, compact=compact)
        self._track(br)
        with self._cv:
            self._occupancy[B - 1] += 1
        for i, (_, _, bbox, full, fut) in enumerate(take):
            fut.set_result((br, i, bbox, full))
