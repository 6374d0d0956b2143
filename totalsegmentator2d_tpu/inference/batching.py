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
    downloads the whole batch; the rest read the cached host copy."""

    def __init__(self, dev):
        self._dev = dev
        self._np: Optional[np.ndarray] = None
        self._lock = threading.Lock()

    def get(self) -> np.ndarray:
        with self._lock:
            if self._np is None:
                import jax
                self._np = np.asarray(jax.device_get(self._dev))
                self._dev = None
        return self._np


class DynamicBatcher:
    """Coalesces concurrent ``predict_array`` requests into batched device
    dispatches. One daemon dispatcher thread; submissions return futures
    resolving to ``(_BatchResult, index | None, bbox, full_shape)``.
    """

    def __init__(self, engine, max_batch: int = 8, linger_ms: float = 0.0):
        if max_batch < 1:
            raise ValueError('max_batch must be >= 1')
        self.engine = engine
        self.max_batch = int(max_batch)
        # throughput knob (Triton's queue-delay analogue): when > 0 the
        # dispatcher holds a partial batch up to this long waiting for it to
        # fill — partial batches pad to max_batch and cost a full program
        # execution, so under sustained load a short linger trades a little
        # latency for near-2x throughput. Mutable at runtime.
        self.linger_ms = float(linger_ms)
        # FIFO of (key, item); item = (cropped, mask, bbox, full, future)
        self._pending: List[Tuple[tuple, tuple]] = []
        self._cv = threading.Condition()
        self._stopped = False
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name='ts2d-batcher')
        self._thread.start()

    def submit(self, cropped: np.ndarray, mask: Optional[np.ndarray],
               spacing, bbox, full) -> Future:
        key = (cropped.shape[:2],
               tuple(round(float(s), 6) for s in spacing),
               mask is not None)
        fut: Future = Future()
        item = (cropped, mask, bbox, full, fut)
        with self._cv:
            if self._stopped:
                raise RuntimeError('batcher is stopped')
            if not self._thread.is_alive():
                # a dead dispatcher would leave this future unresolved
                # forever (the caller blocks in fut.result())
                raise RuntimeError('batcher dispatcher thread died')
            self._pending.append((key, item))
            self._cv.notify()
        return fut

    def stop(self, timeout: float = 10.0) -> None:
        with self._cv:
            self._stopped = True
            self._cv.notify()
        self._thread.join(timeout=timeout)

    # -- dispatcher ----------------------------------------------------------

    def _take_batch(self):
        """Pop the oldest request plus every queued request with the same
        (shape, spacing, masked) key, up to max_batch. Caller holds _cv."""
        key = self._pending[0][0]
        take, rest = [], []
        for k, it in self._pending:
            if k == key and len(take) < self.max_batch:
                take.append(it)
            else:
                rest.append((k, it))
        self._pending = rest
        return key, take

    def _run(self):
        try:
            self._loop()
        except BaseException as ex:  # dispatcher is dying: fail all waiters
            with self._cv:
                # mark stopped FIRST so a concurrent submit() cannot slip an
                # item in after the drain (the thread still reads as alive
                # until this except block finishes)
                self._stopped = True
                pending, self._pending = self._pending, []
            for _, (*_, fut) in pending:
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
                    # wait for the OLDEST request's own batch to fill —
                    # counting total pending across keys would end the
                    # linger on unrelated-shape traffic and dispatch the
                    # partial batch anyway. But if ANY key fills, stop
                    # waiting: a ready-full batch of another shape must not
                    # absorb the partial batch's linger latency.
                    key0 = self._pending[0][0]
                    deadline = time.monotonic() + linger

                    def _full_key_ready():
                        counts: dict = {}
                        for k, _ in self._pending:
                            counts[k] = counts.get(k, 0) + 1
                            if counts[k] >= self.max_batch:
                                return True
                        return False

                    def _mine():
                        return sum(1 for k, _ in self._pending if k == key0)

                    while (_mine() < self.max_batch and not _full_key_ready()
                           and not self._stopped):
                        remaining = deadline - time.monotonic()
                        if remaining <= 0:
                            break
                        self._cv.wait(timeout=remaining)
                    # dispatch whichever batch is ready first
                    if self._pending and _full_key_ready() \
                            and _mine() < self.max_batch:
                        counts = {}
                        for k, _ in self._pending:
                            counts[k] = counts.get(k, 0) + 1
                        for k, n in counts.items():
                            if n >= self.max_batch:
                                self._pending.sort(
                                    key=lambda ki: ki[0] != k)
                                break
                key, take = self._take_batch()
            try:
                self._dispatch(key, take)
            except Exception as ex:  # surface to every waiting caller
                for *_, fut in take:
                    if not fut.done():
                        fut.set_exception(ex)

    def _dispatch(self, key, take):
        import jax
        engine = self.engine
        _, spacing, has_mask = key
        B = len(take)
        if B == 1:
            # reuse the single-scan program (no extra compile for the
            # sequential / low-load case)
            cropped, mask, bbox, full, fut = take[0]
            fn, _ = engine._program(cropped.shape[:2], spacing)
            args = (engine.params, jax.device_put(cropped))
            if mask is not None:
                args += (jax.device_put(mask),)
            fut.set_result((_BatchResult(fn(*args)), None, bbox, full))
            return
        fnb = engine._batched_program(self.max_batch, take[0][0].shape[:2],
                                      spacing, has_mask)
        pad = self.max_batch - B
        xb = np.stack([it[0] for it in take] + [take[-1][0]] * pad)
        args = (engine.params, jax.device_put(xb))
        if has_mask:
            mb = np.stack([it[1] for it in take] + [take[-1][1]] * pad)
            args += (jax.device_put(mb),)
        br = _BatchResult(fnb(*args))
        for i, (_, _, bbox, full, fut) in enumerate(take):
            fut.set_result((br, i, bbox, full))
