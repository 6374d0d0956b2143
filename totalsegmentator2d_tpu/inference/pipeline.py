"""ScanPipeline: pipelined multi-case throughput mode.

The reference processes cases strictly sequentially (main.py:79-81) while its
worker processes idle between tasks. Here host stages overlap with device
execution: a reader thread prefetches upcoming cases, the main thread
dispatches predictions without blocking (TS2D.predict_async) keeping up to
``in_flight`` scans queued on the device — where the fused engine's
micro-batcher coalesces them into batched programs (inference/batching.py)
— and save workers export results in the background. Steady-state
throughput approaches max(device time, IO time) instead of their sum.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, List, Optional, Tuple

from ..io import read_image
from ..utils.logging import log, warn
from ..utils.trace import StageTimer
from .runner import AsyncRunner


class ScanPipeline:
    """Drive `tool.predict` over many cases with IO prefetch + async save.

    :param tool: a TS2D instance (or anything with .predict(img, collapse=...))
    :param prefetch: how many cases to read ahead
    :param save_workers: background export threads
    """

    def __init__(self, tool, prefetch: int = 2, save_workers: int = 2,
                 in_flight: int = 8):
        self.tool = tool
        self.prefetch = max(1, int(prefetch))
        # dispatched-but-unfinished predictions to keep queued on the
        # device: with the fused engine they coalesce into micro-batched
        # programs (inference/batching.py); 8 matches the engine's
        # max_batch. Tools without predict_async degrade to 1 (blocking).
        self.in_flight = max(1, int(in_flight))
        self._saver = AsyncRunner(num_workers=max(1, int(save_workers)),
                                  name='ts2d-save')

    def run(self, cases: Iterable[Tuple[str, str]], *,
            collapse: bool = False,
            on_result: Optional[Callable] = None,
            save_kwargs: Optional[dict] = None,
            progress: bool = True) -> List[StageTimer]:
        """Process (name, path) cases. When ``save_kwargs`` is given, each
        result is exported asynchronously via Result.save(name=name,
        **save_kwargs); ``on_result(name, result)`` runs on the main thread.
        Returns per-case stage timers."""
        cases = list(cases)
        q: 'queue.Queue' = queue.Queue(maxsize=self.prefetch)
        timers: List[StageTimer] = []

        def reader():
            for name, path in cases:
                timer = StageTimer(name)
                try:
                    img = read_image(path)
                    timer.mark('read')
                    q.put((name, img, timer, None))
                except BaseException as ex:
                    q.put((name, None, timer, ex))
            q.put(None)

        t = threading.Thread(target=reader, daemon=True, name='ts2d-reader')
        t.start()
        self._saver.start()

        n = len(cases)
        done = 0
        save_futures = []
        # dispatched-but-unfinished predictions, finished in dispatch order
        from collections import deque
        pending: 'deque' = deque()
        has_async = hasattr(self.tool, 'predict_async')
        # a window only helps when dispatch is actually non-blocking:
        # TS2D.supports_async says whether predict_async really dispatches
        # (fused engine) or degrades to a completed blocking predict —
        # queueing 8 finished Results (each holding its input volume) would
        # just hold memory and delay exports
        truly_async = has_async and getattr(self.tool, 'supports_async', True)
        window = self.in_flight if truly_async else 1

        def finish_one():
            name, handle, timer = pending.popleft()
            try:
                res = (self.tool.finish_predict(handle) if has_async
                       else handle)
            except Exception as ex:
                # one bad case must not kill the batch (read failures are
                # already survivable; predict failures match)
                warn(f'Failed to predict case {name}: {ex}')
                timers.append(timer)
                return
            timer.mark('predict')
            if save_kwargs is not None:
                save_futures.append(
                    (name, self._saver.submit(
                        self._save, res, name, dict(save_kwargs),
                        timer, task_id=f'save-{name}')))
            if on_result is not None:
                on_result(name, res)
            timers.append(timer)

        try:
            while True:
                item = q.get()
                if item is None:
                    break
                name, img, timer, err = item
                done += 1
                if err is not None:
                    warn(f'Failed to read case {name}: {err}')
                    timers.append(timer)
                    continue
                if progress:
                    log(f'[{done}/{n}] Processing: {name}')
                try:
                    handle = (self.tool.predict_async(img, collapse=collapse)
                              if has_async
                              else self.tool.predict(img, collapse=collapse))
                except Exception as ex:
                    warn(f'Failed to predict case {name}: {ex}')
                    timers.append(timer)
                    continue
                timer.mark('dispatch')
                pending.append((name, handle, timer))
                # drain only past the window: `>=` would cap the in-flight
                # count at window-1 and the micro-batcher could never see a
                # full batch
                while len(pending) > window:
                    finish_one()
            while pending:
                finish_one()
            self._saver.wait()
            for name, fut in save_futures:
                exc = fut.exception() if fut.done() else None
                if exc is not None:
                    warn(f'Failed to save case {name}: {exc}')
        finally:
            self._saver.stop()
        return timers

    @staticmethod
    def _save(res, name: str, save_kwargs: dict, timer: StageTimer) -> None:
        res.save(name=name, **save_kwargs)
        timer.mark('saved')
