"""AsyncRunner: host-side task-parallel serving.

TPU-native counterpart of the reference's ParallelPredictor
(predictor.py:15-229). The reference spawns torch worker *processes* (CUDA
context isolation) and ships images through temp files; on TPU the device is
shared and dispatch is async, so the right construct is a host *thread* pool
feeding the resident engine: threads overlap file IO / preprocessing with
device execution, and the single XLA stream serializes device work.

Capability parity with the reference:
 - start/predict/wait/stop lifecycle with non-blocking submission
 - 'startup' warmup tasks (engine compile) before serving
 - liveness/failure detection: a dead worker thread fails its queued tasks
   instead of hanging callers (predictor.py:120-162's liveness check)
 - graceful stop with poison pills + timeout (predictor.py:164-189)
"""

from __future__ import annotations

import collections
import queue
import threading
import traceback
from concurrent.futures import Future
from typing import Callable, Dict, List, Optional

from ..utils.logging import warn
from ..utils.trace import StageTimer


class Task:
    def __init__(self, task_id: str, fn: Callable, args: tuple, kwargs: dict):
        self.id = task_id
        self.fn = fn
        self.args = args
        self.kwargs = kwargs
        self.future: Future = Future()
        self.timer = StageTimer(task_id)


class AsyncRunner:
    def __init__(self, num_workers: int = 1, name: str = 'ts2d'):
        self._num_workers = max(1, int(num_workers))
        self._name = name
        # holds Task objects and ('pill', generation) poison pills
        self._queue: 'queue.Queue[object]' = queue.Queue()
        self._threads: List[threading.Thread] = []
        self._tasks: Dict[str, Task] = {}
        # completed tasks drop their payloads immediately (a long batch run
        # must not retain every result); only recent timers are kept
        self._recent_timers: 'collections.OrderedDict[str, dict]' = \
            collections.OrderedDict()
        # RLock: Future.cancel() in stop() runs the done-callback
        # synchronously while the lock is already held
        self._lock = threading.RLock()
        self._stopping = threading.Event()
        self._counter = 0
        # worker generation: poison pills carry the generation they were
        # issued for, so pills left unconsumed by a stop() (a worker that
        # exited via the abort flag instead) cannot kill the NEXT
        # generation's workers on a restart
        self._gen = 0

    # -- lifecycle -----------------------------------------------------------

    def start(self, warmup: Optional[Callable] = None, wait: bool = False):
        """Spin up workers; ``warmup`` (e.g. engine compile) runs once per
        worker before it serves tasks."""
        if self._threads:
            return self
        self._stopping.clear()
        self._gen += 1
        for i in range(self._num_workers):
            t = threading.Thread(target=self._worker,
                                 args=(i, warmup, self._gen),
                                 name=f'{self._name}-worker-{i}', daemon=True)
            t.start()
            self._threads.append(t)
        if wait and warmup is not None:
            self.submit(lambda: None).result()
        return self

    def _worker(self, idx: int, warmup: Optional[Callable], gen: int):
        try:
            if warmup is not None:
                warmup()
        except Exception:
            traceback.print_exc()
            warn(f'{self._name}-worker-{idx} failed during warmup')
            # keep serving: per-task errors surface on their futures
        while not self._stopping.is_set():
            if self._gen != gen:
                # a stop() timed out while this worker was mid-task and a
                # new generation has started: this thread is no longer in
                # _threads (alive()/stop() see only the replacements) and
                # its own pill was already discarded as stale — exit
                # instead of competing with the new workers forever
                break
            try:
                task = self._queue.get(timeout=0.1)
            except queue.Empty:
                continue
            if isinstance(task, tuple):  # poison pill ('pill', gen)
                if task[1] >= gen:
                    break
                continue  # stale pill a previous generation never ate
            # move the future to RUNNING: from here cancel() fails instead
            # of succeeding on an in-flight task (which would make the
            # set_result below raise InvalidStateError and kill the worker)
            if not task.future.set_running_or_notify_cancel():
                continue  # cancelled while queued
            task.timer.mark('get')
            try:
                result = task.fn(*task.args, **task.kwargs)
                task.timer.mark('done')
                task.future.set_result(result)
            except BaseException as ex:
                task.timer.mark('failed')
                task.future.set_exception(ex)

    def submit(self, fn: Callable, *args, task_id: Optional[str] = None,
               **kwargs) -> Future:
        if not self._threads:
            self.start()
        if not self.alive():
            raise RuntimeError(f'{self._name}: all workers are dead')
        with self._lock:
            self._counter += 1
            tid = task_id or f'task{self._counter}'
        task = Task(tid, fn, args, kwargs)
        with self._lock:
            self._tasks[tid] = task

        def _on_done(_fut, tid=tid, timer=task.timer):
            with self._lock:
                self._tasks.pop(tid, None)
                self._recent_timers[tid] = dict(timer.marks)
                while len(self._recent_timers) > 256:
                    self._recent_timers.popitem(last=False)

        task.future.add_done_callback(_on_done)
        self._queue.put(task)
        return task.future

    def wait(self, timeout: Optional[float] = None) -> None:
        """Block until all submitted tasks completed. Raises if workers died
        with tasks pending (the reference's liveness failure,
        predictor.py:149-158)."""
        import time as _time
        deadline = None if timeout is None else _time.monotonic() + timeout
        while True:
            with self._lock:
                pending = [t for t in self._tasks.values()
                           if not t.future.done()]
            if not pending:
                return
            if not self.alive():
                for t in pending:
                    if not t.future.done():
                        t.future.set_exception(
                            RuntimeError('worker died with tasks pending'))
                raise RuntimeError(
                    f'{self._name}: all workers died with '
                    f'{len(pending)} tasks pending')
            if deadline is not None and _time.monotonic() > deadline:
                raise TimeoutError(f'{len(pending)} tasks still pending')
            _time.sleep(0.01)

    def alive(self) -> bool:
        return any(t.is_alive() for t in self._threads)

    def stop(self, timeout: float = 10.0) -> None:
        """Graceful stop: poison pills, then abort flag."""
        for _ in self._threads:
            self._queue.put(('pill', self._gen))
        for t in self._threads:
            t.join(timeout / max(len(self._threads), 1))
        self._stopping.set()
        still = [t for t in self._threads if t.is_alive()]
        if still:
            warn(f'{self._name}: {len(still)} workers did not stop in time')
        self._threads = []
        with self._lock:
            # snapshot: cancel() runs _on_done synchronously (RLock), which
            # pops from _tasks — iterating the live dict would RuntimeError
            for task in list(self._tasks.values()):
                if not task.future.done():
                    # queued tasks cancel; RUNNING ones (cancel() False)
                    # finish in their worker and resolve normally
                    task.future.cancel()
            self._tasks.clear()

    def timestamps(self, task_id: str) -> Optional[Dict[str, float]]:
        with self._lock:
            task = self._tasks.get(task_id)
            if task is not None:
                return dict(task.timer.marks)
            return (dict(self._recent_timers[task_id])
                    if task_id in self._recent_timers else None)

    def __enter__(self):
        return self.start()

    def __exit__(self, exc_type, exc_val, exc_tb):
        self.stop()
