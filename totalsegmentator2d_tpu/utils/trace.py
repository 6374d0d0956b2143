"""Stage timing and profiler hooks.

The reference records per-task wall-clock timestamps
(PredictTask.timestamps: start/get/preprocessed/predicted/exported/done,
prediction_worker.py:57-72) and prints a report. StageTimer reproduces that;
`device_trace` adds what the reference never had: a real device profile via
jax.profiler, viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

from .logging import log


class StageTimer:
    """Ordered wall-clock stage marks with deltas, like the reference's
    PredictTask timestamp report."""

    def __init__(self, name: str = 'task'):
        self.name = name
        self.marks: Dict[str, float] = {}
        self.mark('start')

    def mark(self, stage: str) -> None:
        self.marks[stage] = time.perf_counter()

    @contextlib.contextmanager
    def stage(self, name: str):
        try:
            yield
        finally:
            self.mark(name)

    def deltas(self) -> Dict[str, float]:
        items = list(self.marks.items())
        return {b[0]: b[1] - a[1] for a, b in zip(items, items[1:])}

    def total(self) -> float:
        vals = list(self.marks.values())
        return vals[-1] - vals[0] if len(vals) > 1 else 0.0

    def report(self) -> str:
        parts = [f'{k}: {v * 1000:.1f}ms' for k, v in self.deltas().items()]
        return f'[{self.name}] ' + ', '.join(parts) + \
            f' | total {self.total() * 1000:.1f}ms'

    def log(self) -> None:
        log(self.report())


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]):
    """jax.profiler trace context; no-op when log_dir is falsy."""
    if not log_dir:
        yield
        return
    import jax
    with jax.profiler.trace(log_dir):
        yield
