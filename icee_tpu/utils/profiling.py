"""Tracing / profiling subsystem.

The reference has none — only wall-clock ``AverageMeter`` batch timing
(``utils.py:93-111``; SURVEY.md §5 flags this as a gap to fill).  Here:

- :func:`trace` — context manager around ``jax.profiler`` emitting an XLA
  trace viewable in TensorBoard/Perfetto (device timeline, fusion view),
- :class:`StepTimer` — cheap steady-state step timing with warmup discard
  and percentile summary, for regression tracking in logs.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str, enabled: bool = True) -> Iterator[None]:
    """``with trace("/tmp/trace"):`` profiles everything inside."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Per-step wall-clock stats (discarding compile/warmup steps)."""

    def __init__(self, warmup: int = 2) -> None:
        self.warmup = warmup
        self._times: list = []
        self._seen = 0
        self._t0: Optional[float] = None

    def __enter__(self) -> "StepTimer":
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc) -> None:
        dt = time.perf_counter() - self._t0
        self._seen += 1
        if self._seen > self.warmup:
            self._times.append(dt)

    def summary(self) -> dict:
        if not self._times:
            return {"steps": 0}
        arr = np.asarray(self._times)
        return {
            "steps": len(arr),
            "mean_ms": float(arr.mean() * 1000),
            "p50_ms": float(np.percentile(arr, 50) * 1000),
            "p95_ms": float(np.percentile(arr, 95) * 1000),
        }
