"""Profiling/observability: jax.profiler traces + step timing.

The reference's only instrumentation is wall-clock prints
(ref: /root/reference/scripts/train_BCD.py:187,217-218). Here:

- ``trace_context`` wraps a region in a jax.profiler trace (viewable in
  XProf/TensorBoard) for kernel-level TPU timing;
- ``StepTimer`` measures steady-state steps/sec with device sync, skipping
  compile steps.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace_context(logdir: Optional[str]):
    if logdir:
        jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        if logdir:
            jax.profiler.stop_trace()


class WindowTracer:
    """Trace a fixed window of training steps into ``logdir``.

    ``tick(i)`` before step ``i`` starts the jax.profiler trace at
    ``start`` and stops it at ``start + n`` (so steps [start, start+n) are
    captured, skipping compile iterations). One window per run; inert when
    ``logdir`` is falsy. ``close()`` stops a window the loop never finished
    (short epochs, exceptions)."""

    def __init__(self, logdir: Optional[str], start: int = 10, n: int = 5):
        self.logdir = logdir
        self.start = start
        self.end = start + n
        self._on = False
        self._done = False

    def tick(self, i: int) -> None:
        if not self.logdir or self._done:
            return
        if not self._on and i >= self.start:
            jax.profiler.start_trace(self.logdir)
            self._on = True
        elif self._on and i >= self.end:
            self._stop()

    def _stop(self) -> None:
        jax.profiler.stop_trace()
        self._on = False
        self._done = True

    def close(self) -> None:
        if self._on:
            self._stop()


class StepTimer:
    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.count = 0
        self.total = 0.0
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None):
        """Call with the step's output to block on it before timing."""
        if result is not None:
            jax.block_until_ready(result)
        dt = time.perf_counter() - self._t0
        self.count += 1
        if self.count > self.warmup:
            self.total += dt
        return dt

    @property
    def mean_step_time(self) -> float:
        n = max(self.count - self.warmup, 1)
        return self.total / n
