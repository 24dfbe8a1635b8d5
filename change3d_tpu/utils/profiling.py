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
