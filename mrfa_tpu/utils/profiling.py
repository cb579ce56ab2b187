"""Tracing / profiling / numerical-debug subsystem.

The reference has no tracing or sanitizers (SURVEY §5) — only tqdm progress.
This module adds the TPU-native equivalents:
  - `trace(logdir)`: jax.profiler trace context (view in TensorBoard /
    Perfetto) around any region,
  - `StepTimer`: wall-clock step-time and throughput accounting with warmup
    skipping (compile excluded),
  - `debug_nans(enable)`: toggles jax_debug_nans so the first NaN raises with
    the failing primitive's location,
  - `annotate(name)`: named trace spans visible in the profiler timeline.
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a profiler trace of the enclosed region into `logdir`."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span shown in the profiler timeline (TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)


def debug_nans(enable: bool = True) -> None:
    jax.config.update("jax_debug_nans", enable)


class StepTimer:
    """Step-time/throughput tracker; skips the first `warmup` (compile) steps."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.count = 0
        self.total = 0.0
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self.count += 1
        if self.count > self.warmup:
            self.total += dt
        return False

    @property
    def steps_timed(self) -> int:
        return max(0, self.count - self.warmup)

    @property
    def mean_step_time(self) -> float:
        return self.total / self.steps_timed if self.steps_timed else float("nan")

    def throughput(self, items_per_step: int) -> float:
        t = self.mean_step_time
        return items_per_step / t if t == t and t > 0 else float("nan")
