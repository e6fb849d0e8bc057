"""Profiling hooks: jax.profiler traces and steps/sec timing.

The reference has no profiling at all (SURVEY.md §5 — tqdm bars only).
Here: ``trace`` wraps a code region in a jax.profiler trace (viewable in
TensorBoard/Perfetto), and ``StepTimer`` measures steady-state steps/sec
with proper ``block_until_ready`` fencing — the DSVI north-star metric.
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path

import jax


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax-trace"):
    """Profile a region: `with trace(dir): run_steps()`."""
    Path(logdir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Steady-state steps/sec with warmup and device fencing.

    >>> timer = StepTimer(warmup=3)
    >>> for _ in range(50):
    ...     out = step(...)
    ...     timer.tick(out)
    >>> timer.steps_per_sec()
    """

    def __init__(self, warmup: int = 3):
        self.warmup = warmup
        self._count = 0
        self._t0 = None
        self._elapsed = None

    def tick(self, out=None):
        self._count += 1
        if self._count == self.warmup:
            if out is not None:
                jax.block_until_ready(out)
            self._t0 = time.perf_counter()

    def stop(self, out=None):
        if out is not None:
            jax.block_until_ready(out)
        if self._t0 is not None:
            self._elapsed = time.perf_counter() - self._t0

    def steps_per_sec(self) -> float:
        if self._elapsed is None or self._count <= self.warmup:
            return float("nan")
        return (self._count - self.warmup) / self._elapsed


def annotate(name: str):
    """Named profiler annotation for tracing sub-steps."""
    return jax.profiler.TraceAnnotation(name)
