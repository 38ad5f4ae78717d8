"""Profiling/tracing hooks.

Replaces the reference's QPC frame timing + HUD cycle counters (SURVEY.md §5
"Tracing/profiling") with jax.profiler device traces plus a lightweight host-side
frame timer whose numbers feed the debug HUD.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/dtr_trace"):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class FrameTimer:
    """Rolling frame-time statistics for the HUD (QPC analog)."""

    def __init__(self, window: int = 60):
        self.window = window
        self.samples: list[float] = []
        self._last = time.perf_counter()

    def tick(self) -> float:
        now = time.perf_counter()
        dt = (now - self._last) * 1000.0
        self._last = now
        self.samples.append(dt)
        if len(self.samples) > self.window:
            self.samples.pop(0)
        return dt

    @property
    def mean_ms(self) -> float:
        return sum(self.samples) / len(self.samples) if self.samples else 0.0

    @property
    def fps(self) -> float:
        return 1000.0 / self.mean_ms if self.mean_ms > 0 else 0.0
