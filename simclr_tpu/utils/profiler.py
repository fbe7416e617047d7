"""Profiling / tracing utilities (SURVEY.md §5: the reference has none;
this is a fresh subsystem).

Wraps jax.profiler: an on-demand trace server for TensorBoard profiling,
a context manager for step-range traces, and a simple per-step timer that
reports device-time statistics."""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


def start_server(port: int = 9999):
    """Start the profiler server (connect via TensorBoard 'profile' tab)."""
    return jax.profiler.start_server(port)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture an XLA trace of the enclosed steps into log_dir."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timing with blocking sync at report points only."""

    def __init__(self):
        self.times = []
        self._last = None

    def start(self):
        self._last = time.perf_counter()

    def stop(self, block_on=None):
        if block_on is not None:
            jax.block_until_ready(block_on)
        now = time.perf_counter()
        if self._last is not None:
            self.times.append(now - self._last)
        self._last = now

    def summary(self) -> dict:
        if not self.times:
            return {}
        ts = sorted(self.times)
        n = len(ts)
        return {
            "steps": n,
            "mean_s": sum(ts) / n,
            "p50_s": ts[n // 2],
            "p90_s": ts[int(n * 0.9)],
            "min_s": ts[0],
        }
