"""Profiling / tracing helpers (SURVEY.md §5 "Tracing / profiling").

Wraps jax.profiler for perfetto trace capture plus lightweight blocked step
timers for per-stage timing of the input pipeline and train/infer steps.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, List, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a profiler trace (view with tensorboard/perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def start_server(port: int = 9999):
    """Live profiling server for `jax.profiler` remote capture."""
    return jax.profiler.start_server(port)


class StepTimer:
    """Named wall-clock segments with block_until_ready bracketing."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def section(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, float]:
        return {
            name: self.totals[name] / max(self.counts[name], 1) * 1e3
            for name in self.totals
        }

    def report(self) -> str:
        return "  ".join(f"{k}={v:.1f}ms" for k, v in sorted(self.summary().items()))
