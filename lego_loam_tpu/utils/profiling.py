"""Per-stage timing spans and throughput counters.

≙ the reference's hand-rolled chrono instrumentation (`TicToc`
include/lego_loam/tictoc.h:12-59; per-stage running means
imageProjection.cpp:200-221, featureAssociation.cpp:2798-2816,
mapOptmization.cpp:1877-1908) plus a JAX-profiler hook for device traces.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax


class StageTimer:
    """Running-average wall-clock spans per named stage."""

    def __init__(self, sync: bool = False):
        self.sync = sync
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self.last: Dict[str, float] = {}

    @contextlib.contextmanager
    def span(self, name: str, sync_on=None):
        t0 = time.perf_counter()
        yield
        if self.sync and sync_on is not None:
            jax.block_until_ready(sync_on)
        dt = time.perf_counter() - t0
        self.totals[name] += dt
        self.counts[name] += 1
        self.last[name] = dt

    def mean_ms(self, name: str) -> float:
        c = self.counts.get(name, 0)
        return 1e3 * self.totals[name] / c if c else 0.0

    def hz(self, name: str) -> float:
        m = self.mean_ms(name)
        return 1000.0 / m if m > 0 else 0.0

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals):
            lines.append(
                f"{name:>24s}: {self.mean_ms(name):8.2f} ms/frame "
                f"({self.hz(name):7.1f} Hz, n={self.counts[name]})"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]):
    """JAX profiler trace (view with tensorboard/xprof) around a region."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
