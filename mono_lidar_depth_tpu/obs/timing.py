"""Per-stage wall-clock timing + JAX profiler hooks.

Replaces the reference's ad-hoc `std::chrono` prints and the `Logger`
singleton (Logger.h:9-107): a structured timer that understands JAX's
async dispatch (block_until_ready on exit) and can emit a profiler
trace for a region.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Any

import jax


class StageTimer:
    """Accumulating named-span timer.

    Usage:
        timer = StageTimer()
        with timer.span("depth"):
            out = estimate_depths(...)   # blocked on exit
        print(timer.report())
    """

    def __init__(self, sync: bool = True):
        self._sync = sync
        self._totals: dict[str, float] = defaultdict(float)
        self._counts: dict[str, int] = defaultdict(int)
        self._last_result: Any = None

    @contextlib.contextmanager
    def span(self, name: str, result: Any = None):
        start = time.perf_counter()
        try:
            yield self
        finally:
            if self._sync and self._last_result is not None:
                jax.block_until_ready(self._last_result)
                self._last_result = None
            self._totals[name] += time.perf_counter() - start
            self._counts[name] += 1

    def observe(self, result: Any) -> Any:
        """Register device values to block on when the span exits."""
        self._last_result = result
        return result

    def totals(self) -> dict[str, float]:
        return dict(self._totals)

    def report(self) -> str:
        lines = [f"{'stage':32s} {'total s':>10s} {'calls':>7s} {'ms/call':>10s}"]
        for name, total in sorted(self._totals.items(), key=lambda kv: -kv[1]):
            n = self._counts[name]
            lines.append(f"{name:32s} {total:10.3f} {n:7d} {1e3 * total / n:10.3f}")
        return "\n".join(lines)

    def reset(self) -> None:
        self._totals.clear()
        self._counts.clear()


@contextlib.contextmanager
def profile_trace(logdir: str):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
