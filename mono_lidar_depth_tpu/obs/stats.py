"""Depth-calculation outcome statistics.

Replaces `DepthCalculationStatistics` / `DepthCalcStatsSinglePoint`
(DepthCalculationStatistics.cpp:132-274, DepthCalcStatsSinglePoint.h:20-68).
The reference mutates 21 counters inside an OpenMP loop (and had to
comment the aggregation out because it raced, DepthEstimator.cpp:470-479);
here the per-frame counters are a pure [21] array produced by the jitted
pipeline (one-hot sum), accumulated functionally — race-free by
construction, and psum-able across devices.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..core.result_types import NUM_RESULT_TYPES, DepthResultType as R


class DepthCalcStats(NamedTuple):
    """Accumulated + last-frame outcome counters (a pytree)."""

    accumulated: jnp.ndarray  # [NUM_RESULT_TYPES] int64-safe int32 counts
    last_frame: jnp.ndarray  # [NUM_RESULT_TYPES]
    frames: jnp.ndarray  # scalar int32
    points: jnp.ndarray  # scalar: total feature points seen

    @classmethod
    def zeros(cls) -> "DepthCalcStats":
        z = jnp.zeros((NUM_RESULT_TYPES,), jnp.int32)
        return cls(accumulated=z, last_frame=z,
                   frames=jnp.int32(0), points=jnp.int32(0))

    def update(self, frame_counters: jnp.ndarray) -> "DepthCalcStats":
        return DepthCalcStats(
            accumulated=self.accumulated + frame_counters,
            last_frame=frame_counters,
            frames=self.frames + 1,
            points=self.points + jnp.sum(frame_counters),
        )


def success_rates(counters: np.ndarray) -> dict:
    """The two headline rates from the reference logs
    (Logs/log_depth_calc_stats.txt, derivation rule
    DepthCalculationStatistics.cpp:216-219)."""
    counters = np.asarray(counters)
    total = int(counters.sum())
    success = int(counters[R.Success] + counters[R.SuccessRoad]
                  + counters[R.SuccessRegionGrowing])
    no_lidar = int(counters[R.RadiusSearchInsufficientPoints])
    covered = max(total - no_lidar, 1)
    return {
        "total_points": total,
        "success": success,
        "success_rate_all": success / max(total, 1),
        "success_rate_lidar_covered": success / covered,
    }


def format_stats_report(stats: "DepthCalcStats") -> str:
    """Human-readable dump in the spirit of
    DepthCalculationStatistics::ToFile (absolute, % of all, % of
    lidar-covered)."""
    acc = np.asarray(stats.accumulated)
    rates = success_rates(acc)
    total = max(rates["total_points"], 1)
    covered = max(total - int(acc[R.RadiusSearchInsufficientPoints]), 1)
    lines = [
        f"frames: {int(stats.frames)}  feature points: {total}",
        f"success (all): {rates['success']} = {100.0 * rates['success_rate_all']:.2f}%",
        f"success (lidar-covered): {100.0 * rates['success_rate_lidar_covered']:.2f}%",
        "",
        f"{'outcome':42s} {'count':>10s} {'% all':>8s} {'% covered':>10s}",
    ]
    for code in R:
        c = int(acc[code])
        if c == 0 and code not in (R.Success, R.RadiusSearchInsufficientPoints):
            continue
        lines.append(
            f"{code.name:42s} {c:10d} {100.0 * c / total:8.2f} "
            f"{100.0 * c / covered:10.2f}")
    return "\n".join(lines)
