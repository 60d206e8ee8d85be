"""Velodyne scan-row segmentation + region-growing depth segmentation.

TPU-native redesign of `HelperLidarRowSegmentation`
(HelperLidarRowSegmentation.cpp) — a component that is wired but
DISABLED in the reference (`CalcDepthSegmentionRegionGrowing` throws
"Region growing not supported!", DepthEstimator.cpp:608).  This build
implements it as a working, fully vectorized feature:

  * Row segmentation (SegmentPoints, :18-46): visible points in scan
    order are split into Velodyne rows wherever the image-x coordinate
    jumps up by > 50 px.  Here: compact the visible subsequence with a
    cumsum-rank scatter, flag jumps, cumsum → row ids.  One pass, O(P).
  * Region growing (calculateNeighborPoints, :315-375): from the
    feature's nearest lidar point (seed), grow along its row and one
    adjacent row, bounded by depth-gradient-scaled distance caps.
    The reference's sequential walk-with-breaks becomes a prefix-AND
    (cumulative product) over a static column window around the seed —
    the grown set is exactly the maximal contiguous run satisfying the
    chain conditions, evaluated for ALL features at once.

Deliberate redesigns (documented):
  * The adjacent-row seed is the image-space nearest point in a static
    column window of the adjacent row (the reference walks the full row
    for the x-crossing point, :68-104 — same point up to ties).
  * `max_pointcount` truncation keeps the points nearest to the seed
    (the reference alternates a two-pointer walk, :237-283 — also a
    nearest-first order).

Error codes match calculateNeighborPoints: -1 no adjacent-row seed,
-2 seed-to-seed distance exceeded, -3 no growth, -4 no nearest point;
mapped to DepthResultType 17/18/19 by the estimator.

NOTE: meaningful only for azimuth-ORDERED scans (real Velodyne data).
On unordered clouds the jump rule yields no coherent rows and every
feature falls through to the regular pipeline — by design.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .projection import FrameCloud

ROW_JUMP_PX = 50.0  # HelperLidarRowSegmentation.cpp:30


class RowStructure(NamedTuple):
    """Compact scan-row layout of the visible points."""

    comp_raw: jnp.ndarray  # [P] raw point index at compact position (or -1)
    comp_uv: jnp.ndarray  # [P, 2] image coords at compact positions
    comp_xyz: jnp.ndarray  # [P, 3] camera-frame coords at compact positions
    comp_valid: jnp.ndarray  # [P]
    row_id: jnp.ndarray  # [P] row of each compact position
    col_id: jnp.ndarray  # [P] column within row
    row_start: jnp.ndarray  # [R] compact index of each row's first point
    row_len: jnp.ndarray  # [R]
    num_rows: jnp.ndarray  # scalar
    rank: jnp.ndarray  # [P] raw index → compact position (or -1)


def segment_rows(frame: FrameCloud, max_rows: int = 128) -> RowStructure:
    """Split the visible points (in raw scan order) into rows."""
    P = frame.valid.shape[0]
    vis = frame.visible
    rank = jnp.cumsum(vis.astype(jnp.int32)) - 1
    n_vis = jnp.sum(vis.astype(jnp.int32))
    tgt = jnp.where(vis, rank, P)

    arange = jnp.arange(P, dtype=jnp.int32)
    comp_raw = jnp.full((P,), -1, jnp.int32).at[tgt].set(arange, mode="drop")
    comp_uv = jnp.zeros((P, 2), frame.uv.dtype).at[tgt].set(
        frame.uv, mode="drop")
    comp_xyz = jnp.zeros((P, 3), frame.points_cam.dtype).at[tgt].set(
        frame.points_cam, mode="drop")
    comp_valid = arange < n_vis

    x = comp_uv[:, 0]
    prev_x = jnp.concatenate([jnp.full((1,), -jnp.inf, x.dtype), x[:-1]])
    new_row = comp_valid & ((x > prev_x + ROW_JUMP_PX)
                            | (arange == 0))
    row_id = jnp.cumsum(new_row.astype(jnp.int32)) - 1
    row_id = jnp.where(comp_valid, jnp.clip(row_id, 0, max_rows - 1), -1)
    # column = offset from the row's first compact position
    start_of_row = jax.lax.cummax(jnp.where(new_row, arange, -1))
    col_id = jnp.where(comp_valid, arange - start_of_row, -1)

    row_start = jnp.full((max_rows,), -1, jnp.int32).at[
        jnp.where(new_row & (row_id >= 0), row_id, max_rows)].set(
        arange, mode="drop")
    row_cnt = jnp.zeros((max_rows,), jnp.int32).at[
        jnp.where(comp_valid, row_id, max_rows)].add(1, mode="drop")
    num_rows = jnp.max(jnp.where(comp_valid, row_id, -1)) + 1

    rank_map = jnp.where(vis, rank, -1)
    return RowStructure(comp_raw=comp_raw, comp_uv=comp_uv,
                        comp_xyz=comp_xyz, comp_valid=comp_valid,
                        row_id=row_id, col_id=col_id, row_start=row_start,
                        row_len=row_cnt, num_rows=num_rows, rank=rank_map)


class RegionGrowResult(NamedTuple):
    raw_indices: jnp.ndarray  # [N, W] raw point indices of the grown set
    mask: jnp.ndarray  # [N, W]
    status: jnp.ndarray  # [N] 1 ok, or -1/-2/-3/-4


def _grad_dist(threshold, start, gradient, seed_depth):
    """getMaxDist (HelperLidarRowSegmentation.cpp:302-313)."""
    delta = seed_depth - start
    return jnp.where(seed_depth <= threshold, start,
                     start + delta * gradient)


def _row_window(rows: RowStructure, row: jnp.ndarray, center_col: jnp.ndarray,
                width: int):
    """Gather a static column window [N, width] of compact positions
    for (row, center_col) pairs; returns (compact positions, valid)."""
    P = rows.comp_valid.shape[0]
    start = rows.row_start[jnp.clip(row, 0, rows.row_start.shape[0] - 1)]
    length = rows.row_len[jnp.clip(row, 0, rows.row_len.shape[0] - 1)]
    offs = jnp.arange(width, dtype=jnp.int32) - width // 2
    cols = center_col[:, None] + offs[None, :]
    ok = ((row >= 0)[:, None] & (cols >= 0) & (cols < length[:, None])
          & (start >= 0)[:, None])
    pos = jnp.clip(start[:, None] + cols, 0, P - 1)
    return pos, ok


def grow_regions(
    rows: RowStructure,
    seed_raw: jnp.ndarray,
    seed_valid: jnp.ndarray,
    feature_uv: jnp.ndarray,
    *,
    max_dist_threshold: float = 10.0,
    seed_to_seed_start: float = 0.5,
    seed_to_seed_gradient: float = 0.05,
    neighbor_to_seed_start: float = 0.5,
    neighbor_to_seed_gradient: float = 0.05,
    neighbor_start: float = 0.2,
    neighbor_gradient: float = 0.02,
    max_pointcount: int = 4,
    window: int = 32,
) -> RegionGrowResult:
    """Region-grow around per-feature seed points along two scan rows.

    Args:
      rows: output of segment_rows.
      seed_raw: [N] raw index of each feature's nearest lidar point.
      seed_valid: [N] seed availability (False → status -4).
      feature_uv: [N, 2].
      defaults follow parameters.yaml:77-87.
    """
    N = seed_raw.shape[0]
    P = rows.comp_valid.shape[0]
    seed_ci = rows.rank[jnp.clip(seed_raw, 0, P - 1)]
    seed_ci = jnp.where(seed_valid, seed_ci, -1)
    seed_row = rows.row_id[jnp.clip(seed_ci, 0, P - 1)]
    seed_col = rows.col_id[jnp.clip(seed_ci, 0, P - 1)]
    seed_xyz = rows.comp_xyz[jnp.clip(seed_ci, 0, P - 1)]
    seed_depth = seed_xyz[:, 2]

    d_seed2seed = _grad_dist(max_dist_threshold, seed_to_seed_start,
                             seed_to_seed_gradient, seed_depth)
    d_nb2seed = _grad_dist(max_dist_threshold, neighbor_to_seed_start,
                           neighbor_to_seed_gradient, seed_depth)
    d_nb = _grad_dist(max_dist_threshold, neighbor_start,
                      neighbor_gradient, seed_depth)

    # ---- adjacent-row seed: nearest (image space) point in a window
    # of rows seed_row ± 1, proportional-column estimate.
    def adj_seed(delta):
        row = seed_row + delta
        # proportional column estimate across rows
        own_len = rows.row_len[jnp.clip(seed_row, 0, rows.row_len.shape[0] - 1)]
        adj_len = rows.row_len[jnp.clip(row, 0, rows.row_len.shape[0] - 1)]
        frac = seed_col / jnp.maximum(own_len, 1)
        center = (frac * adj_len).astype(jnp.int32)
        pos, ok = _row_window(rows, row, center, window)
        uv = rows.comp_uv[pos]
        d2 = jnp.sum((uv - feature_uv[:, None, :]) ** 2, axis=-1)
        d2 = jnp.where(ok, d2, jnp.inf)
        best = jnp.argmin(d2, axis=1)
        found = jnp.take_along_axis(d2, best[:, None], 1)[:, 0] < jnp.inf
        return jnp.take_along_axis(pos, best[:, None], 1)[:, 0], found

    top_ci, top_ok = adj_seed(jnp.int32(-1))
    bot_ci, bot_ok = adj_seed(jnp.int32(1))
    # nearer of the two (image distance), as getNeighborRowPoint does
    top_d = jnp.sum((rows.comp_uv[top_ci] - feature_uv) ** 2, axis=1)
    bot_d = jnp.sum((rows.comp_uv[bot_ci] - feature_uv) ** 2, axis=1)
    top_d = jnp.where(top_ok, top_d, jnp.inf)
    bot_d = jnp.where(bot_ok, bot_d, jnp.inf)
    use_top = top_d <= bot_d
    adj_ci = jnp.where(use_top, top_ci, bot_ci)
    adj_any = top_ok | bot_ok
    # second candidate for the seed-to-seed fallback (selectRowIndex)
    alt_ci = jnp.where(use_top, bot_ci, top_ci)
    alt_ok = jnp.where(use_top, bot_ok, top_ok)

    adj_xyz = rows.comp_xyz[adj_ci]
    adj_dist = jnp.linalg.norm(adj_xyz - seed_xyz, axis=1)
    alt_xyz = rows.comp_xyz[alt_ci]
    alt_dist = jnp.linalg.norm(alt_xyz - seed_xyz, axis=1)
    primary_ok = adj_any & (adj_dist <= d_seed2seed)
    fallback_ok = alt_ok & (alt_dist <= d_seed2seed)
    second_ci = jnp.where(primary_ok, adj_ci,
                          jnp.where(fallback_ok, alt_ci, -1))
    seed2_fail = adj_any & ~primary_ok & ~fallback_ok  # status -2

    # ---- growth along a row from a seed: prefix-AND within the window.
    half = window // 2

    def grow(row, col, ci_seed):
        pos, ok = _row_window(rows, row, col, window)
        xyz = rows.comp_xyz[pos]  # [N, W, 3]
        anchor = rows.comp_xyz[jnp.clip(ci_seed, 0, P - 1)]
        dist_seed = jnp.linalg.norm(xyz - anchor[:, None, :], axis=-1)
        step = jnp.linalg.norm(xyz[:, 1:] - xyz[:, :-1], axis=-1)
        cond = ok & (dist_seed <= d_nb2seed[:, None])
        # chain condition: neighbor-to-neighbor step bounded
        right_step_ok = jnp.concatenate(
            [jnp.ones((N, 1), bool), step <= d_nb[:, None]], axis=1)
        left_step_ok = jnp.concatenate(
            [step <= d_nb[:, None], jnp.ones((N, 1), bool)], axis=1)
        idx = jnp.arange(window)
        right_side = idx[None, :] >= half
        # prefix-AND going right from the center, and left from center
        right_run = jnp.cumprod(
            jnp.where(right_side, cond & right_step_ok, True), axis=1)
        left_run = jnp.flip(jnp.cumprod(jnp.flip(
            jnp.where(~right_side, cond & left_step_ok, True), axis=1),
            axis=1), axis=1)
        grown = jnp.where(right_side, right_run, left_run).astype(bool) & cond
        return pos, grown, dist_seed

    pos1, grown1, ds1 = grow(seed_row, seed_col, seed_ci)
    row2 = rows.row_id[jnp.clip(second_ci, 0, P - 1)]
    col2 = rows.col_id[jnp.clip(second_ci, 0, P - 1)]
    pos2, grown2, ds2 = grow(row2, col2, second_ci)
    grown2 = grown2 & (second_ci >= 0)[:, None]

    pos = jnp.concatenate([pos1, pos2], axis=1)  # [N, 2W]
    grown = jnp.concatenate([grown1, grown2], axis=1)
    dseed = jnp.where(grown, jnp.concatenate([ds1, ds2], axis=1), jnp.inf)

    if max_pointcount > 0:
        # keep the max_pointcount nearest-to-seed grown points
        order = jnp.argsort(dseed, axis=1)
        keep_rank = jnp.zeros_like(grown, dtype=jnp.int32).at[
            jnp.arange(N)[:, None], order].set(
            jnp.broadcast_to(jnp.arange(2 * window)[None, :], (N, 2 * window)))
        grown = grown & (keep_rank < max_pointcount)

    second_grew = jnp.any(grown1, axis=1) & jnp.any(grown2, axis=1)

    status = jnp.full((N,), 1, jnp.int32)
    status = jnp.where(~second_grew, -3, status)
    status = jnp.where(seed2_fail, -2, status)
    status = jnp.where(~adj_any, -1, status)
    status = jnp.where(~seed_valid, -4, status)

    raw = rows.comp_raw[pos]
    grown = grown & (status == 1)[:, None]
    return RegionGrowResult(raw_indices=jnp.where(grown, raw, -1),
                            mask=grown, status=status)
