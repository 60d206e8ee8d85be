"""Rectangular-window neighbor gather around feature points.

TPU-native replacement for `NeighborFinderPixel::getNeighbors`
(NeighborFinderPixel.cpp:60-95).  The reference scans a dynamic w×h
pixel rectangle per feature and push_backs hits; here every feature
gathers a STATIC [Ky, Kx] window of grid cells (upper bound of the
dynamic rectangle) in one vectorized gather, with a per-cell validity
mask replicating the exact dynamic bounds:

    left  = max(u - hx, 0)        right  = min(u + hx, W-1)
    top   = max(v - hy, 0)        bottom = min(v + hy, H-1)
    cells = int(top)..int(bottom) × int(left)..int(right)   (inclusive)

Cell order is row-major (y outer, x inner), matching the reference scan
order — this matters for argmax tie-breaking parity in the
max-spanning-triangle stage.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .projection import POINT_NOT_DEFINED, FrameCloud


class NeighborSet(NamedTuple):
    indices: jnp.ndarray  # [N, K] int32 raw point indices (clamped; see mask)
    mask: jnp.ndarray  # [N, K] bool: cell in rect && holds a point
    points_cam: jnp.ndarray  # [N, K, 3] camera-frame points (0 where ~mask)
    count: jnp.ndarray  # [N] int32 number of neighbors


def gather_neighbors(
    frame: FrameCloud,
    features_uv: jnp.ndarray,
    half_size_x: float,
    half_size_y: float,
    window: tuple[int, int],
) -> NeighborSet:
    """Gather grid windows for all features at once.

    Args:
      frame: rasterized cloud.
      features_uv: [N, 2] feature pixel coordinates.
      half_size_x/y: rectangle half extents in pixels (already scaled;
        the reference computes w*0.5*scale, NeighborFinderPixel.cpp:67-68).
      window: static (Ky, Kx) cell counts (config.window_cells upper bound).
    """
    H, W = frame.grid.shape
    Ky, Kx = window
    u = features_uv[..., 0]
    v = features_uv[..., 1]

    left = jnp.maximum(u - half_size_x, 0.0)
    right = jnp.minimum(u + half_size_x, float(W - 1))
    top = jnp.maximum(v - half_size_y, 0.0)
    bottom = jnp.minimum(v + half_size_y, float(H - 1))

    x0 = left.astype(jnp.int32)  # all values >= 0: trunc == floor
    x1 = right.astype(jnp.int32)
    y0 = top.astype(jnp.int32)
    y1 = bottom.astype(jnp.int32)

    dx = jnp.arange(Kx, dtype=jnp.int32)
    dy = jnp.arange(Ky, dtype=jnp.int32)
    xs = x0[..., None] + dx  # [N, Kx]
    ys = y0[..., None] + dy  # [N, Ky]
    in_x = xs <= x1[..., None]
    in_y = ys <= y1[..., None]

    cell_x = jnp.broadcast_to(xs[..., None, :], xs.shape[:-1] + (Ky, Kx))
    cell_y = jnp.broadcast_to(ys[..., :, None], ys.shape[:-1] + (Ky, Kx))
    cell_ok = in_y[..., :, None] & in_x[..., None, :]

    flat = jnp.clip(cell_y, 0, H - 1) * W + jnp.clip(cell_x, 0, W - 1)
    idx = jnp.take(frame.grid.reshape(-1), flat.reshape(flat.shape[:-2] + (Ky * Kx,)),
                   axis=0)
    mask = cell_ok.reshape(idx.shape) & (idx != POINT_NOT_DEFINED)

    safe_idx = jnp.clip(idx, 0, frame.points_cam.shape[0] - 1)
    pts = jnp.take(frame.points_cam, safe_idx, axis=0)
    pts = jnp.where(mask[..., None], pts, 0.0)

    return NeighborSet(
        indices=jnp.where(mask, idx, POINT_NOT_DEFINED),
        mask=mask,
        points_cam=pts,
        count=jnp.sum(mask, axis=-1).astype(jnp.int32),
    )


def gather_neighbors_two_scales(
    frame: FrameCloud,
    features_uv: jnp.ndarray,
    half_x: float,
    half_y: float,
    scale_x: float,
    scale_y: float,
    window_small: tuple[int, int],
    window_large: tuple[int, int],
) -> tuple[NeighborSet, NeighborSet]:
    """One HBM gather for both search scales.

    The primary rectangle (half extents half_x/half_y) is a subrectangle
    of the road rectangle (scaled by scale_x/scale_y >= 1), so the
    expensive grid+point gather is done ONCE at the large window and the
    small window is extracted with a cheap register-level
    take_along_axis using the per-feature cell offset
    (floor(max(u - hx, 0)) - floor(max(u - hx*sx, 0))).  Cell order of
    both outputs stays row-major, preserving scan-order parity.
    """
    H, W = frame.grid.shape
    Ky1, Kx1 = window_small
    Ky2, Kx2 = window_large
    big = gather_neighbors(frame, features_uv,
                           half_x * scale_x, half_y * scale_y, window_large)

    u = features_uv[..., 0]
    v = features_uv[..., 1]
    x0s = jnp.maximum(u - half_x, 0.0).astype(jnp.int32)
    x1s = jnp.minimum(u + half_x, float(W - 1)).astype(jnp.int32)
    y0s = jnp.maximum(v - half_y, 0.0).astype(jnp.int32)
    y1s = jnp.minimum(v + half_y, float(H - 1)).astype(jnp.int32)
    x0l = jnp.maximum(u - half_x * scale_x, 0.0).astype(jnp.int32)
    y0l = jnp.maximum(v - half_y * scale_y, 0.0).astype(jnp.int32)
    offx = x0s - x0l  # [N]
    offy = y0s - y0l

    dx = jnp.arange(Kx1, dtype=jnp.int32)
    dy = jnp.arange(Ky1, dtype=jnp.int32)
    in_x = (x0s[:, None] + dx) <= x1s[:, None]  # [N, Kx1]
    in_y = (y0s[:, None] + dy) <= y1s[:, None]
    sub_ok = in_y[:, :, None] & in_x[:, None, :]
    k_map = ((offy[:, None, None] + dy[None, :, None]) * Kx2
             + offx[:, None, None] + dx[None, None, :])  # [N, Ky1, Kx1]
    k_map = jnp.clip(k_map, 0, Ky2 * Kx2 - 1).reshape(-1, Ky1 * Kx1)

    idx_s = jnp.take_along_axis(big.indices, k_map, axis=1)
    mask_s = (jnp.take_along_axis(big.mask, k_map, axis=1)
              & sub_ok.reshape(-1, Ky1 * Kx1))
    pts_s = jnp.take_along_axis(big.points_cam, k_map[..., None], axis=1)
    pts_s = jnp.where(mask_s[..., None], pts_s, 0.0)
    small = NeighborSet(
        indices=jnp.where(mask_s, idx_s, POINT_NOT_DEFINED),
        mask=mask_s,
        points_cam=pts_s,
        count=jnp.sum(mask_s, axis=-1).astype(jnp.int32),
    )
    return small, big
