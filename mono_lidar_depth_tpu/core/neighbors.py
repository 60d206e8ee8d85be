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
