"""Projection / pixel-grid / neighbor-gather tests.

Mirrors the reference test `NeigborFinder.findByPixel`
(test_monolidar_fusion.cpp:82-171): synthesize camera-consistent 3D
points, rasterize, gather windows, assert the geometric invariants.
"""

import numpy as np
import jax.numpy as jnp

from mono_lidar_depth_tpu.core.geometry import SE3, PinholeCamera
from mono_lidar_depth_tpu.core.neighbors import gather_neighbors
from mono_lidar_depth_tpu.core.projection import build_frame_cloud


def _identity_se3():
    return SE3.identity()


def _make_frame(points_cam, valid=None, cam=None, rule="nearest", H=100, W=100):
    cam = cam or PinholeCamera(width=W, height=H, focal_length=600.0,
                               cx=W / 2, cy=H / 2)
    pts = jnp.asarray(points_cam, dtype=jnp.float32)
    if valid is None:
        valid = jnp.ones(pts.shape[0], dtype=bool)
    return cam, build_frame_cloud(pts, valid, _identity_se3(), cam, H, W, rule)


def test_reference_find_by_pixel(rng):
    # Reference fixture: 100x100 camera, f=600, c=(50,50); 50 points at
    # integer pixels in [0,10)^2 lifted to random depths 1..10; window
    # 3x5.  Invariant: every neighbor re-projects into its grid cell and
    # lies within the search rect (±ceil(half)+0.01).
    W = H = 100
    cam = PinholeCamera(width=W, height=H, focal_length=600.0, cx=50.0, cy=50.0)
    n = 50
    uv = rng.integers(1, 10, size=(n, 2)).astype(np.float64)
    rays = np.asarray(cam.viewing_rays(jnp.asarray(uv, dtype=jnp.float32)))
    depths = rng.integers(1, 11, size=(n, 1)).astype(np.float64)
    pts = rays * depths  # support is origin

    cam, frame = _make_frame(pts, cam=cam)
    features = jnp.asarray(uv, dtype=jnp.float32)
    nb = gather_neighbors(frame, cam, features, 3 * 0.5, 5 * 0.5, (7, 5))

    grid = np.asarray(frame.grid)
    nb_idx = np.asarray(nb.indices)
    nb_mask = np.asarray(nb.mask)
    uv_all = np.asarray(frame.uv)
    for i in range(n):
        for k in range(nb_idx.shape[1]):
            if not nb_mask[i, k]:
                continue
            j = nb_idx[i, k]
            # neighbor reprojects into its own grid cell
            x, y = int(uv_all[j, 0]), int(uv_all[j, 1])
            assert grid[y, x] >= 0
            # within the search rect (reference asserts with +0.01 slop
            # on ceil(half-extent))
            assert abs(uv_all[j, 0] - uv[i, 0]) <= np.ceil(3 * 0.5) + 1.01
            assert abs(uv_all[j, 1] - uv[i, 1]) <= np.ceil(5 * 0.5) + 1.01


def test_grid_excludes_behind_camera():
    pts = [[0.0, 0.0, 10.0], [0.0, 0.0, -10.0]]
    _, frame = _make_frame(pts)
    grid = np.asarray(frame.grid)
    assert (grid >= 0).sum() == 1
    assert grid[50, 50] == 0


def test_grid_collision_nearest_vs_first():
    # Two points projecting to the same pixel; index 0 is farther.
    pts = [[0.0, 0.0, 20.0], [0.0, 0.0, 10.0]]
    _, fr_near = _make_frame(pts, rule="nearest")
    _, fr_first = _make_frame(pts, rule="first")
    assert np.asarray(fr_near.grid)[50, 50] == 1  # nearest (z=10) wins
    assert np.asarray(fr_first.grid)[50, 50] == 0  # first in scan order wins


def test_invalid_points_excluded():
    pts = [[0.0, 0.0, 10.0], [0.001, 0.0, 10.0]]
    valid = jnp.asarray([False, True])
    _, frame = _make_frame(pts, valid=valid)
    grid = np.asarray(frame.grid)
    assert grid[50, 50] == 1


def test_window_bounds_clamped():
    # Feature at the image corner: window must clamp, not wrap.
    pts = [[-0.8, -0.8, 10.0]]  # projects near (2, 2)
    cam, frame = _make_frame(pts)
    feat = jnp.asarray([[1.0, 1.0]], dtype=jnp.float32)
    nb = gather_neighbors(frame, cam, feat, 3.0, 4.5, (11, 8))
    # All gathered cells lie inside the image: no negative wrap pulls in
    # the far side of the grid.
    assert int(nb.count[0]) == np.asarray(
        frame.grid[:6, :5] >= 0).sum()


def test_neighbor_count_and_points(rng):
    # Dense planar wall z=20 covering the image → window full of points.
    xs, ys = np.meshgrid(np.arange(-30, 31), np.arange(-15, 16))
    pts = np.stack([xs.ravel() * 0.05, ys.ravel() * 0.05,
                    np.full(xs.size, 20.0)], axis=1)
    cam, frame = _make_frame(pts, W=1248, H=384)
    # (0.05 spacing * 600 f / 20 z) = 1.5 px spacing on the image
    feat = jnp.asarray([[624.0, 192.0]], dtype=jnp.float32)
    nb = gather_neighbors(frame, cam, feat, 3.0, 4.5, (11, 8))
    assert int(nb.count[0]) > 6
    p = np.asarray(nb.points_cam[0])
    m = np.asarray(nb.mask[0])
    assert np.allclose(p[m][:, 2], 20.0)


def test_two_scale_gather_matches_direct(rng):
    """The primary window extracted from the shared road gather must be
    IDENTICAL to a direct primary-window gather, including at image
    edges where the clamped rectangles misalign."""
    from mono_lidar_depth_tpu.config import DepthEstimatorConfig
    from mono_lidar_depth_tpu.core.neighbors import (
        gather_neighbors, gather_neighbors_two_scales)

    cfg = DepthEstimatorConfig(max_points=4096, max_features=128,
                               image_width=256, image_height=128)
    pts = rng.uniform([-8, -4, 2], [8, 4, 50], (4096, 3)).astype(np.float32)
    cam, frame = _make_frame(pts, W=256, H=128)
    # features everywhere, INCLUDING corners and edges
    uv = rng.uniform([0.1, 0.1], [255.5, 127.5], (120, 2))
    edges = np.array([[0.2, 0.2], [255.0, 127.0], [0.5, 127.0],
                      [255.0, 0.5], [3.0, 64.0], [252.0, 64.0],
                      [128.0, 1.0], [128.0, 126.0]])
    uv = np.concatenate([uv, edges]).astype(np.float32)
    feats = jnp.asarray(uv)

    hx = cfg.pixelarea_search_witdh * 0.5
    hy = cfg.pixelarea_search_height * 0.5
    direct = gather_neighbors(frame, cam, feats, hx, hy, cfg.primary_window)
    small, big = gather_neighbors_two_scales(
        frame, cam, feats, hx, hy, cfg.road_search_scale_x,
        cfg.road_search_scale_y, cfg.primary_window, cfg.road_window)
    np.testing.assert_array_equal(np.asarray(small.mask),
                                  np.asarray(direct.mask))
    np.testing.assert_array_equal(np.asarray(small.indices),
                                  np.asarray(direct.indices))
    np.testing.assert_allclose(np.asarray(small.points_cam),
                               np.asarray(direct.points_cam))
    np.testing.assert_array_equal(np.asarray(small.count),
                                  np.asarray(direct.count))
    # and the big window is a real road gather
    direct_big = gather_neighbors(frame, cam, feats, hx * 2.0, hy * 1.5,
                                  cfg.road_window)
    np.testing.assert_array_equal(np.asarray(big.mask),
                                  np.asarray(direct_big.mask))


def test_fast_rasterization_matches_exact_within_quantization(rng):
    """The single-scatter fast path (config.fast_rasterization) must
    agree with the exact rasterizer up to its documented error model:
    identical occupancy, winner depth within one ~2 cm quantization
    step (winner swaps can only happen between points closer than one
    step), and the ground-flag preserved wherever winners match."""
    from mono_lidar_depth_tpu.core.projection import (_FAST_STEP,
                                                      build_frame_cloud)

    pts = rng.uniform([-8, -4, 2], [8, 4, 90], (8192, 3)).astype(np.float32)
    valid = jnp.asarray(rng.uniform(size=8192) > 0.05)
    flags = jnp.asarray(rng.uniform(size=8192) > 0.5)
    cam = PinholeCamera(width=128, height=96, focal_length=300.0,
                        cx=64.0, cy=48.0)
    kw = dict(valid=valid, lidar_to_cam=_identity_se3(), camera=cam,
              grid_height=96, grid_width=128, collision_rule="nearest",
              point_flags=flags)
    exact = build_frame_cloud(jnp.asarray(pts), **kw)
    fast = build_frame_cloud(jnp.asarray(pts), **kw, fast=True)

    ze = np.asarray(exact.planes[0])
    zf = np.asarray(fast.planes[0])
    occ_e = ze != 0
    occ_f = zf != 0
    np.testing.assert_array_equal(occ_f, occ_e)
    # depth: decoded bin center within one step of the exact winner
    # depth (same winner -> step/2; a swap implies the two points were
    # within one step of each other)
    d = np.abs(np.abs(zf[occ_f]) - np.abs(ze[occ_e]))
    assert d.max() <= _FAST_STEP + 1e-5, d.max()
    assert _FAST_STEP <= 0.02  # the documented <= 1 cm decode error
    # where the same point won, the flag (sign) must agree
    same = occ_e & (np.asarray(fast.grid) == np.asarray(exact.grid))
    assert same.sum() > 0.9 * occ_e.sum()  # swaps are rare
    np.testing.assert_array_equal(np.sign(zf[same]), np.sign(ze[same]))
    # raw-index grid entries always point at real, visible points
    gi = np.asarray(fast.grid)[occ_f]
    assert (gi >= 0).all() and (gi < 8192).all()
    assert np.asarray(exact.visible)[gi].all()


def test_fast_rasterization_end_to_end_depth_delta(rng):
    """estimate_depths with fast_rasterization: same scene, same
    features — success outcomes near-identical and successful depths
    within a few cm of the exact path (quantized z + cell-center
    lateral reconstruction feeding the plane fits)."""
    import jax

    from mono_lidar_depth_tpu import (DepthEstimatorConfig, estimate_depths,
                                      fit_ground_plane_ransac)
    from mono_lidar_depth_tpu.io.kitti import make_synthetic_scan, pad_cloud

    cfg = DepthEstimatorConfig(
        max_points=16384, max_features=256, image_width=384,
        image_height=128, radiusSearch_count_min=1,
        ransac_num_hypotheses=256, ransac_subsample_points=1024)
    cam = PinholeCamera(width=384, height=128, focal_length=240.0,
                        cx=192.0, cy=64.0)
    R_lc = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], np.float32)
    T = SE3(jnp.asarray(R_lc), jnp.zeros(3, jnp.float32))
    scan = make_synthetic_scan(rng, 16000)
    cloud, cvalid = pad_cloud(scan, len(scan), cfg.max_points)
    cloud, cvalid = jnp.asarray(cloud), jnp.asarray(cvalid)
    uv = jnp.asarray(rng.uniform([4, 4], [380, 124], (256, 2)).astype(
        np.float32))
    ok = jnp.ones(256, bool)
    gp = fit_ground_plane_ransac(
        cloud, cvalid, jax.random.PRNGKey(0),
        distance_threshold=cfg.ransac_plane_distance_treshold,
        num_hypotheses=cfg.ransac_num_hypotheses,
        subsample=cfg.ransac_subsample_points)
    e = estimate_depths(cfg, cam, T, cloud, cvalid, uv, ok, gp)
    f = estimate_depths(cfg.replace(fast_rasterization=True), cam, T,
                        cloud, cvalid, uv, ok, gp)
    de, df = np.asarray(e.depths), np.asarray(f.depths)
    ce, cf = np.asarray(e.codes), np.asarray(f.codes)
    both = (de > 0) & (df > 0)
    # outcome agreement: perturbations only flip marginal features
    assert (ce == cf).mean() > 0.9, (ce == cf).mean()
    assert both.sum() > 0.8 * (de > 0).sum()
    delta = np.abs(de[both] - df[both])
    # quantization 1 cm + cell-center lateral error through the plane
    # fits.  At this test's short focal length (f = 240 px) the
    # +-0.5 px cell-center reconstruction is z/480 ~ 8 cm lateral at
    # 40 m — ~3x the KITTI-calibration case (f = 707) — so the depth
    # deltas here UPPER-bound the deployment error.
    assert np.quantile(delta, 0.9) < 0.10, np.quantile(delta, 0.9)
    assert np.median(delta) < 0.02, np.median(delta)
    assert delta.max() < 1.0, delta.max()
