"""Ground-plane RANSAC tests (reference fixture:
test_monolidar_fusion.cpp:376-441 — 18k noisy points on z = -1.6,
recovered coefficients within 0.2 absolute)."""

import numpy as np
import jax
import jax.numpy as jnp

from mono_lidar_depth_tpu.core.ransac import (
    fit_ground_plane_ransac, fit_ground_plane_semantic)


def _plane_cloud(rng, n=18000, d=1.6, noise=0.5, normal=(0.0, 0.0, 1.0)):
    normal = np.asarray(normal) / np.linalg.norm(normal)
    xy = rng.uniform(-20, 20, size=(n, 2))
    z = -(normal[0] * xy[:, 0] + normal[1] * xy[:, 1] + d) / normal[2]
    pts = np.column_stack([xy, z]) + rng.normal(size=(n, 3)) * noise
    return pts.astype(np.float32)


def test_reference_fixture(rng):
    pts = _plane_cloud(rng)
    valid = jnp.ones(len(pts), dtype=bool)
    gp = fit_ground_plane_ransac(
        jnp.asarray(pts), valid, jax.random.PRNGKey(1234),
        distance_threshold=0.2, use_refinement=True,
        refinement_threshold=0.05, num_hypotheses=600)
    assert bool(gp.ok)
    coeffs = np.asarray(gp.coeffs)
    # sign-normalized comparison as in the reference test
    sign = 1.0 if coeffs[2] > 0 else -1.0
    np.testing.assert_allclose(coeffs[:3] * sign, [0, 0, 1], atol=0.2)
    np.testing.assert_allclose(coeffs[3] * sign, 1.6, atol=0.2)


def test_outlier_robustness(rng):
    # 60% plane inliers + 40% uniform clutter above the plane.
    plane = _plane_cloud(rng, n=6000, noise=0.05)
    clutter = rng.uniform([-20, -20, 0], [20, 20, 10], size=(4000, 3)).astype(np.float32)
    pts = np.concatenate([plane, clutter])
    valid = jnp.ones(len(pts), dtype=bool)
    gp = fit_ground_plane_ransac(
        jnp.asarray(pts), valid, jax.random.PRNGKey(7),
        distance_threshold=0.2, refinement_threshold=0.3,
        inliers_from_full_cloud=True)
    coeffs = np.asarray(gp.coeffs)
    np.testing.assert_allclose(np.abs(coeffs[2]), 1.0, atol=0.05)
    np.testing.assert_allclose(abs(coeffs[3]), 1.6, atol=0.1)
    # inliers must be mostly plane points
    mask = np.asarray(gp.inlier_mask)
    assert mask[:6000].mean() > 0.85
    assert mask[6000:].mean() < 0.15


def test_axis_constraint_rejects_vertical(rng):
    # A dominant vertical wall + a small horizontal patch: the ±10° axis
    # constraint must pick the horizontal plane even though the wall has
    # more points (SampleConsensusModelPerpendicularPlane semantics,
    # RansacPlane.cpp:94-99).
    wall_yz = rng.uniform([-20, -2], [20, 2], size=(8000, 2))
    wall = np.column_stack([np.zeros(8000) + rng.normal(size=8000) * 0.02,
                            wall_yz[:, 0], wall_yz[:, 1]]).astype(np.float32)
    floor_xy = rng.uniform(-5, 5, size=(2000, 2))
    floor = np.column_stack([floor_xy,
                             -1.6 + rng.normal(size=2000) * 0.02]).astype(np.float32)
    pts = np.concatenate([wall, floor])
    valid = jnp.ones(len(pts), dtype=bool)
    gp = fit_ground_plane_ransac(
        jnp.asarray(pts), valid, jax.random.PRNGKey(3),
        distance_threshold=0.2, refinement_threshold=0.3,
        inliers_from_full_cloud=True)
    coeffs = np.asarray(gp.coeffs)
    assert abs(coeffs[2]) > 0.98  # normal is (near) z


def test_z_passthrough_filter(rng):
    # Points far below min_z must not influence the fit.
    plane = _plane_cloud(rng, n=5000, noise=0.05, d=1.6)
    deep = _plane_cloud(rng, n=5000, noise=0.05, d=50.0)  # z = -50
    pts = np.concatenate([plane, deep])
    valid = jnp.ones(len(pts), dtype=bool)
    gp = fit_ground_plane_ransac(
        jnp.asarray(pts), valid, jax.random.PRNGKey(11),
        distance_threshold=0.2, min_z=-5.0, max_z=5.0,
        refinement_threshold=0.3, inliers_from_full_cloud=True)
    coeffs = np.asarray(gp.coeffs)
    np.testing.assert_allclose(abs(coeffs[3]), 1.6, atol=0.1)


def test_insufficient_points():
    pts = jnp.zeros((100, 3), dtype=jnp.float32)
    valid = jnp.zeros(100, dtype=bool).at[0].set(True).at[1].set(True)
    gp = fit_ground_plane_ransac(pts, valid, jax.random.PRNGKey(0))
    assert not bool(gp.ok)


def test_semantic_plane(rng):
    # Camera looking along +z (lidar frame == camera frame for the test),
    # ground plane y = 1.5 in camera coordinates.
    H, W, f = 64, 96, 60.0
    ground_xz = rng.uniform([-3, 5], [3, 40], size=(3000, 2))
    ground = np.column_stack([
        ground_xz[:, 0], np.full(3000, 1.5) + rng.normal(size=3000) * 0.01,
        ground_xz[:, 1]]).astype(np.float32)
    other = rng.uniform([-3, -3, 5], [3, 1.0, 40], size=(2000, 3)).astype(np.float32)
    pts = np.concatenate([ground, other])
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], dtype=np.float32)
    # Build a semantic image: label 7 where ground points project.
    img = np.zeros((H, W), dtype=np.int32)
    proj = ground @ K.T
    uv = (proj[:, :2] / proj[:, 2:3]).astype(int)
    ok = (uv[:, 0] >= 0) & (uv[:, 0] < W) & (uv[:, 1] >= 0) & (uv[:, 1] < H)
    img[uv[ok, 1], uv[ok, 0]] = 7

    gp = fit_ground_plane_semantic(
        jnp.asarray(pts), jnp.ones(len(pts), dtype=bool),
        jnp.asarray(img), jnp.eye(3, dtype=jnp.float32),
        jnp.zeros(3, dtype=jnp.float32), jnp.asarray(K),
        inlier_threshold=0.1)
    assert bool(gp.ok)
    coeffs = np.asarray(gp.coeffs)
    # plane y = 1.5 → normal ±(0,1,0), |d| = 1.5
    assert abs(abs(coeffs[1]) - 1.0) < 0.05
    np.testing.assert_allclose(abs(coeffs[3]), 1.5, atol=0.1)
