"""Geometry primitive tests (camera, planes, rays, analytic eigensolver)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mono_lidar_depth_tpu.core.geometry import (
    SE3, PinholeCamera, plane_from_points, point_plane_distance,
    ray_plane_intersection, smallest_eigenvector_sym3x3, sym3x3_eigh,
    sym3x3_eigenvalues,
)


def test_project_unproject_roundtrip(rng):
    cam = PinholeCamera(width=1226, height=370, focal_length=707.0,
                        cx=601.9, cy=183.1)
    uv = rng.uniform([1, 1], [1225, 369], size=(100, 2)).astype(np.float32)
    rays = cam.viewing_rays(jnp.asarray(uv))
    # rays are unit
    np.testing.assert_allclose(np.linalg.norm(rays, axis=-1), 1.0, atol=1e-5)
    depths = rng.uniform(1, 80, size=(100, 1)).astype(np.float32)
    # Scale rays so z == depth, then reproject.
    pts = np.asarray(rays) / np.asarray(rays)[:, 2:3] * depths
    uv2, ok = cam.project(jnp.asarray(pts))
    assert bool(np.all(ok))
    np.testing.assert_allclose(np.asarray(uv2), uv, atol=1e-2)


def test_project_bounds():
    cam = PinholeCamera(width=100, height=100, focal_length=600.0, cx=50, cy=50)
    pts = jnp.array([
        [0.0, 0.0, 10.0],     # center -> (50, 50), in
        [10.0, 0.0, 10.0],    # u = 650, out
        [0.0, 0.0, -10.0],    # behind camera, mirrored uv still (50,50):
    ])
    uv, ok = cam.project(pts)
    assert bool(ok[0])
    assert not bool(ok[1])
    # The reference's getImagePoints does not test z > 0: a point behind
    # the camera can land "in bounds".  Our project() mirrors that (grid
    # construction applies the z > 0 rule separately).
    assert bool(ok[2])


def test_se3_roundtrip(rng):
    # random rotation via QR
    A = rng.normal(size=(3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    t = rng.normal(size=3)
    T = SE3(jnp.asarray(Q, dtype=jnp.float32), jnp.asarray(t, dtype=jnp.float32))
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    out = T.apply(jnp.asarray(pts))
    back = T.inverse().apply(out)
    np.testing.assert_allclose(np.asarray(back), pts, atol=1e-5)
    # compose with inverse == identity
    I = T.compose(T.inverse())
    np.testing.assert_allclose(np.asarray(I.rotation), np.eye(3), atol=1e-6)
    np.testing.assert_allclose(np.asarray(I.translation), 0.0, atol=1e-5)


def test_plane_from_points_and_intersection():
    # Plane z = 20 spanned by three points.
    p1 = jnp.array([[0.0, 0.0, 20.0]])
    p2 = jnp.array([[1.0, 0.0, 20.0]])
    p3 = jnp.array([[0.0, 1.0, 20.0]])
    n, d = plane_from_points(p1, p2, p3)
    np.testing.assert_allclose(np.abs(np.asarray(n)), [[0, 0, 1]], atol=1e-7)
    # Ray from origin through pixel direction (0.1, 0.2, 1)/norm.
    direction = jnp.array([[0.1, 0.2, 1.0]])
    direction = direction / jnp.linalg.norm(direction)
    origin = jnp.zeros((1, 3))
    point, depth = ray_plane_intersection(n, d, origin, direction)
    np.testing.assert_allclose(float(depth[0]), 20.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(point[0]), [2.0, 4.0, 20.0], atol=1e-3)


def test_ray_parallel_plane_disposed():
    n = jnp.array([[0.0, 0.0, 1.0]])
    d = jnp.array([-20.0])
    direction = jnp.array([[1.0, 0.0, 0.0]])  # parallel to plane
    origin = jnp.zeros((1, 3))
    _, depth = ray_plane_intersection(n, d, origin, direction)
    assert float(depth[0]) == -np.inf


def test_point_plane_distance():
    coeffs = jnp.array([0.0, 0.0, 2.0, -4.0])  # z = 2 (unnormalized)
    pts = jnp.array([[0.0, 0.0, 5.0], [1.0, 1.0, 2.0]])
    dist = point_plane_distance(pts, coeffs)
    np.testing.assert_allclose(np.asarray(dist), [3.0, 0.0], atol=1e-6)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_sym3x3_eigh_matches_numpy(seed):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(64, 3, 3)).astype(np.float32)
    S = (A + np.swapaxes(A, -1, -2)) / 2
    evals = np.asarray(sym3x3_eigenvalues(jnp.asarray(S)))
    ref = np.linalg.eigvalsh(S)
    np.testing.assert_allclose(evals, ref, atol=2e-5 * np.abs(ref).max())

    evals2, evecs = sym3x3_eigh(jnp.asarray(S))
    evals2, evecs = np.asarray(evals2), np.asarray(evecs)
    for i in range(3):
        # A v = lambda v
        Av = np.einsum("nij,nj->ni", S, evecs[:, i, :])
        lv = evals2[:, i:i + 1] * evecs[:, i, :]
        np.testing.assert_allclose(Av, lv, atol=5e-4 * max(1.0, np.abs(ref).max()))


def test_smallest_eigenvector_plane_normal(rng):
    # Scatter matrix of points on plane with normal n -> smallest
    # eigenvector must recover n.
    n = np.array([0.3, -0.5, 0.81])
    n /= np.linalg.norm(n)
    basis = np.linalg.svd(n[None, :])[2][1:]  # two vectors orthogonal to n
    pts = rng.normal(size=(200, 2)) @ basis
    S = pts.T @ pts  # 3x3 scatter, rank 2
    v = np.asarray(smallest_eigenvector_sym3x3(jnp.asarray(S, dtype=jnp.float32)))
    assert abs(abs(v @ n) - 1.0) < 1e-4


def test_degenerate_isotropic_matrix():
    # q*I: eigenvalues all q; eigenvector fallback must be a unit vector.
    A = jnp.eye(3)[None] * 2.5
    evals = np.asarray(sym3x3_eigenvalues(A))
    np.testing.assert_allclose(evals, 2.5, atol=1e-6)
    v = np.asarray(smallest_eigenvector_sym3x3(A))
    np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-6)
