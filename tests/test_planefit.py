"""Plane-fitting tests: spanning triangle, planarity, M-estimator, PCA."""

import numpy as np
import jax.numpy as jnp

from mono_lidar_depth_tpu.core.planefit import (
    check_planar, check_xz_flatness, first_three_points,
    least_squares_plane, max_spanning_triangle, mestimator_plane,
    pca_classify)


def _batch(points, mask=None):
    pts = jnp.asarray(points, dtype=jnp.float32)[None]
    if mask is None:
        m = jnp.ones(pts.shape[:2], dtype=bool)
    else:
        m = jnp.asarray(mask, dtype=bool)[None]
    return pts, m


def triangle_oracle(points, mask, thresh=0.0):
    """Literal port of PlaneEstimationCalcMaxSpanningTriangle.cpp:37-144
    over the masked subsequence (including considering ALL k, i.e. the
    corrected loop bound; see planefit.max_spanning_triangle docstring)."""
    pts = [np.asarray(p) for p, m in zip(points, mask) if m]
    n = len(pts)
    if n < 3:
        return None
    maxd, mi, mj = -1.0, -1, -1
    for i in range(n - 1):
        for j in range(i + 1, n):
            d = float(np.sum((pts[i] - pts[j]) ** 2))
            if d > maxd:
                maxd, mi, mj = d, i, j
    if maxd <= thresh:
        return None
    maxd2, mk = -1.0, -1
    for k in range(n):
        if k in (mi, mj):
            continue
        d1 = float(np.sum((pts[k] - pts[mi]) ** 2))
        if d1 <= thresh:
            continue
        d2 = float(np.sum((pts[k] - pts[mj]) ** 2))
        if d2 <= thresh:
            continue
        if d1 + d2 > maxd2:
            maxd2, mk = d1 + d2, k
    if mk < 0:
        return None
    return pts[mi], pts[mj], pts[mk]


def test_triangle_simple():
    pts = [[0, 0, 0], [10, 0, 0], [5, 5, 0], [5, 1, 0]]
    p, m = _batch(pts)
    out = max_spanning_triangle(p, m)
    assert bool(out.ok[0])
    corners = np.asarray(out.corners[0])
    # farthest pair is (0, 1); third point maximizes summed distance → (5,5,0)
    np.testing.assert_allclose(corners[0], [0, 0, 0])
    np.testing.assert_allclose(corners[1], [10, 0, 0])
    np.testing.assert_allclose(corners[2], [5, 5, 0])


def test_triangle_fuzz_oracle(rng):
    for _ in range(50):
        k = 12
        pts = rng.normal(size=(k, 3)).astype(np.float32) * 3
        mask = rng.random(k) < 0.8
        p, m = _batch(pts, mask)
        out = max_spanning_triangle(p, m)
        oracle = triangle_oracle(pts, mask)
        if oracle is None:
            assert not bool(out.ok[0])
        else:
            assert bool(out.ok[0])
            got = np.asarray(out.corners[0])
            for g, o in zip(got, oracle):
                np.testing.assert_allclose(g, o, atol=1e-6)


def test_triangle_insufficient():
    pts = [[0, 0, 0], [1, 0, 0], [0, 1, 0]]
    p, m = _batch(pts, [True, True, False])
    out = max_spanning_triangle(p, m)
    assert not bool(out.ok[0])
    # coincident points
    p2, m2 = _batch([[1, 1, 1]] * 5)
    out2 = max_spanning_triangle(p2, m2)
    assert not bool(out2.ok[0])


def test_first_three_points():
    pts = [[9, 9, 9], [1, 1, 1], [2, 2, 2], [3, 3, 3], [4, 4, 4]]
    mask = [False, True, True, False, True]
    p, m = _batch(pts, mask)
    out = first_three_points(p, m)
    assert bool(out.ok[0])
    got = np.asarray(out.corners[0])
    np.testing.assert_allclose(got, [[1, 1, 1], [2, 2, 2], [4, 4, 4]])


def test_check_planar():
    good = jnp.asarray([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], dtype=jnp.float32)
    assert bool(check_planar(good, 0.1)[0])
    # nearly collinear triangle
    bad = jnp.asarray([[[0, 0, 0], [1, 0, 0], [2, 1e-4, 0]]], dtype=jnp.float32)
    assert not bool(check_planar(bad, 0.1)[0])


def test_mestimator_recovers_plane(rng):
    # Points on plane z = 5 + noise; prior = same plane → near-uniform
    # weights; normal must recover (0,0,1).
    k = 40
    xy = rng.uniform(-5, 5, size=(k, 2))
    z = 5.0 + rng.normal(size=k) * 0.01
    pts = np.column_stack([xy, z]).astype(np.float32)
    p, m = _batch(pts)
    prior_n = jnp.asarray([[0.0, 0.0, 1.0]])
    prior_d = jnp.asarray([-5.0])
    fit = mestimator_plane(p, m, prior_n, prior_d)
    assert bool(fit.ok[0])
    n = np.asarray(fit.normal[0])
    assert abs(abs(n[2]) - 1.0) < 1e-3
    np.testing.assert_allclose(np.asarray(fit.anchor[0])[2], 5.0, atol=0.05)


def test_mestimator_prior_downweights_outliers(rng):
    # Half the points on the prior plane z=0, half on z=3.  Prior
    # weights (1/dist) pull the fit toward the z=0 set.
    k = 20
    xy = rng.uniform(-5, 5, size=(k, 2))
    pts = np.zeros((2 * k, 3), dtype=np.float32)
    pts[:k, :2] = xy
    pts[:k, 2] = rng.normal(size=k) * 0.02
    pts[k:, :2] = xy
    pts[k:, 2] = 3.0
    p, m = _batch(pts)
    fit = mestimator_plane(p, m, jnp.asarray([[0.0, 0.0, 1.0]]),
                           jnp.asarray([0.0]))
    anchor_z = float(fit.anchor[0][2])
    assert anchor_z < 0.5  # strongly pulled to the prior plane


def test_least_squares_plane(rng):
    xy = rng.uniform(-5, 5, size=(30, 2))
    n_true = np.array([0.2, -0.3, 0.93])
    n_true /= np.linalg.norm(n_true)
    basis = np.linalg.svd(n_true[None])[2][1:]
    pts = (xy @ basis + np.array([1.0, 2.0, 3.0])).astype(np.float32)
    p, m = _batch(pts)
    fit = least_squares_plane(p, m)
    n = np.asarray(fit.normal[0])
    assert abs(abs(n @ n_true) - 1.0) < 1e-4


def test_pca_classification(rng):
    cfgs = dict(treshold_3_abs_min=0.005, treshold_3_2_rel_max=0.9,
                treshold_2_1_rel_min=0.3)
    # planar set
    xy = rng.uniform(-3, 3, size=(40, 2))
    plane = np.column_stack([xy, 0.01 * rng.normal(size=40)]).astype(np.float32)
    p, m = _batch(plane)
    out = pca_classify(p, m, **cfgs)
    assert bool(out.is_plane[0])
    n = np.asarray(out.normal[0])
    assert abs(abs(n[2]) - 1.0) < 1e-2
    # A perfect line: reference checks "cubic" (planarity) FIRST
    # (PCA.cpp:27-35), and a line has planarity ≈ 0 → classified Cubic,
    # not Linear.  Faithfully replicated quirk.
    t = rng.uniform(-3, 3, size=40)
    line = np.column_stack([t, 2 * t, 0.01 * rng.normal(size=40)]).astype(np.float32)
    p, m = _batch(line)
    out = pca_classify(p, m, **cfgs)
    assert bool(out.is_cubic[0])
    # Linear is reachable only with planarity above the cubic threshold
    # and linearity above 3_2_rel_max: a line with slight planar spread.
    spread = np.column_stack(
        [t, 0.25 * rng.normal(size=40), 0.001 * rng.normal(size=40)]
    ).astype(np.float32)
    p, m = _batch(spread)
    out = pca_classify(p, m, treshold_3_abs_min=0.005,
                       treshold_3_2_rel_max=0.8, treshold_2_1_rel_min=0.001)
    assert bool(out.is_linear[0])
    # point set (tiny scatter)
    pt = (0.001 * rng.normal(size=(40, 3))).astype(np.float32)
    p, m = _batch(pt)
    out = pca_classify(p, m, **cfgs)
    assert bool(out.is_point[0]) or bool(out.is_cubic[0])
    # cubic set (isotropic blob)
    blob = rng.normal(size=(60, 3)).astype(np.float32)
    p, m = _batch(blob)
    out = pca_classify(p, m, **cfgs)
    assert bool(out.is_cubic[0])


def test_xz_flatness():
    # wide in z, narrow in x → flat enough
    pts = np.array([[0, 0, 0], [0.5, 0, 5], [0.2, 0, 10]], dtype=np.float32)
    p, m = _batch(pts)
    assert bool(check_xz_flatness(p, m, 1.0)[0])
    # wide in x, narrow in z → not flat
    pts2 = np.array([[0, 0, 0], [5, 0, 0.5], [10, 0, 0.2]], dtype=np.float32)
    p, m = _batch(pts2)
    assert not bool(check_xz_flatness(p, m, 1.0)[0])
