"""VO layer tests: Lie maps, GN pose estimation, bundle adjustment."""

import numpy as np
import jax.numpy as jnp

from mono_lidar_depth_tpu import PinholeCamera
from mono_lidar_depth_tpu.vo import (
    BAProblem, ate_rmse, estimate_pose_gn, rpe_stats, run_ba, se3_exp,
    se3_log, so3_exp, so3_log)

CAM = PinholeCamera(width=640, height=480, focal_length=500.0, cx=320.0, cy=240.0)


def rand_rotation(rng, scale=1.0):
    return np.asarray(so3_exp(jnp.asarray(
        rng.normal(size=3) * scale, dtype=jnp.float32)))


def test_so3_roundtrip(rng):
    for scale in (1e-6, 0.1, 1.0, 3.0):
        phi = rng.normal(size=(16, 3)).astype(np.float32)
        phi = phi / np.linalg.norm(phi, axis=1, keepdims=True) * scale
        R = so3_exp(jnp.asarray(phi))
        phi2 = np.asarray(so3_log(R))
        np.testing.assert_allclose(phi2, phi, atol=5e-4 * max(1, scale))


def test_so3_orthonormal(rng):
    phi = rng.normal(size=(32, 3)).astype(np.float32)
    R = np.asarray(so3_exp(jnp.asarray(phi)))
    should_eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(should_eye, np.tile(np.eye(3), (32, 1, 1)),
                               atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_se3_roundtrip(rng):
    xi = rng.normal(size=(16, 6)).astype(np.float32)
    R, t = se3_exp(jnp.asarray(xi))
    xi2 = np.asarray(se3_log(R, t))
    np.testing.assert_allclose(xi2, xi, atol=2e-3)


def _scene(rng, n=200):
    """Random landmarks in front of the camera."""
    X = np.stack([
        rng.uniform(-10, 10, n),
        rng.uniform(-5, 5, n),
        rng.uniform(8, 40, n)], axis=1).astype(np.float32)
    return X


def _project(X, R, t):
    p = X @ R.T + t
    uv = np.stack([500.0 * p[:, 0] / p[:, 2] + 320.0,
                   500.0 * p[:, 1] / p[:, 2] + 240.0], axis=1)
    return uv.astype(np.float32), p


def test_pose_gn_exact(rng):
    X = _scene(rng)
    R_true = rand_rotation(rng, 0.1)
    t_true = np.array([0.3, -0.1, 0.8], np.float32)
    uv, _ = _project(X, R_true, t_true)
    est = estimate_pose_gn(CAM, jnp.asarray(X), jnp.asarray(uv),
                           jnp.ones(len(X), bool))
    np.testing.assert_allclose(np.asarray(est.rotation), R_true, atol=1e-4)
    np.testing.assert_allclose(np.asarray(est.translation), t_true, atol=1e-3)
    assert float(est.mean_error) < 0.05
    assert int(est.num_inliers) == len(X)


def test_pose_gn_with_outliers(rng):
    X = _scene(rng, 300)
    R_true = rand_rotation(rng, 0.05)
    t_true = np.array([0.5, 0.0, 1.2], np.float32)
    uv, _ = _project(X, R_true, t_true)
    uv_noisy = uv + rng.normal(size=uv.shape).astype(np.float32) * 0.3
    # 20% gross outliers
    n_out = 60
    idx = rng.choice(len(X), n_out, replace=False)
    uv_noisy[idx] += rng.uniform(30, 120, (n_out, 2)).astype(np.float32)
    est = estimate_pose_gn(CAM, jnp.asarray(X), jnp.asarray(uv_noisy),
                           jnp.ones(len(X), bool), iters=15)
    # rotation within ~0.3 deg, translation within 5 cm
    dR = np.asarray(est.rotation) @ R_true.T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 0.4, ang
    np.testing.assert_allclose(np.asarray(est.translation), t_true, atol=0.08)
    assert int(est.num_inliers) >= 300 - n_out - 20


def test_pose_gn_masked_invalid(rng):
    X = _scene(rng, 100)
    R_true = np.eye(3, dtype=np.float32)
    t_true = np.array([0.1, 0.0, 0.2], np.float32)
    uv, _ = _project(X, R_true, t_true)
    # corrupt half the entries but mask them out
    valid = np.arange(100) < 50
    uv[50:] = 1e5
    est = estimate_pose_gn(CAM, jnp.asarray(X), jnp.asarray(uv),
                           jnp.asarray(valid))
    np.testing.assert_allclose(np.asarray(est.translation), t_true, atol=1e-2)


def _ba_problem(rng, K=4, L=120, noise_px=0.5, pose_noise=0.05,
                lm_noise=0.3, depth_prior=True):
    X = _scene(rng, L)
    Rs, ts, uvs, masks, dpri, dmask = [], [], [], [], [], []
    for k in range(K):
        R_k = rand_rotation(rng, 0.02 * k)
        t_k = np.array([0.5 * k + rng.normal() * 0.01, 0, 0.2 * k],
                       np.float32)
        uv, p = _project(X, R_k, t_k)
        uv += rng.normal(size=uv.shape).astype(np.float32) * noise_px
        m = ((uv[:, 0] > 0) & (uv[:, 0] < 640)
             & (uv[:, 1] > 0) & (uv[:, 1] < 480) & (p[:, 2] > 1))
        Rs.append(R_k)
        ts.append(t_k)
        uvs.append(uv)
        masks.append(m)
        dpri.append(p[:, 2].astype(np.float32))
        dmask.append(m & (rng.random(L) < 0.6))
    R_gt = np.stack(Rs)
    t_gt = np.stack(ts)
    # perturb initial guesses (except fixed pose 0)
    R0 = R_gt.copy()
    t0 = t_gt.copy()
    for k in range(1, K):
        R0[k] = rand_rotation(rng, pose_noise) @ R_gt[k]
        t0[k] = t_gt[k] + rng.normal(size=3).astype(np.float32) * pose_noise
    X0 = X + rng.normal(size=X.shape).astype(np.float32) * lm_noise
    problem = BAProblem(
        R=jnp.asarray(R0), t=jnp.asarray(t0), landmarks=jnp.asarray(X0),
        obs_uv=jnp.asarray(np.stack(uvs)), obs_mask=jnp.asarray(np.stack(masks)),
        depth_prior=jnp.asarray(np.stack(dpri)) if depth_prior else
        jnp.zeros((K, L), jnp.float32),
        depth_mask=jnp.asarray(np.stack(dmask)) if depth_prior else
        jnp.zeros((K, L), bool),
        fixed=jnp.asarray(np.arange(K) == 0),
        lm_valid=jnp.ones(L, bool))
    return problem, R_gt, t_gt, X


def test_ba_converges(rng):
    problem, R_gt, t_gt, X_gt = _ba_problem(rng)
    res = run_ba(CAM, problem, iters=10)
    assert float(res.final_cost) < float(res.initial_cost) * 0.1
    out = res.problem
    # poses recovered
    for k in range(1, 4):
        dR = np.asarray(out.R[k]) @ R_gt[k].T
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        assert ang < 0.3, (k, ang)
        np.testing.assert_allclose(np.asarray(out.t[k]), t_gt[k], atol=0.05)
    # landmarks recovered (median — some are weakly observed)
    lm_err = np.linalg.norm(np.asarray(out.landmarks) - X_gt, axis=1)
    assert np.median(lm_err) < 0.15


def test_ba_depth_prior_fixes_scale(rng):
    # Without depth priors monocular BA has a scale gauge freedom; with
    # lidar priors the scale must lock to metric.
    problem, R_gt, t_gt, X_gt = _ba_problem(rng, depth_prior=True)
    # scale the initial guess by 1.3 (landmarks + translations)
    problem = problem._replace(
        landmarks=problem.landmarks * 1.3, t=problem.t * 1.3)
    res = run_ba(CAM, problem, iters=15, depth_weight=4.0)
    out = res.problem
    t_norm = np.linalg.norm(np.asarray(out.t[1:]), axis=1)
    gt_norm = np.linalg.norm(t_gt[1:], axis=1)
    np.testing.assert_allclose(t_norm, gt_norm, rtol=0.05)


def test_ba_fixed_pose_untouched(rng):
    problem, *_ = _ba_problem(rng)
    res = run_ba(CAM, problem, iters=5)
    np.testing.assert_allclose(np.asarray(res.problem.R[0]),
                               np.asarray(problem.R[0]), atol=1e-7)
    np.testing.assert_allclose(np.asarray(res.problem.t[0]),
                               np.asarray(problem.t[0]), atol=1e-7)


def test_metrics():
    rng = np.random.default_rng(0)
    gt = np.cumsum(rng.normal(size=(50, 3)), axis=0)
    # rigidly transformed + noisy estimate
    R = np.asarray(so3_exp(jnp.asarray([0.1, -0.2, 0.3], dtype=jnp.float32)))
    est = gt @ R.T + np.array([5.0, -2.0, 1.0])
    assert ate_rmse(est, gt) < 1e-5  # alignment removes the transform
    est_noisy = est + rng.normal(size=est.shape) * 0.1
    rmse = ate_rmse(est_noisy, gt)
    assert 0.05 < rmse < 0.3
    # rpe on identical pose sequences = 0
    poses = np.tile(np.eye(4), (10, 1, 1))
    for i in range(10):
        poses[i, :3, 3] = [i, 0, 0]
    out = rpe_stats(poses, poses.copy())
    assert out["trans_rmse"] < 1e-9 and out["rot_rmse_deg"] < 1e-6


def test_so3_log_near_pi_degenerate_axes():
    """Near-pi rotations about axes with a ~0 component must roundtrip
    (regression: the pi-branch sign reconstruction fixed signs only
    against component 0 and lost the y/z relative sign for a_x ~ 0)."""
    axes = [
        [0.0, 1.0, -1.0], [0.0, 1.0, 1.0], [1.0, 0.0, -1.0],
        [0.0, 0.0, 1.0], [1e-4, 0.7, -0.714], [-1.0, 0.0, 0.0],
    ]
    for a in axes:
        a = np.asarray(a) / np.linalg.norm(a)
        for th in (np.pi, np.pi - 1e-4, np.pi - 5e-4):
            phi = (a * th).astype(np.float32)
            R = so3_exp(jnp.asarray(phi))
            R2 = so3_exp(so3_log(R))
            np.testing.assert_allclose(np.asarray(R2), np.asarray(R),
                                       atol=3e-3)
