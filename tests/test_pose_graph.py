"""Pose-graph optimization tests."""

import numpy as np
import jax.numpy as jnp

from mono_lidar_depth_tpu.vo.lie import so3_exp
from mono_lidar_depth_tpu.vo.pose_graph import (
    PoseGraph, graph_cost, optimize_pose_graph, sequential_edges)


def _circle_traj(N=40, radius=20.0):
    """Ground-truth loop: camera moving on a circle, heading tangent."""
    th = np.linspace(0, 2 * np.pi, N, endpoint=False)
    t = np.stack([radius * np.cos(th), radius * np.sin(th),
                  np.zeros(N)], 1).astype(np.float32)
    R = np.zeros((N, 3, 3), np.float32)
    for k in range(N):
        fwd = np.array([-np.sin(th[k]), np.cos(th[k]), 0.0])
        up = np.array([0.0, 0.0, 1.0])
        left = np.cross(up, fwd)
        R[k] = np.stack([left, up, fwd], axis=1)  # columns: x,y,z axes
    return R, t


def _rel(Ri, ti, Rj, tj):
    ZR = Ri.T @ Rj
    Zt = Ri.T @ (tj - ti)
    return ZR, Zt


def _build_graph(rng, drift=0.02, n_loop=4):
    R_gt, t_gt = _circle_traj()
    N = len(R_gt)
    # odometry with accumulating drift
    R_est = [R_gt[0]]
    t_est = [t_gt[0]]
    edges = []
    for k in range(1, N):
        ZR, Zt = _rel(R_gt[k - 1], t_gt[k - 1], R_gt[k], t_gt[k])
        # corrupt odometry
        dR = np.asarray(so3_exp(jnp.asarray(
            rng.normal(size=3).astype(np.float32) * drift * 0.2)))
        ZR_n = ZR @ dR
        Zt_n = Zt + rng.normal(size=3).astype(np.float32) * drift
        R_prev = R_est[-1]
        R_est.append(R_prev @ ZR_n)
        t_est.append(R_prev @ Zt_n + t_est[-1])
        edges.append((k - 1, k, ZR_n, Zt_n, 1.0))
    # exact loop-closure edges
    for _ in range(n_loop):
        i, j = sorted(rng.choice(N, 2, replace=False))
        if j - i < 5:
            continue
        ZR, Zt = _rel(R_gt[i], t_gt[i], R_gt[j], t_gt[j])
        edges.append((i, j, ZR, Zt, 10.0))
    # close the loop N-1 -> 0
    ZR, Zt = _rel(R_gt[N - 1], t_gt[N - 1], R_gt[0], t_gt[0])
    edges.append((N - 1, 0, ZR, Zt, 10.0))

    E = len(edges)
    g = PoseGraph(
        R=jnp.asarray(np.stack(R_est)), t=jnp.asarray(np.stack(t_est)),
        edge_i=jnp.asarray(np.array([e[0] for e in edges], np.int32)),
        edge_j=jnp.asarray(np.array([e[1] for e in edges], np.int32)),
        Z_R=jnp.asarray(np.stack([e[2] for e in edges]).astype(np.float32)),
        Z_t=jnp.asarray(np.stack([e[3] for e in edges]).astype(np.float32)),
        edge_weight=jnp.asarray(np.array([e[4] for e in edges], np.float32)),
        edge_valid=jnp.ones(E, bool),
        fixed=jnp.asarray(np.arange(len(R_est)) == 0))
    return g, R_gt, t_gt


def test_loop_closure_fixes_drift(rng):
    g, R_gt, t_gt = _build_graph(rng)
    drift_before = float(jnp.linalg.norm(g.t[-1] - jnp.asarray(t_gt[-1])))
    out = optimize_pose_graph(g, gn_iters=10, cg_iters=80)
    err_after = np.linalg.norm(np.asarray(out.t) - t_gt, axis=1)
    assert float(graph_cost(out)) < float(graph_cost(g))
    # drift at the loop end must shrink substantially
    assert err_after[-1] < 0.5 * max(drift_before, 1e-9)
    # residual mid-loop drift remains (only a handful of closures over
    # noisy odometry); mean error well under the odometry-only drift
    assert err_after.mean() < 0.6


def test_perfect_graph_stays(rng):
    R_gt, t_gt = _circle_traj(20)
    i, j, ZR, Zt = sequential_edges(jnp.asarray(R_gt), jnp.asarray(t_gt))
    g = PoseGraph(
        R=jnp.asarray(R_gt), t=jnp.asarray(t_gt),
        edge_i=i, edge_j=j, Z_R=ZR, Z_t=Zt,
        edge_weight=jnp.ones(len(i)), edge_valid=jnp.ones(len(i), bool),
        fixed=jnp.asarray(np.arange(20) == 0))
    assert float(graph_cost(g)) < 1e-8
    out = optimize_pose_graph(g, gn_iters=3, cg_iters=30)
    np.testing.assert_allclose(np.asarray(out.t), t_gt, atol=1e-3)


def test_fixed_pose_untouched(rng):
    g, *_ = _build_graph(rng)
    out = optimize_pose_graph(g, gn_iters=4, cg_iters=40)
    np.testing.assert_allclose(np.asarray(out.R[0]), np.asarray(g.R[0]),
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(out.t[0]), np.asarray(g.t[0]),
                               atol=1e-7)


def test_component_weights_gate_translation(rng):
    """[E, 6] per-component edge weights: a loop-closure edge whose
    TRANSLATION components carry a gross error but zero weight must
    still contribute its (exact) rotation — the drifted graph's
    rotations converge as if the closure translation were absent,
    and the bogus translation must NOT be pulled in."""
    g, R_gt, t_gt = _build_graph(rng, n_loop=0)
    E = g.edge_i.shape[0]
    N = g.R.shape[0]
    # one closure N-1 -> 0: exact rotation, translation off by 30 m
    ZR, Zt = _rel(R_gt[N - 1], t_gt[N - 1], R_gt[0], t_gt[0])
    Zt_bad = Zt + np.array([30.0, 0, 0], np.float32)
    w6_all = np.broadcast_to(
        np.asarray(g.edge_weight)[:, None], (E, 6)).astype(np.float32)
    w_cl = np.array([0, 0, 0, 20, 20, 20], np.float32)  # rot-only
    g6 = g._replace(
        edge_i=jnp.concatenate([g.edge_i, jnp.asarray([N - 1], jnp.int32)]),
        edge_j=jnp.concatenate([g.edge_j, jnp.asarray([0], jnp.int32)]),
        Z_R=jnp.concatenate([g.Z_R, jnp.asarray(ZR, jnp.float32)[None]]),
        Z_t=jnp.concatenate([g.Z_t, jnp.asarray(Zt_bad, jnp.float32)[None]]),
        edge_weight=jnp.asarray(np.concatenate([w6_all, w_cl[None]])),
        edge_valid=jnp.ones(E + 1, bool))
    out = optimize_pose_graph(g6, gn_iters=6, cg_iters=60)
    # rotation improved toward the closure's exact measurement
    rel_fin = np.asarray(out.R[N - 1]).T @ np.asarray(out.R[0])
    ang_fin = np.degrees(np.arccos(np.clip(
        (np.trace(ZR.T @ rel_fin) - 1) / 2, -1, 1)))
    assert ang_fin < 1.0, f"closure rotation not honored ({ang_fin:.2f} deg)"
    # ...and the 30 m bogus translation was NOT pulled in: the final
    # N-1 -> 0 relative translation stays near the drifted-odometry
    # prediction, nowhere near the corrupted measurement
    t_fin = np.asarray(out.R[N - 1]).T @ (
        np.asarray(out.t[0]) - np.asarray(out.t[N - 1]))
    assert np.linalg.norm(t_fin - Zt_bad) > 15.0, (
        "zero-weight translation was pulled toward the bogus measurement")


def test_odometry_bias_estimation_recovers_systematic_drift():
    """A systematic per-frame odometry bias (yaw + scale — the classic
    uncalibrated-VO error model) is unrecoverable by the per-pose solve
    alone when closures only tie the loop's endpoints: the robust loss
    treats the enormous misclosure as outlier, the interior stays bent,
    and recovery plateaus (measured: 14.6% at 1.0°/frame regardless of
    iterations/weights).  run_pose_graph_backend's bias estimation
    reads the rotation bias directly from the closure measurements vs
    the chain-composed prediction — data-derived axis + global
    angle-per-frame grid (the per-closure log ALIASES past 180° of
    accumulated discrepancy, so a local estimator walks the wrong
    way), monotone refinement, then the accepted bias is folded into
    the trajectory so the solve starts at the corrected chain instead
    of hundreds of degrees away.  The 1.5°/frame injection here sits
    squarely in the wrapped regime (gap 170 → 255° discrepancy).
    Scale bias is deliberately NOT estimated (see the in-code note:
    it overfits common-mode chain noise); the solve from the
    straightened init absorbs the modest scale error.  Also asserts
    the no-op guarantee: on unbiased odometry the estimator must
    leave the solution unchanged (fold-in floor + 30%-reduction
    accept gate)."""
    from mono_lidar_depth_tpu.eval.kitti_eval import (
        _so3_exp, run_pose_graph_backend)
    from mono_lidar_depth_tpu.vo.metrics import ate_rmse

    F = 200
    th = np.linspace(0, 2 * np.pi, F)
    rad = 20.0
    gt = np.tile(np.eye(4), (F, 1, 1))
    for k in range(F):
        c, s = np.cos(th[k]), np.sin(th[k])
        gt[k, :3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        gt[k, :3, 3] = [rad * np.sin(th[k]), 0.0,
                        rad * (1 - np.cos(th[k]))]
    rng = np.random.default_rng(0)
    yaw = np.radians(1.5)
    dR = _so3_exp(np.array([0.0, yaw, 0.0]))
    drift = [gt[0]]
    for k in range(F - 1):
        rel = np.linalg.inv(gt[k]) @ gt[k + 1]
        rel[:3, :3] = rel[:3, :3] @ dR @ _so3_exp(
            rng.normal(0, 0.002, 3))
        rel[:3, 3] = rel[:3, 3] * 1.03 + rng.normal(0, 0.01, 3)
        drift.append(drift[-1] @ rel)
    drift = np.stack(drift)
    closures = []
    for (i, j) in [(0, 170), (5, 175), (10, 180),
                   (15, 185), (20, 190), (25, 195)]:
        Z = np.linalg.inv(gt[i]) @ gt[j]
        closures.append((i, j,
                         Z[:3, :3] @ _so3_exp(rng.normal(0, 0.003, 3)),
                         Z[:3, 3] + rng.normal(0, 0.05, 3),
                         np.ones(6, np.float32)))
    ate_drift = float(ate_rmse(drift[:, :3, 3], gt[:, :3, 3]))
    assert ate_drift > 20.0  # bias injection dominates

    opt0 = run_pose_graph_backend(drift, closures,
                                  consistency_filter=False,
                                  bias_alternations=0)
    opt2 = run_pose_graph_backend(drift, closures,
                                  consistency_filter=False)
    ate0 = float(ate_rmse(opt0[:, :3, 3], gt[:, :3, 3]))
    ate2 = float(ate_rmse(opt2[:, :3, 3], gt[:, :3, 3]))
    # bias estimation must recover the drift almost completely AND
    # beat the bias-blind solve decisively (measured: drift 28.7 m,
    # bias-blind 21.7 m, bias-estimated 0.61 m)
    assert ate2 < 0.1 * ate_drift, (ate_drift, ate0, ate2)
    assert ate2 < 0.5 * ate0, (ate0, ate2)

    # no-op guarantee on unbiased odometry: identical output
    clean_closures = []
    for (i, j) in [(0, 170), (10, 180), (20, 190)]:
        Z = np.linalg.inv(gt[i]) @ gt[j]
        clean_closures.append((i, j, Z[:3, :3].copy(), Z[:3, 3].copy()))
    a = run_pose_graph_backend(gt.copy(), clean_closures,
                               consistency_filter=False,
                               bias_alternations=0)
    b = run_pose_graph_backend(gt.copy(), clean_closures,
                               consistency_filter=False)
    assert np.allclose(a, b, atol=1e-6)


def test_odometry_bias_multilap_alias_rejected():
    """Multi-lap circuits make revisit gaps COMMENSURATE (multiples of
    the lap length), so the bias-estimation misclosure profile has
    perfect aliases at 360°/lap per frame — and an alias can score
    better than the truth by absorbing common-mode chain noise
    (measured: alias accepted -> ATE 2.0 -> 22.3 m on the 3-lap
    synthetic; at endurance scale the folded alias diverged the solve
    to 1e7 m).  The Occam prior on |bias| in the selection objective
    must reject the alias: with a true 0.4°/frame yaw bias the bias
    path must beat the bias-blind solve, and with NO bias the output
    must be bit-identical (no-op guarantee)."""
    from mono_lidar_depth_tpu.eval.kitti_eval import (
        _so3_exp, run_pose_graph_backend)
    from mono_lidar_depth_tpu.vo.metrics import ate_rmse

    LAP, NLAP = 150, 2
    F = LAP * NLAP
    rad = 15.0
    gt = np.tile(np.eye(4), (F, 1, 1))
    for k in range(F):
        a = 2 * np.pi * (k % LAP) / LAP
        c, s = np.cos(a), np.sin(a)
        gt[k, :3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        gt[k, :3, 3] = [rad * np.sin(a), 0.0, rad * (1 - np.cos(a))]
    rng = np.random.default_rng(1)
    cls = []
    for (i, j) in [(0, 150), (30, 180), (60, 210), (90, 240),
                   (120, 270)]:
        Z = np.linalg.inv(gt[i]) @ gt[j]
        cls.append((i, j, Z[:3, :3] @ _so3_exp(rng.normal(0, 0.003, 3)),
                    Z[:3, 3] + rng.normal(0, 0.05, 3),
                    np.ones(6, np.float32)))

    def integrate(yaw_deg, scale):
        dR = _so3_exp(np.array([0.0, np.radians(yaw_deg), 0.0]))
        r = np.random.default_rng(1)
        out = [gt[0]]
        for k in range(F - 1):
            rel = np.linalg.inv(gt[k]) @ gt[k + 1]
            rel[:3, :3] = rel[:3, :3] @ dR @ _so3_exp(
                r.normal(0, 0.003, 3))
            rel[:3, 3] = rel[:3, 3] * scale + r.normal(0, 0.015, 3)
            out.append(out[-1] @ rel)
        return np.stack(out)

    drift = integrate(0.4, 1.02)
    ate_d = float(ate_rmse(drift[:, :3, 3], gt[:, :3, 3]))
    assert ate_d > 5.0
    o0 = run_pose_graph_backend(drift, cls, consistency_filter=False,
                                bias_alternations=0)
    o2 = run_pose_graph_backend(drift, cls, consistency_filter=False)
    a0 = float(ate_rmse(o0[:, :3, 3], gt[:, :3, 3]))
    a2 = float(ate_rmse(o2[:, :3, 3], gt[:, :3, 3]))
    # measured: drift 9.65, bias-blind 0.50, bias path 0.28
    assert a2 < 0.05 * ate_d, (ate_d, a0, a2)
    assert a2 < 0.8 * a0, (a0, a2)

    clean = integrate(0.0, 1.0)
    c0 = run_pose_graph_backend(clean, cls, consistency_filter=False,
                                bias_alternations=0)
    c2 = run_pose_graph_backend(clean, cls, consistency_filter=False)
    assert np.allclose(c0, c2, atol=1e-6)
