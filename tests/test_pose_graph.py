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
