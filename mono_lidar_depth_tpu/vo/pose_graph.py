"""Pose-graph optimization (the loop-closure backend).

Graph of absolute poses T_i (world←cam) with relative SE(3)
measurements Z_ij ≈ T_i⁻¹ T_j.  Gauss-Newton on the manifold with
right-perturbations T_i ← T_i exp(xi_i):

  r_e(xi) = log( Z_e⁻¹ · (T_i exp(xi_i))⁻¹ · (T_j exp(xi_j)) )

Edge Jacobians come from forward-mode autodiff of the residual at
xi = 0 (vmapped over edges — no hand-derived adjoints to get wrong),
and the sparse normal equations are solved with conjugate gradients
whose matvec is two gathers + two scatter-adds over the edge list —
O(E) per CG step, fully jittable, and the same structure shards over
devices by edge range (psum on the scatter result).

KITTI-scale: N ≈ 4500 poses, E ≈ N + loop closures; a dense 6N system
would be ~0.7 GB — the CG form never materializes it.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .lie import se3_exp, se3_log
from ..precision import f32_matmuls


class PoseGraph(NamedTuple):
    R: jnp.ndarray  # [N, 3, 3] world←cam rotations
    t: jnp.ndarray  # [N, 3]
    edge_i: jnp.ndarray  # [E] int32 source pose index
    edge_j: jnp.ndarray  # [E] int32 target pose index
    Z_R: jnp.ndarray  # [E, 3, 3] measured relative rotation (i→j)
    Z_t: jnp.ndarray  # [E, 3]
    # [E] scalar information scale (1 = unit), OR [E, 6] per-residual-
    # component weights in the se3_log ordering [rho (3), phi (3)] —
    # closure measurements often carry strong rotation but weak
    # translation information (far-landmark geometry), and a scalar
    # weight cannot express that.
    edge_weight: jnp.ndarray
    edge_valid: jnp.ndarray  # [E]
    fixed: jnp.ndarray  # [N] gauge-fixed poses


def _weight6(g: "PoseGraph") -> jnp.ndarray:
    """Canonicalize edge_weight to [E, 6] per-residual-component form."""
    w = g.edge_weight
    if w.ndim == 2:
        return w
    return jnp.broadcast_to(w[:, None], (w.shape[0], 6))


def _edge_residual(Ri, ti, Rj, tj, ZR, Zt, xi_i, xi_j):
    dRi, dti = se3_exp(xi_i)
    dRj, dtj = se3_exp(xi_j)
    Ri2 = Ri @ dRi
    ti2 = (Ri @ dti) + ti
    Rj2 = Rj @ dRj
    tj2 = (Rj @ dtj) + tj
    # rel = T_i^{-1} T_j
    R_rel = Ri2.T @ Rj2
    t_rel = Ri2.T @ (tj2 - ti2)
    # err = Z^{-1} rel
    R_err = ZR.T @ R_rel
    t_err = ZR.T @ (t_rel - Zt)
    return se3_log(R_err, t_err)


def _edge_lin(Ri, ti, Rj, tj, ZR, Zt):
    """Residual at xi=0 and Jacobians wrt xi_i, xi_j ([6,6] each)."""
    zero = jnp.zeros(6, dtype=ti.dtype)
    r0 = _edge_residual(Ri, ti, Rj, tj, ZR, Zt, zero, zero)
    Ji = jax.jacfwd(
        lambda xi: _edge_residual(Ri, ti, Rj, tj, ZR, Zt, xi, zero))(zero)
    Jj = jax.jacfwd(
        lambda xj: _edge_residual(Ri, ti, Rj, tj, ZR, Zt, zero, xj))(zero)
    return r0, Ji, Jj


@partial(jax.jit, static_argnames=("gn_iters", "cg_iters", "huber",
                                   "axis_name"))
@f32_matmuls
def optimize_pose_graph(graph: PoseGraph, gn_iters: int = 8,
                        cg_iters: int = 60, huber: float = 0.5,
                        damping: float = 1e-6,
                        axis_name: str | None = None) -> PoseGraph:
    """Run Gauss-Newton with CG inner solves; returns the updated graph.

    With `axis_name` the EDGE arrays are assumed sharded over that mesh
    axis (poses replicated): each device linearizes its edge shard and
    the per-pose scatter-adds (gradient b and the CG matvec result) are
    psum'd — the distributed form of the north star's "map blocks over
    hosts" (BASELINE.json config 4).  The CG state stays replicated, so
    every device computes identical alpha/beta and the iterates never
    diverge.  See dist.sharded.distributed_pose_graph."""
    N = graph.R.shape[0]

    def gn_step(_, g: PoseGraph) -> PoseGraph:
        Ri = g.R[g.edge_i]
        ti = g.t[g.edge_i]
        Rj = g.R[g.edge_j]
        tj = g.t[g.edge_j]
        r0, Ji, Jj = jax.vmap(_edge_lin)(Ri, ti, Rj, tj, g.Z_R, g.Z_t)

        err = jnp.linalg.norm(r0, axis=-1)
        w_h = jnp.where(err <= huber, 1.0, huber / jnp.maximum(err, 1e-12))
        w6 = _weight6(g)  # [E, 6]
        w = jnp.where(g.edge_valid[:, None], w6 * w_h[:, None], 0.0)

        free_i = ~g.fixed[g.edge_i]
        free_j = ~g.fixed[g.edge_j]
        Ji_m = Ji * free_i[:, None, None]
        Jj_m = Jj * free_j[:, None, None]

        # gradient b = J^T W r (W diagonal per residual component),
        # scattered per pose
        wr = w * r0  # [E, 6]
        bi = jnp.einsum("eri,er->ei", Ji_m, wr)
        bj = jnp.einsum("eri,er->ei", Jj_m, wr)
        b = (jnp.zeros((N, 6), r0.dtype)
             .at[g.edge_i].add(bi).at[g.edge_j].add(bj))
        if axis_name is not None:
            b = jax.lax.psum(b, axis_name)

        def matvec(x):  # H x with H = J^T w J + damping I
            xi = x[g.edge_i]
            xj = x[g.edge_j]
            Ax = (jnp.einsum("erc,ec->er", Ji_m, xi)
                  + jnp.einsum("erc,ec->er", Jj_m, xj))  # [E, 6]
            wAx = w * Ax
            yi = jnp.einsum("eri,er->ei", Ji_m, wAx)
            yj = jnp.einsum("eri,er->ei", Jj_m, wAx)
            y = (jnp.zeros((N, 6), x.dtype)
                 .at[g.edge_i].add(yi).at[g.edge_j].add(yj))
            if axis_name is not None:
                y = jax.lax.psum(y, axis_name)
            return y + damping * x

        # CG for H dx = -b
        def cg_body(_, st):
            x, r, p, rs = st
            Ap = matvec(p)
            denom = jnp.sum(p * Ap)
            alpha = rs / jnp.where(denom == 0, 1.0, denom)
            x = x + alpha * p
            r = r - alpha * Ap
            rs_new = jnp.sum(r * r)
            beta = rs_new / jnp.where(rs == 0, 1.0, rs)
            return x, r, p * beta + r, rs_new

        x0 = jnp.zeros((N, 6), r0.dtype)
        res = -b
        st = (x0, res, res, jnp.sum(res * res))
        dx, *_ = jax.lax.fori_loop(0, cg_iters, cg_body, st)
        dx = jnp.where(g.fixed[:, None], 0.0, dx)

        dR, dt = se3_exp(dx)
        R_new = g.R @ dR  # right perturbation
        t_new = (g.R @ dt[..., None])[..., 0] + g.t
        return g._replace(R=R_new, t=t_new)

    return jax.lax.fori_loop(0, gn_iters, gn_step, graph)


@f32_matmuls
def graph_cost(graph: PoseGraph) -> jnp.ndarray:
    Ri = graph.R[graph.edge_i]
    ti = graph.t[graph.edge_i]
    Rj = graph.R[graph.edge_j]
    tj = graph.t[graph.edge_j]
    zero = jnp.zeros(6, dtype=graph.t.dtype)
    r = jax.vmap(lambda a, b, c, d, e, f: _edge_residual(
        a, b, c, d, e, f, zero, zero))(Ri, ti, Rj, tj, graph.Z_R, graph.Z_t)
    return jnp.sum(jnp.where(graph.edge_valid,
                             jnp.sum(r * r * _weight6(graph), axis=-1), 0.0))


def sequential_edges(R: jnp.ndarray, t: jnp.ndarray,
                     noise_free: bool = True):
    """Build odometry-chain measurements from a pose sequence (helper
    for constructing graphs from VO output)."""
    N = R.shape[0]
    i = jnp.arange(N - 1, dtype=jnp.int32)
    j = i + 1
    Ri, Rj = R[:-1], R[1:]
    ti, tj = t[:-1], t[1:]
    Z_R = jnp.einsum("nij,nik->njk", Ri, Rj)  # Ri^T Rj
    Z_t = jnp.einsum("nij,ni->nj", Ri, tj - ti)  # Ri^T (tj - ti)
    return i, j, Z_R, Z_t
