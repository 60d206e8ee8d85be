"""Sliding-window bundle adjustment with depth priors (Schur form).

The keyframe BA backend of the VO layer (the north-star extension,
BASELINE.json; the reference repo produces this solver's INPUT —
depth-augmented tracklets — and feeds LIMO's external
keyframe_bundle_adjustment).

TPU-first structure: the observation set is a dense [K, L] grid
(K keyframes × L landmark slots) with a mask — no sparse indexing, so
every Jacobian/Hessian contraction is an einsum that XLA maps onto the
MXU.  One Gauss-Newton iteration is:

  residuals:  reprojection [K, L, 2] + lidar depth prior [K, L]
  blocks:     Hpp [K,6,6], Hll [L,3,3], Hpl [K,L,6,3], gradients
  Schur:      S = Hpp ⊕ − W Hplᵀ with W = Hpl Hll⁻¹   (landmarks
              eliminated with a closed-form 3x3 block inverse)
  solve:      dense [6K, 6K] system (K is the window size, ~10)
  back-sub:   dl = Hll⁻¹ (−bl − Hplᵀ dxi)

The same blocks are what the distributed version psums across devices
(landmarks sharded, reduced camera system replicated) — see dist/.

Conventions: poses are camera-from-world (p_cam = R p_world + t);
updates are left-multiplied se3 exponentials; pose 0 (or any subset)
can be gauge-fixed.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .lie import se3_exp


class BAProblem(NamedTuple):
    R: jnp.ndarray  # [K, 3, 3] camera-from-world rotations
    t: jnp.ndarray  # [K, 3]
    landmarks: jnp.ndarray  # [L, 3] world points
    obs_uv: jnp.ndarray  # [K, L, 2]
    obs_mask: jnp.ndarray  # [K, L]
    depth_prior: jnp.ndarray  # [K, L] lidar depth of landmark in cam k
    depth_mask: jnp.ndarray  # [K, L]
    fixed: jnp.ndarray  # [K] gauge-fixed poses (no update)
    lm_valid: jnp.ndarray  # [L] landmark slot in use


class BAResult(NamedTuple):
    problem: BAProblem
    initial_cost: jnp.ndarray
    final_cost: jnp.ndarray


def _proj_residuals(camera, problem: BAProblem, min_depth=0.25):
    """Returns r [K,L,2], Jpose [K,L,2,6], Jlm [K,L,2,3], active [K,L]."""
    R, t, X = problem.R, problem.t, problem.landmarks
    p = jnp.einsum("kij,lj->kli", R, X) + t[:, None, :]  # [K, L, 3]
    z = p[..., 2]
    behind = z <= min_depth
    zs = jnp.maximum(z, min_depth)
    inv_z = 1.0 / zs
    f = camera.focal_length
    u = f * p[..., 0] * inv_z + camera.cx
    v = f * p[..., 1] * inv_z + camera.cy
    r = jnp.stack([u, v], axis=-1) - problem.obs_uv
    zero = jnp.zeros_like(inv_z)
    Jp = jnp.stack([
        jnp.stack([f * inv_z, zero, -f * p[..., 0] * inv_z * inv_z], -1),
        jnp.stack([zero, f * inv_z, -f * p[..., 1] * inv_z * inv_z], -1),
    ], axis=-2)  # [K, L, 2, 3]
    px, py, pz = p[..., 0], p[..., 1], p[..., 2]
    zeros = jnp.zeros_like(px)
    hat_p = jnp.stack([
        jnp.stack([zeros, -pz, py], -1),
        jnp.stack([pz, zeros, -px], -1),
        jnp.stack([-py, px, zeros], -1),
    ], axis=-2)  # [K, L, 3, 3]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=p.dtype), hat_p.shape)
    Jx = jnp.concatenate([eye, -hat_p], axis=-1)  # [K, L, 3, 6]
    Jpose = Jp @ Jx  # [K, L, 2, 6]
    Jlm = jnp.einsum("klri,kij->klrj", Jp, R)  # [K, L, 2, 3]
    active = problem.obs_mask & problem.lm_valid[None, :] & ~behind
    return r, Jpose, Jlm, active, p


def _depth_residuals(problem: BAProblem, p, min_depth=0.25):
    """Depth-prior residual r_d = p_z - d, with Jacobian rows."""
    r_d = p[..., 2] - problem.depth_prior  # [K, L]
    px, py = p[..., 0], p[..., 1]
    zeros = jnp.zeros_like(px)
    ones = jnp.ones_like(px)
    # e_z^T [I | -hat(p)] = [0, 0, 1, -(-py), -(px), 0] → [0,0,1, py?..]
    # row of -hat(p): third row is [-py, px, 0]; with the leading minus:
    Jpose_d = jnp.stack([zeros, zeros, ones, py, -px, zeros], axis=-1)
    Jlm_d = problem.R[:, None, 2, :] * jnp.ones_like(px)[..., None]  # [K,L,3]
    active = problem.depth_mask & problem.obs_mask & problem.lm_valid[None, :]
    active = active & (p[..., 2] > min_depth) & (problem.depth_prior > 0)
    return r_d, Jpose_d, Jlm_d, active


def _huber_w(err, delta):
    return jnp.where(err <= delta, 1.0, delta / jnp.maximum(err, 1e-9))


def ba_cost(camera, pb: BAProblem, huber_px: float = 2.0,
            depth_weight: float = 1.0, huber_depth: float = 0.5,
            axis_name: str | None = None) -> jnp.ndarray:
    r, _, _, active, p = _proj_residuals(camera, pb)
    err = jnp.linalg.norm(r, axis=-1)
    c = jnp.sum(jnp.where(active, jnp.minimum(err, huber_px) *
                          (err - 0.5 * jnp.minimum(err, huber_px)), 0.0))
    r_d, _, _, active_d = _depth_residuals(pb, p)
    ed = jnp.abs(r_d)
    c_d = jnp.sum(jnp.where(
        active_d, depth_weight * jnp.minimum(ed, huber_depth) *
        (ed - 0.5 * jnp.minimum(ed, huber_depth)), 0.0))
    total = c + c_d
    if axis_name is not None:
        total = jax.lax.psum(total, axis_name)
    return total


def ba_iteration(camera, pb: BAProblem, huber_px: float, depth_weight: float,
                 huber_depth: float, damping: float,
                 axis_name: str | None = None) -> BAProblem:
    """One damped Gauss-Newton iteration.

    When `axis_name` is given the landmark dimension is assumed SHARDED
    over that mesh axis: each device assembles blocks for its landmark
    shard and the reduced camera system (S, b_red — the only
    cross-landmark quantities) is psum'd, then solved replicated; the
    landmark back-substitution stays local.  This is the distributed
    Schur-complement reduction of the north-star design (BASELINE.json):
    per-device work scales with L/D, communication is O(K^2) only.
    """
    K = pb.R.shape[0]
    r, Jpose, Jlm, active, p = _proj_residuals(camera, pb)
    err = jnp.linalg.norm(r, axis=-1)
    w = jnp.where(active, _huber_w(err, huber_px), 0.0)  # [K, L]

    r_d, Jpose_d, Jlm_d, active_d = _depth_residuals(pb, p)
    w_d = jnp.where(active_d,
                    depth_weight * _huber_w(jnp.abs(r_d), huber_depth),
                    0.0)

    # Hessian blocks (reprojection + depth prior).
    Hpp = (jnp.einsum("kl,klri,klrj->kij", w, Jpose, Jpose)
           + jnp.einsum("kl,kli,klj->kij", w_d, Jpose_d, Jpose_d))
    Hll = (jnp.einsum("kl,klri,klrj->lij", w, Jlm, Jlm)
           + jnp.einsum("kl,kli,klj->lij", w_d, Jlm_d, Jlm_d))
    Hpl = (jnp.einsum("kl,klri,klrj->klij", w, Jpose, Jlm)
           + jnp.einsum("kl,kli,klj->klij", w_d, Jpose_d, Jlm_d))
    bp = (jnp.einsum("kl,klri,klr->ki", w, Jpose, r)
          + jnp.einsum("kl,kli,kl->ki", w_d, Jpose_d, r_d))
    bl = (jnp.einsum("kl,klri,klr->li", w, Jlm, r)
          + jnp.einsum("kl,kli,kl->li", w_d, Jlm_d, r_d))

    # Relative (Marquardt) damping: the absolute scale of Hll blocks is
    # ~f^2/z^2 and varies by orders of magnitude; damping proportional
    # to the block trace bounds the condition number at ~3/damping so
    # the f32 block inverse cannot overflow (a fixed 1e-4 floor let
    # cond reach ~5e7 and jnp.linalg.inv returned inf).
    obs_cnt = jnp.sum(w, axis=0) + jnp.sum(w_d, axis=0)
    lm_free = (obs_cnt > 0) & pb.lm_valid
    tr_l = jnp.trace(Hll, axis1=-2, axis2=-1) / 3.0
    Hll = Hll + (damping * jnp.maximum(tr_l, 1.0) + 1e-8)[:, None, None] \
        * jnp.eye(3, dtype=Hll.dtype)
    Hll = jnp.where(lm_free[:, None, None], Hll,
                    jnp.eye(3, dtype=Hll.dtype))
    bl = jnp.where(lm_free[:, None], bl, 0.0)

    Hll_inv = jnp.linalg.inv(Hll)  # [L, 3, 3] tiny blocks
    W = jnp.einsum("klij,ljm->klim", Hpl, Hll_inv)  # [K, L, 6, 3]

    S_cross = jnp.einsum("klim,qljm->kqij", W, Hpl)  # [K, K, 6, 6]
    b_red_lm = jnp.einsum("klim,lm->ki", W, bl)  # [K, 6]

    if axis_name is not None:
        # Reduce the camera system over landmark shards (ICI psum).
        Hpp = jax.lax.psum(Hpp, axis_name)
        S_cross = jax.lax.psum(S_cross, axis_name)
        bp = jax.lax.psum(bp, axis_name)
        b_red_lm = jax.lax.psum(b_red_lm, axis_name)

    tr_p = jnp.trace(Hpp, axis1=-2, axis2=-1) / 6.0
    Hpp = Hpp + (damping * jnp.maximum(tr_p, 1.0))[:, None, None] \
        * jnp.eye(6, dtype=Hpp.dtype)
    S = -S_cross
    S = S.at[jnp.arange(K), jnp.arange(K)].add(Hpp)
    b_red = bp - b_red_lm

    # gauge: fixed poses get identity rows/cols and zero gradient
    fix = pb.fixed
    S = jnp.where(fix[:, None, None, None] | fix[None, :, None, None],
                  0.0, S)
    S = S.at[jnp.arange(K), jnp.arange(K)].add(
        jnp.where(fix[:, None, None], jnp.eye(6, dtype=S.dtype), 0.0))
    b_red = jnp.where(fix[:, None], 0.0, b_red)

    Sd = S.transpose(0, 2, 1, 3).reshape(6 * K, 6 * K)
    dxi = -jnp.linalg.solve(Sd, b_red.reshape(-1)).reshape(K, 6)
    dxi = jnp.where(fix[:, None], 0.0, dxi)

    # back-substitute landmarks (local to each shard)
    rhs = -bl - jnp.einsum("klij,ki->lj", Hpl, dxi)
    dl = jnp.einsum("lij,lj->li", Hll_inv, rhs)
    dl = jnp.where(lm_free[:, None], dl, 0.0)

    dR, dt = se3_exp(dxi)
    R_new = dR @ pb.R
    t_new = jnp.einsum("kij,kj->ki", dR, pb.t) + dt
    return pb._replace(R=R_new, t=t_new, landmarks=pb.landmarks + dl)


@partial(jax.jit, static_argnames=("camera", "iters", "huber_px",
                                   "depth_weight", "huber_depth", "damping"))
def run_ba(camera, problem: BAProblem, iters: int = 8,
           huber_px: float = 2.0, depth_weight: float = 1.0,
           huber_depth: float = 0.5, damping: float = 1e-4) -> BAResult:
    """Run `iters` damped Gauss-Newton iterations (single device)."""

    def iteration(_, pb):
        return ba_iteration(camera, pb, huber_px, depth_weight,
                            huber_depth, damping)

    c0 = ba_cost(camera, problem, huber_px, depth_weight, huber_depth)
    out = jax.lax.fori_loop(0, iters, iteration, problem)
    c1 = ba_cost(camera, out, huber_px, depth_weight, huber_depth)
    return BAResult(problem=out, initial_cost=c0, final_cost=c1)
