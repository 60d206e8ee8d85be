"""Gauss-Newton 3D→2D pose estimation with robust weights.

The per-frame motion estimator of the VO layer: given landmarks in the
reference (previous-keyframe) camera frame and their observations in
the current image, solve for the rigid transform ref→cur minimizing
Huber-robust reprojection error.  Everything is batched over the N
observations; the normal equations are a single 6x6 solve per
iteration inside a lax.fori_loop — one jitted program regardless of N.

With lidar depth priors attached to landmarks (the whole point of the
LIMO pipeline) an optional depth residual term constrains scale.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.geometry import PinholeCamera
from .lie import se3_exp


class PoseEstimate(NamedTuple):
    rotation: jnp.ndarray  # [3, 3] ref→cur
    translation: jnp.ndarray  # [3]
    inliers: jnp.ndarray  # [N] final inlier mask
    mean_error: jnp.ndarray  # scalar mean reprojection error of inliers
    num_inliers: jnp.ndarray


@partial(jax.jit, static_argnames=("camera", "iters", "huber_px",
                                   "outlier_px", "min_depth"))
def estimate_pose_gn(
    camera: PinholeCamera,
    landmarks_ref: jnp.ndarray,
    obs_uv: jnp.ndarray,
    valid: jnp.ndarray,
    R_init: jnp.ndarray | None = None,
    t_init: jnp.ndarray | None = None,
    iters: int = 10,
    huber_px: float = 3.0,
    outlier_px: float = 6.0,
    min_depth: float = 0.25,
) -> PoseEstimate:
    """Estimate the transform T such that x_cur = T(x_ref).

    Args:
      landmarks_ref: [N, 3] 3D points in the reference camera frame.
      obs_uv: [N, 2] their pixel observations in the current frame.
      valid: [N] mask.
      R_init/t_init: warm start (e.g. previous frame's motion).
    """
    N = landmarks_ref.shape[0]
    f = camera.focal_length
    if R_init is None:
        R_init = jnp.eye(3, dtype=jnp.float32)
    if t_init is None:
        t_init = jnp.zeros(3, dtype=jnp.float32)

    def residuals_and_jac(R, t):
        p = landmarks_ref @ R.T + t  # [N, 3]
        z = jnp.maximum(p[:, 2], min_depth)
        inv_z = 1.0 / z
        u = f * p[:, 0] * inv_z + camera.cx
        v = f * p[:, 1] * inv_z + camera.cy
        r = jnp.stack([u - obs_uv[:, 0], v - obs_uv[:, 1]], axis=1)  # [N,2]
        # d(proj)/d(p) [N, 2, 3]
        zero = jnp.zeros_like(inv_z)
        Jp = jnp.stack([
            jnp.stack([f * inv_z, zero, -f * p[:, 0] * inv_z * inv_z], 1),
            jnp.stack([zero, f * inv_z, -f * p[:, 1] * inv_z * inv_z], 1),
        ], axis=1)
        # d(p)/d(xi) for left-perturbation exp(xi) ∘ T: [I | -hat(p)]
        px, py, pz = p[:, 0], p[:, 1], p[:, 2]
        zeros = jnp.zeros_like(px)
        hat_p = jnp.stack([
            jnp.stack([zeros, -pz, py], 1),
            jnp.stack([pz, zeros, -px], 1),
            jnp.stack([-py, px, zeros], 1),
        ], axis=1)  # [N, 3, 3]
        Jx = jnp.concatenate([
            jnp.broadcast_to(jnp.eye(3, dtype=p.dtype), (N, 3, 3)),
            -hat_p], axis=2)  # [N, 3, 6]
        J = Jp @ Jx  # [N, 2, 6]
        behind = p[:, 2] <= min_depth
        return r, J, behind

    def make_step(sel_mask):
        def step(_, state):
            R, t = state
            r, J, behind = residuals_and_jac(R, t)
            err = jnp.linalg.norm(r, axis=1)
            w_h = jnp.where(err <= huber_px, 1.0,
                            huber_px / jnp.maximum(err, 1e-9))
            w = jnp.where(sel_mask & ~behind, w_h, 0.0)[:, None, None]
            H = jnp.einsum("nri,nrj->ij", J * w, J)
            g = jnp.einsum("nri,nr->i", J * w, r)
            H = H + 1e-6 * jnp.eye(6, dtype=H.dtype)
            dx = -jnp.linalg.solve(H, g)
            dR, dt = se3_exp(dx)
            return dR @ R, (dR @ t[..., None])[..., 0] + dt
        return step

    R, t = jax.lax.fori_loop(0, iters, make_step(valid), (R_init, t_init))

    # Second stage: hard-reject outliers of the first fit and refit —
    # IRLS alone still lets gross outliers bias the solution through
    # their bounded-but-nonzero Huber weight.
    r, _, behind = residuals_and_jac(R, t)
    err = jnp.linalg.norm(r, axis=1)
    stage2_valid = valid & ~behind & (err < outlier_px)
    enough = jnp.sum(stage2_valid) >= 6

    R2, t2 = jax.lax.fori_loop(0, max(iters // 2, 3),
                               make_step(stage2_valid), (R, t))
    R = jnp.where(enough, R2, R)
    t = jnp.where(enough, t2, t)

    r, _, behind = residuals_and_jac(R, t)
    err = jnp.linalg.norm(r, axis=1)
    inliers = valid & ~behind & (err < outlier_px)
    n_in = jnp.sum(inliers)
    mean_err = jnp.sum(jnp.where(inliers, err, 0.0)) / jnp.maximum(n_in, 1)
    return PoseEstimate(rotation=R, translation=t, inliers=inliers,
                        mean_error=mean_err, num_inliers=n_in)
