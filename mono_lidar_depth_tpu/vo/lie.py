"""SO(3)/SE(3) exponential and logarithm maps, batched and jit-safe.

Closed-form Rodrigues / V-matrix formulas with series fallbacks near
theta = 0, written to be DIFFERENTIABLE everywhere (the pose-graph
solver jacfwd's through these at zero residual):

  * series branches are polynomials in theta^2 = sum(phi^2) — no
    sqrt-at-zero in their derivative path;
  * exact branches evaluate at interior-clamped arguments
    (`where`-select guarantees the clamped values are only used where
    they are well-conditioned), so no branch ever produces NaN values
    OR NaN tangents.

Convention: se3 vectors are [rho (3), phi (3)] (translation part
first), exp([rho, phi]) = (R = exp([phi]x), t = V(phi) rho).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST

_SMALL = 1e-10


def hat(v: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] → [..., 3, 3] skew-symmetric matrix."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zeros = jnp.zeros_like(x)
    return jnp.stack([
        jnp.stack([zeros, -z, y], axis=-1),
        jnp.stack([z, zeros, -x], axis=-1),
        jnp.stack([-y, x, zeros], axis=-1),
    ], axis=-2)


def _theta_terms(phi: jnp.ndarray):
    """(th2, th2_safe, theta_safe, small) with gradient-safe sqrt."""
    th2 = jnp.sum(phi * phi, axis=-1)[..., None, None]
    small = th2 < _SMALL
    th2_safe = jnp.where(small, 1.0, th2)
    theta_safe = jnp.sqrt(th2_safe)
    return th2, th2_safe, theta_safe, small


def so3_exp(phi: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: [..., 3] axis-angle → [..., 3, 3] rotation."""
    th2, th2_safe, theta, small = _theta_terms(phi)
    K = hat(phi)
    K2 = jnp.matmul(K, K, precision=_HI)
    a = jnp.where(small, 1.0 - th2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - th2 / 24.0, (1.0 - jnp.cos(theta)) / th2_safe)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye + a * K + b * K2


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] rotation → [..., 3] axis-angle (|phi| <= pi)."""
    trace = jnp.trace(R, axis1=-2, axis2=-1)
    cos = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    small = cos > 1.0 - 1e-8  # theta ≈ 0
    near_pi = cos < -1.0 + 1e-6
    cos_int = jnp.clip(cos, -1.0 + 1e-7, 1.0 - 1e-7)
    theta_int = jnp.arccos(cos_int)
    sin_int = jnp.sin(theta_int)
    w = jnp.stack([R[..., 2, 1] - R[..., 1, 2],
                   R[..., 0, 2] - R[..., 2, 0],
                   R[..., 1, 0] - R[..., 0, 1]], axis=-1)
    # scale = theta / (2 sin theta); series 0.5 + (1 - cos)/6 + O((1-c)^2)
    scale = jnp.where(small, 0.5 + (1.0 - cos) / 6.0,
                      theta_int / (2.0 * sin_int))
    out = scale[..., None] * w

    # Near theta = pi the vee formula degenerates; reconstruct the axis
    # from the symmetric part: at pi, (R + R^T)/2 = 2 a a^T - I, so
    # |a_i| comes from the diagonal and relative signs from the
    # off-diagonal products AGAINST THE LARGEST component (fixing signs
    # pairwise against component 0 alone loses the y/z relative sign
    # whenever a_x ~ 0, e.g. a = (0, 1, -1)/sqrt(2)).
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    mag = jnp.sqrt(jnp.maximum((diag + 1.0) * 0.5, 1e-12))  # [..., 3] = |a|
    sym01 = R[..., 0, 1] + R[..., 1, 0]  # ~ 4 a_0 a_1
    sym02 = R[..., 0, 2] + R[..., 2, 0]  # ~ 4 a_0 a_2
    sym12 = R[..., 1, 2] + R[..., 2, 1]  # ~ 4 a_1 a_2
    zeros = jnp.zeros_like(sym01)
    # prods[k, j] = sign source for a_j given a_k > 0 (k-th row; the
    # k == j entry is unused and handled below)
    prods = jnp.stack([
        jnp.stack([zeros, sym01, sym02], axis=-1),
        jnp.stack([sym01, zeros, sym12], axis=-1),
        jnp.stack([sym02, sym12, zeros], axis=-1),
    ], axis=-2)
    k = jnp.argmax(mag, axis=-1)  # largest-|a| component, set positive
    row = jnp.take_along_axis(
        prods, jnp.broadcast_to(k[..., None, None], k.shape + (1, 3)),
        axis=-2)[..., 0, :]  # [..., 3]
    jidx = jnp.arange(3)
    sign = jnp.where(jidx == k[..., None], 1.0,
                     jnp.where(row >= 0, 1.0, -1.0))
    axis = mag * sign
    norm = jnp.linalg.norm(axis, axis=-1, keepdims=True)
    axis = axis / jnp.where(norm == 0, 1.0, norm)
    pi_log = axis * theta_int[..., None]
    return jnp.where(near_pi[..., None], pi_log, out)


def _V(phi: jnp.ndarray) -> jnp.ndarray:
    """Left Jacobian of SO(3)."""
    th2, th2_safe, theta, small = _theta_terms(phi)
    K = hat(phi)
    K2 = jnp.matmul(K, K, precision=_HI)
    b = jnp.where(small, 0.5 - th2 / 24.0, (1.0 - jnp.cos(theta)) / th2_safe)
    c = jnp.where(small, 1.0 / 6.0 - th2 / 120.0,
                  (theta - jnp.sin(theta)) / (th2_safe * theta))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye + b * K + c * K2


def _V_inv(phi: jnp.ndarray) -> jnp.ndarray:
    th2, th2_safe, theta, small = _theta_terms(phi)
    K = hat(phi)
    K2 = jnp.matmul(K, K, precision=_HI)
    half = theta * 0.5
    sin_half = jnp.sin(half)
    sin_half_safe = jnp.where(small, 1.0, sin_half)
    cot_term = (1.0 - half * jnp.cos(half) / sin_half_safe) / th2_safe
    coef = jnp.where(small, 1.0 / 12.0 + th2 / 720.0, cot_term)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye - 0.5 * K + coef * K2


def se3_exp(xi: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[..., 6] (rho, phi) → (R [..., 3, 3], t [..., 3])."""
    rho, phi = xi[..., :3], xi[..., 3:]
    R = so3_exp(phi)
    t = jnp.matmul(_V(phi), rho[..., None], precision=_HI)[..., 0]
    return R, t


def se3_log(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(R, t) → [..., 6] (rho, phi)."""
    phi = so3_log(R)
    rho = jnp.matmul(_V_inv(phi), t[..., None], precision=_HI)[..., 0]
    return jnp.concatenate([rho, phi], axis=-1)
