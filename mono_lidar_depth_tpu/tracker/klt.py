"""Pyramidal Lucas-Kanade feature tracking, fully batched.

TPU-first formulation: all N features iterate simultaneously at each
pyramid level — patch extraction is one batched bilinear gather
[N, P, P], the LK normal equations are closed-form 2x2 solves on the
VPU, and the iteration count is static (`lax.fori_loop`).  No
per-feature control flow anywhere.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def build_pyramid(img: jnp.ndarray, levels: int) -> list[jnp.ndarray]:
    """Gaussian-ish pyramid via 2x2 average pooling, finest first."""
    img = img.astype(jnp.float32)
    pyr = [img]
    for _ in range(levels - 1):
        h, w = pyr[-1].shape
        p = pyr[-1][: h - h % 2, : w - w % 2]
        pyr.append(p.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3)))
    return pyr


def _bilinear_patches(img: jnp.ndarray, centers: jnp.ndarray,
                      offsets: jnp.ndarray) -> jnp.ndarray:
    """Sample [N, P*P] patches at centers [N, 2] + offsets [P*P, 2]
    with bilinear interpolation (border-clamped)."""
    H, W = img.shape
    pos = centers[:, None, :] + offsets[None, :, :]  # [N, K, 2]
    x = jnp.clip(pos[..., 0], 0.0, W - 1.001)
    y = jnp.clip(pos[..., 1], 0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    flat = img.reshape(-1)

    def at(yy, xx):
        return flat[jnp.clip(yy, 0, H - 1) * W + jnp.clip(xx, 0, W - 1)]

    v00 = at(y0, x0)
    v01 = at(y0, x0 + 1)
    v10 = at(y0 + 1, x0)
    v11 = at(y0 + 1, x0 + 1)
    return ((1 - fy) * ((1 - fx) * v00 + fx * v01)
            + fy * ((1 - fx) * v10 + fx * v11))


def _patch_offsets(patch: int) -> jnp.ndarray:
    r = (patch - 1) / 2.0
    line = jnp.arange(patch, dtype=jnp.float32) - r
    ox = jnp.tile(line, patch)
    oy = jnp.repeat(line, patch)
    return jnp.stack([ox, oy], axis=1)  # [P*P, 2]


def _lk_level(prev_img, next_img, uv_prev, uv_guess, patch, iters, min_det):
    """One pyramid level of iterative LK for all features at once."""
    offs = _patch_offsets(patch)
    template = _bilinear_patches(prev_img, uv_prev, offs)  # [N, K]
    # spatial gradients of the template via central differences on the
    # prev image (standard LK: gradients from the template patch)
    ex = jnp.array([[1.0, 0.0]], jnp.float32)
    ey = jnp.array([[0.0, 1.0]], jnp.float32)
    gx = (_bilinear_patches(prev_img, uv_prev + ex, offs)
          - _bilinear_patches(prev_img, uv_prev - ex, offs)) * 0.5
    gy = (_bilinear_patches(prev_img, uv_prev + ey, offs)
          - _bilinear_patches(prev_img, uv_prev - ey, offs)) * 0.5
    gxx = jnp.sum(gx * gx, axis=1)
    gxy = jnp.sum(gx * gy, axis=1)
    gyy = jnp.sum(gy * gy, axis=1)
    det = gxx * gyy - gxy * gxy
    ok = det > min_det
    inv_det = jnp.where(ok, 1.0 / jnp.where(det == 0, 1.0, det), 0.0)

    def body(_, uv):
        cur = _bilinear_patches(next_img, uv, offs)
        err = cur - template  # [N, K]
        bx = jnp.sum(err * gx, axis=1)
        by = jnp.sum(err * gy, axis=1)
        du = -(gyy * bx - gxy * by) * inv_det
        dv = -(-gxy * bx + gxx * by) * inv_det
        return uv + jnp.stack([du, dv], axis=1)

    uv_out = jax.lax.fori_loop(0, iters, body, uv_guess)
    return uv_out, ok


def track_features(
    prev_pyr: list[jnp.ndarray],
    next_pyr: list[jnp.ndarray],
    uv: jnp.ndarray,
    valid: jnp.ndarray,
    patch: int = 9,
    iters: int = 8,
    min_det: float = 1e-4,
    min_ncc: float = 0.6,
    fb_threshold: float = 1.0,
    uv_guess: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Track features from prev to next frame.

    Coarse-to-fine pyramidal LK + two rejection tests:
      * forward-backward consistency (track back from the found
        position; must return within fb_threshold px), and
      * appearance: zero-normalized cross-correlation between the
        template and the tracked patch must exceed min_ncc — the FB
        check alone cannot reject a tracker that never moved (stuck in
        a local optimum, trivially FB-consistent).

    `uv_guess` optionally warm-starts the search (e.g. motion-model
    prediction) — essential for large inter-frame flows (fast turns)
    that exceed the pyramid's convergence basin from a zero-flow start.

    Returns (uv_next [N, 2], ok [N]).
    """
    uv_f, ok_f = _pyramidal(prev_pyr, next_pyr, uv, patch, iters, min_det,
                            guess=uv_guess)
    # backward pass: the expected landing point is the forward start
    uv_b, ok_b = _pyramidal(next_pyr, prev_pyr, uv_f, patch, iters, min_det,
                            guess=uv)
    fb_err = jnp.linalg.norm(uv_b - uv, axis=1)
    H, W = next_pyr[0].shape
    in_img = ((uv_f[:, 0] > 1) & (uv_f[:, 0] < W - 2)
              & (uv_f[:, 1] > 1) & (uv_f[:, 1] < H - 2))
    offs = _patch_offsets(patch)
    t = _bilinear_patches(prev_pyr[0], uv, offs)
    c = _bilinear_patches(next_pyr[0], uv_f, offs)
    ncc = _zncc(t, c)
    ok = (valid & ok_f & ok_b & (fb_err < fb_threshold) & in_img
          & (ncc > min_ncc))
    return uv_f, ok


def _zncc(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Zero-normalized cross-correlation of patch rows [N, K] → [N]."""
    am = a - jnp.mean(a, axis=1, keepdims=True)
    bm = b - jnp.mean(b, axis=1, keepdims=True)
    num = jnp.sum(am * bm, axis=1)
    den = jnp.sqrt(jnp.sum(am * am, axis=1) * jnp.sum(bm * bm, axis=1))
    return num / jnp.maximum(den, eps)


def _pyramidal(src_pyr, dst_pyr, uv, patch, iters, min_det, guess=None):
    levels = len(src_pyr)
    scale = 2.0 ** (levels - 1)
    guess = (uv if guess is None else guess) / scale
    ok_all = jnp.ones(uv.shape[0], bool)
    for lvl in range(levels - 1, -1, -1):
        s = 2.0 ** lvl
        guess, ok = _lk_level(src_pyr[lvl], dst_pyr[lvl], uv / s, guess,
                              patch, iters, min_det)
        ok_all = ok_all & ok
        if lvl > 0:
            guess = guess * 2.0
    return guess, ok_all
