"""Pyramidal Lucas-Kanade feature tracking, fully batched.

TPU-first formulation: all N features iterate simultaneously at each
pyramid level — the LK normal equations are closed-form 2x2 solves on
the VPU, and the iteration count is static (`lax.fori_loop`).  No
per-feature control flow anywhere.

Patch sampling is NOT a gather.  A bilinear patch at center c with an
integer offset grid shares ONE fractional offset f = c - floor(c)
across all its taps, so the patch is

    window  = img[floor(cy)+ky, floor(cx)+kx]   (integer window)
    patch   = lerp_2d(window, f)                (4-tap vector blend)

— one per-feature rectangular window extraction plus pure elementwise
math.  The window extraction reuses the VMEM-resident Pallas kernel
built for the neighbor search (core/pallas_windows.slice_windows; XLA
dynamic_slice fallback off-TPU), replacing the `flat[idx]` bilinear
gathers that made the tracker the whole eval harness's bottleneck:
measured 87 ms/frame on the remote TPU (~90 batched gathers of
[384, 81] taps at ~1.3 ms each) against ~6 ms/frame for the entire
depth-association pipeline it feeds.

Border semantics: centers are clamped into the image and the window
is cut from an edge-replicated pad, which reproduces the per-tap
clamping of a gather-based sampler for all in-image centers (taps
beyond the border read the border pixel).  Features whose CENTER left
the image differ from per-tap clamping — those tracks are rejected by
the in-image gate in track_features regardless.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.pallas_windows import slice_windows


def build_pyramid(img: jnp.ndarray, levels: int) -> list[jnp.ndarray]:
    """Gaussian-ish pyramid via 2x2 average pooling, finest first."""
    img = img.astype(jnp.float32)
    pyr = [img]
    for _ in range(levels - 1):
        h, w = pyr[-1].shape
        p = pyr[-1][: h - h % 2, : w - w % 2]
        pyr.append(p.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3)))
    return pyr


def _split_frac(uv: jnp.ndarray, H: int, W: int, slack: int = 0):
    """Clamped integer corner + fractional remainder per feature.

    `slack` widens the clamp window by that many pixels beyond the
    image on each side (pair it with an equally wider edge-pad).  This
    matters DURING LK iterations: an iterate transiently stepping a
    few pixels past the border must keep sampling a patch that MOVES
    with it (in-image taps still varying, out-of-image taps saturated
    at the border row/column — per-tap-clamp semantics).  A zero-slack
    center clamp instead freezes the whole patch at the border, so the
    frozen residual re-applies the same update every iteration and the
    track runs away (measured: tracks 10 px from the image edge landed
    23 px off with fb-error 17-23 px, silently dropping ~1% of
    tracks — the near-border, high-parallax ones — for +6% RPE and
    +10% ATE on the 220-frame loop)."""
    x = jnp.clip(uv[:, 0], -float(slack), W - 1.001 + slack)
    y = jnp.clip(uv[:, 1], -float(slack), H - 1.001 + slack)
    ix = jnp.floor(x).astype(jnp.int32)
    iy = jnp.floor(y).astype(jnp.int32)
    return ix, iy, x - ix, y - iy


def _windows(img: jnp.ndarray, sy: jnp.ndarray, sx: jnp.ndarray,
             K: int) -> jnp.ndarray:
    """[N, K, K] integer-start windows of a single-plane image."""
    return slice_windows(img[None], sy, sx, K, K)[:, 0]


def _lerp2(win: jnp.ndarray, fx: jnp.ndarray, fy: jnp.ndarray
           ) -> jnp.ndarray:
    """Bilinear blend of a [N, K, K] integer window at per-feature
    fractional offset → [N, K-1, K-1] samples."""
    fx = fx[:, None, None]
    fy = fy[:, None, None]
    top = (1 - fx) * win[:, :-1, :-1] + fx * win[:, :-1, 1:]
    bot = (1 - fx) * win[:, 1:, :-1] + fx * win[:, 1:, 1:]
    return (1 - fy) * top + fy * bot


def _bilinear_patches(img: jnp.ndarray, centers: jnp.ndarray,
                      patch: int) -> jnp.ndarray:
    """[N, patch*patch] bilinear patches at integer-grid offsets
    around `centers` (window extraction + 4-tap blend, no gathers)."""
    H, W = img.shape
    r = (patch - 1) // 2
    slack = r + 1  # excursions past this saturate fully, like per-tap clamp
    m = r + 1 + slack
    ix, iy, fx, fy = _split_frac(centers, H, W, slack)
    pad = jnp.pad(img, m, mode="edge")
    win = _windows(pad, iy - r + m, ix - r + m, patch + 1)
    return _lerp2(win, fx, fy).reshape(centers.shape[0], -1)


def _lk_level(prev_img, next_img, uv_prev, uv_guess, patch, iters, min_det):
    """One pyramid level of iterative LK for all features at once.

    Template AND its central-difference gradients come from a single
    (patch+3)^2 integer window per feature: the bilinear blend of the
    window gives samples on the (patch+2)^2 grid floor(c)+k+f, whose
    interior is the template and whose ±1 shifts are the gradient
    stencils — the gather-based formulation paid five patch samplings
    for the same three arrays."""
    N = uv_prev.shape[0]
    H, W = prev_img.shape
    r = (patch - 1) // 2
    slack = r + 1  # see _split_frac — per-tap-clamp border semantics
    m = r + 2 + slack
    ix, iy, fx, fy = _split_frac(uv_prev, H, W, slack)
    prev_pad = jnp.pad(prev_img, m, mode="edge")
    win = _windows(prev_pad, iy - r - 1 + m, ix - r - 1 + m, patch + 3)
    B = _lerp2(win, fx, fy)  # [N, patch+2, patch+2]
    template = B[:, 1:-1, 1:-1].reshape(N, -1)
    gx = ((B[:, 1:-1, 2:] - B[:, 1:-1, :-2]) * 0.5).reshape(N, -1)
    gy = ((B[:, 2:, 1:-1] - B[:, :-2, 1:-1]) * 0.5).reshape(N, -1)
    gxx = jnp.sum(gx * gx, axis=1)
    gxy = jnp.sum(gx * gy, axis=1)
    gyy = jnp.sum(gy * gy, axis=1)
    det = gxx * gyy - gxy * gxy
    ok = det > min_det
    inv_det = jnp.where(ok, 1.0 / jnp.where(det == 0, 1.0, det), 0.0)

    next_pad = jnp.pad(next_img, m, mode="edge")

    def body(_, uv):
        jx, jy, hx, hy = _split_frac(uv, H, W, slack)
        wn = _windows(next_pad, jy - r + m, jx - r + m, patch + 1)
        cur = _lerp2(wn, hx, hy).reshape(N, -1)
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
    if patch % 2 != 1:
        # _bilinear_patches / _lk_level center windows at
        # r = (patch-1)//2, which silently shifts the grid for even
        # patch sizes — the symmetric-window assumption is structural.
        raise ValueError(f"patch size must be odd, got {patch}")
    uv_f, ok_f = _pyramidal(prev_pyr, next_pyr, uv, patch, iters, min_det,
                            guess=uv_guess)
    # backward pass: the expected landing point is the forward start
    uv_b, ok_b = _pyramidal(next_pyr, prev_pyr, uv_f, patch, iters, min_det,
                            guess=uv)
    fb_err = jnp.linalg.norm(uv_b - uv, axis=1)
    H, W = next_pyr[0].shape
    in_img = ((uv_f[:, 0] > 1) & (uv_f[:, 0] < W - 2)
              & (uv_f[:, 1] > 1) & (uv_f[:, 1] < H - 2))
    t = _bilinear_patches(prev_pyr[0], uv, patch)
    c = _bilinear_patches(next_pyr[0], uv_f, patch)
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
