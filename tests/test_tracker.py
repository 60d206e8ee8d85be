"""Feature detection + KLT tracking tests on synthetic imagery."""

import numpy as np
import jax.numpy as jnp

from mono_lidar_depth_tpu.tracker import (
    build_pyramid, detect_features, shi_tomasi_response, track_features)
from mono_lidar_depth_tpu.tracker.frontend import init_tracker, track_frame


def checkerboard(H=128, W=192, square=16, phase=(0, 0)):
    y, x = np.mgrid[0:H, 0:W]
    img = (((y + phase[1]) // square + (x + phase[0]) // square) % 2
           ).astype(np.float32)
    return img


def textured(rng, H=128, W=192):
    """Smooth random texture with corners everywhere."""
    img = rng.random((H // 8, W // 8)).astype(np.float32)
    img = np.kron(img, np.ones((8, 8), np.float32))
    img += 0.3 * rng.random((H, W)).astype(np.float32)
    return img


def shift_image(img, dx, dy):
    """Integer-shift with edge padding."""
    out = np.roll(np.roll(img, dy, axis=0), dx, axis=1)
    return out


def test_response_peaks_at_corners():
    img = checkerboard()
    resp = np.asarray(shi_tomasi_response(jnp.asarray(img)))
    # response at a checkerboard corner must dominate flat regions
    corner = resp[16 - 2:16 + 2, 16 - 2:16 + 2].max()
    flat = resp[8, 8]
    assert corner > 10 * max(flat, 1e-9)


def test_detect_features_grid():
    img = checkerboard()
    uv, valid = detect_features(jnp.asarray(img), 64, cell_size=16)
    uv, valid = np.asarray(uv), np.asarray(valid)
    assert valid.sum() > 10
    # one per cell: all (cell_x, cell_y) pairs distinct
    cells = {(int(u) // 16, int(v) // 16) for (u, v) in uv[valid]}
    assert len(cells) == valid.sum()
    # detections inside the border
    assert (uv[valid] >= 8).all()


def test_detect_avoids_occupied():
    img = checkerboard()
    uv1, ok1 = detect_features(jnp.asarray(img), 32, cell_size=16)
    uv2, ok2 = detect_features(jnp.asarray(img), 32, cell_size=16,
                               occupied_uv=uv1, occupied_valid=ok1)
    c1 = {(int(u) // 16, int(v) // 16)
          for (u, v) in np.asarray(uv1)[np.asarray(ok1)]}
    c2 = {(int(u) // 16, int(v) // 16)
          for (u, v) in np.asarray(uv2)[np.asarray(ok2)]}
    assert not (c1 & c2)


def test_klt_tracks_integer_shift(rng):
    img0 = textured(rng)
    dx, dy = 3, -2
    img1 = shift_image(img0, dx, dy)
    p0 = build_pyramid(jnp.asarray(img0), 3)
    p1 = build_pyramid(jnp.asarray(img1), 3)
    uv, ok = detect_features(jnp.asarray(img0), 48, cell_size=16)
    uv2, ok2 = track_features(p0, p1, uv, ok)
    ok2 = np.asarray(ok2)
    assert ok2.sum() > 10
    flow = np.asarray(uv2)[ok2] - np.asarray(uv)[ok2]
    np.testing.assert_allclose(flow.mean(axis=0), [dx, dy], atol=0.15)
    assert np.abs(flow - [dx, dy]).max() < 0.7


def test_klt_subpixel_shift(rng):
    # subpixel translation via Fourier shift of a smooth image
    img0 = textured(rng)
    from scipy.ndimage import shift as ndshift
    img1 = ndshift(img0, (0.4, -0.6), order=3, mode="nearest").astype(np.float32)
    p0 = build_pyramid(jnp.asarray(img0), 2)
    p1 = build_pyramid(jnp.asarray(img1), 2)
    uv, ok = detect_features(jnp.asarray(img0), 48, cell_size=16)
    uv2, ok2 = track_features(p0, p1, uv, ok)
    ok2 = np.asarray(ok2)
    flow = np.asarray(uv2)[ok2] - np.asarray(uv)[ok2]
    # expected flow (dx, dy) = (-0.6, 0.4): ndshift shifts axis0=y by 0.4
    np.testing.assert_allclose(flow.mean(axis=0), [-0.6, 0.4], atol=0.2)


def test_fb_check_kills_occluded(rng):
    img0 = textured(rng)
    img1 = textured(np.random.default_rng(999))  # unrelated frame
    p0 = build_pyramid(jnp.asarray(img0), 3)
    p1 = build_pyramid(jnp.asarray(img1), 3)
    uv, ok = detect_features(jnp.asarray(img0), 48, cell_size=16)
    _, ok2 = track_features(p0, p1, uv, ok)
    # Most tracks must fail the FB + appearance checks.  Some survive
    # legitimately: both frames draw from the same block-texture
    # distribution, so appearance-consistent (but semantically wrong)
    # matches exist — those are for downstream geometric outlier
    # rejection, as in any real tracker.
    assert np.asarray(ok2).sum() <= 0.5 * np.asarray(ok).sum()


def test_frontend_ids_persist(rng):
    imgs = [textured(rng)]
    for k in range(1, 4):
        imgs.append(shift_image(imgs[0], 2 * k, k))
    state = init_tracker(jnp.asarray(imgs[0]), 64)
    seen_ids = []
    for f in range(1, 4):
        state, out = track_frame(state, jnp.asarray(imgs[f]))
        v = np.asarray(out.valid)
        seen_ids.append(set(np.asarray(out.ids)[v].tolist()))
        assert v.sum() > 5
        # flow consistent with the constant shift
        flow = (np.asarray(out.uv_new) - np.asarray(out.uv_prev))[v]
        np.testing.assert_allclose(np.median(flow, axis=0), [2, 1], atol=0.5)
    # ids persist across frames
    assert len(seen_ids[0] & seen_ids[1]) > 5
    assert len(seen_ids[1] & seen_ids[2]) > 5


def test_frontend_replenishes(rng):
    img0 = textured(rng)
    state = init_tracker(jnp.asarray(img0), 64)
    n0 = int(np.asarray(state.valid).sum())
    # a frame of pure noise kills all tracks; lanes must refill
    state, out = track_frame(state, jnp.asarray(textured(np.random.default_rng(5))))
    assert int(np.asarray(out.valid).sum()) < n0
    assert int(np.asarray(state.valid).sum()) > 10  # replenished
    # ids of replenished lanes are fresh
    assert int(state.next_id) > 64
