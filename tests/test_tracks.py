"""Tracklet table + per-frame association pipeline tests."""

import numpy as np
import jax
import jax.numpy as jnp

from mono_lidar_depth_tpu import DepthEstimatorConfig, PinholeCamera, SE3
from mono_lidar_depth_tpu.tracks import (
    TrackTable, TrackletDepthState, match_tracks, process_frame, update_tracks)
from mono_lidar_depth_tpu.tracks.pipeline import FrameInput, process_sequence
from mono_lidar_depth_tpu.core.result_types import DepthResultType as R

T, L, M = 16, 6, 8


def _ids(vals):
    out = np.full(M, -1, np.int32)
    out[:len(vals)] = vals
    valid = np.zeros(M, bool)
    valid[:len(vals)] = True
    return jnp.asarray(out), jnp.asarray(valid)


def _uv(n, base=0.0):
    uv = np.zeros((M, 2), np.float32)
    uv[:n] = base + np.arange(n)[:, None]
    return jnp.asarray(uv)


def _step(table, id_vals, stamp, depth_base=10.0):
    ids, valid = _ids(id_vals)
    n = len(id_vals)
    d_new = jnp.asarray(
        np.where(np.arange(M) < n, depth_base + np.arange(M), -1.0),
        dtype=jnp.float32)
    d_prev = d_new - 1.0
    return update_tracks(table, ids, valid, _uv(n, 100.0), _uv(n, 50.0),
                         d_new, d_prev, jnp.asarray(float(stamp)))


def test_new_tracks_seed_two_entries():
    table = TrackTable.create(T, L)
    table, slot = _step(table, [7, 9], 0.0)
    slot = np.asarray(slot)
    assert (slot[:2] >= 0).all()
    s0 = slot[0]
    assert int(table.track_id[s0]) == 7
    assert int(table.length[s0]) == 2
    assert int(table.age[s0]) == 1
    # newest first: col 0 = current frame, col 1 = previous frame
    np.testing.assert_allclose(np.asarray(table.uv[s0, 0]), [100.0, 100.0])
    np.testing.assert_allclose(np.asarray(table.uv[s0, 1]), [50.0, 50.0])
    assert float(table.depth[s0, 0]) == 10.0
    assert float(table.depth[s0, 1]) == 9.0


def test_existing_track_pushes_one():
    table = TrackTable.create(T, L)
    table, slot0 = _step(table, [7], 0.0, depth_base=10.0)
    table, slot1 = _step(table, [7], 1.0, depth_base=20.0)
    s = int(np.asarray(slot1)[0])
    assert s == int(np.asarray(slot0)[0])  # same slot
    assert int(table.length[s]) == 3
    assert int(table.age[s]) == 2
    np.testing.assert_allclose(
        np.asarray(table.depth[s, :3]), [20.0, 10.0, 9.0])


def test_gc_drops_unmatched():
    table = TrackTable.create(T, L)
    table, _ = _step(table, [1, 2, 3], 0.0)
    assert int(jnp.sum(table.active())) == 3
    table, _ = _step(table, [2], 1.0)
    assert int(jnp.sum(table.active())) == 1
    active_ids = np.asarray(table.track_id)[np.asarray(table.active())]
    assert list(active_ids) == [2]


def test_slot_reuse_after_gc():
    table = TrackTable.create(4, L)  # tiny table
    table, _ = _step(table, [1, 2, 3, 4], 0.0)
    table, _ = _step(table, [5, 6], 1.0)  # all old dropped, 2 new
    assert int(jnp.sum(table.active())) == 2
    ids = sorted(np.asarray(table.track_id)[np.asarray(table.active())])
    assert ids == [5, 6]


def test_overflow_drops_new_tracks():
    table = TrackTable.create(2, L)
    table, slot = _step(table, [1, 2, 3], 0.0)
    # only 2 slots: third new track dropped
    slot = np.asarray(slot)
    assert (slot >= 0).sum() == 2
    assert int(jnp.sum(table.active())) == 2


def test_window_rolls():
    table = TrackTable.create(T, L)
    for f in range(L + 3):
        table, _ = _step(table, [1], float(f), depth_base=float(f))
    s = int(np.argmax(np.asarray(table.active())))
    assert int(table.length[s]) == L
    assert int(table.age[s]) == L + 3
    # newest depth at col 0
    assert float(table.depth[s, 0]) == float(L + 2)
    # stamps newest first
    np.testing.assert_allclose(float(table.stamps[0]), float(L + 2))


def test_match_tracks():
    table = TrackTable.create(T, L)
    table, _ = _step(table, [10, 20], 0.0)
    ids, valid = _ids([20, 30])
    slot, is_new = match_tracks(table, ids, valid)
    assert int(slot[0]) >= 0 and bool(~is_new[0])
    assert int(slot[1]) == -1 and bool(is_new[1])


def test_process_frame_end_to_end():
    cfg = DepthEstimatorConfig(
        max_points=4096, max_features=M, image_width=256, image_height=128,
        ransac_num_hypotheses=128, ransac_subsample_points=1024,
        do_use_ransac_plane=False)
    cam = PinholeCamera(256, 128, 200.0, 128.0, 64.0)
    state = TrackletDepthState.create(cfg, T, L)

    # wall at z=20 covering the image, ~2 px point spacing
    xs, ys = np.meshgrid(np.linspace(-0.64, 0.64, 60),
                         np.linspace(-0.32, 0.32, 60))
    xs = xs + np.random.default_rng(3).normal(size=xs.shape) * 0.003
    ys = ys + np.random.default_rng(4).normal(size=ys.shape) * 0.003
    pts = np.stack([xs.ravel() * 20, ys.ravel() * 20,
                    np.full(xs.size, 20.0)], 1).astype(np.float32)
    cloud = np.zeros((4096, 3), np.float32)
    cloud[:len(pts)] = pts
    cvalid = np.zeros(4096, bool)
    cvalid[:len(pts)] = True

    ids, valid = _ids([1, 2, 3])
    uv = np.zeros((M, 2), np.float32)
    uv[:3] = [[128, 64], [100, 50], [150, 70]]
    fr = FrameInput(
        cloud=jnp.asarray(cloud), cloud_valid=jnp.asarray(cvalid),
        ids=ids, ids_valid=valid, uv_new=jnp.asarray(uv),
        uv_prev=jnp.asarray(uv), stamp=jnp.asarray(0.0),
        rng=jax.random.PRNGKey(0))
    state, depths, codes = process_frame(cfg, cam, SE3.identity(), state, fr)

    codes = np.asarray(codes)
    assert (codes[:3] == R.Success).all()
    np.testing.assert_allclose(np.asarray(depths)[:3], 20.0, atol=0.1)
    assert int(jnp.sum(state.table.active())) == 3
    # frame 1 cloud invalid (degradation path): depths all -1 but
    # tracks still updated
    fr2 = fr._replace(cloud_valid=jnp.zeros(4096, dtype=bool),
                      stamp=jnp.asarray(1.0))
    state2, depths2, codes2 = process_frame(cfg, cam, SE3.identity(), state, fr2)
    assert (np.asarray(codes2)[:3] == R.RadiusSearchInsufficientPoints).all()
    assert (np.asarray(depths2)[:3] == -1).all()
    assert int(jnp.sum(state2.table.active())) == 3


def test_process_sequence_scan():
    cfg = DepthEstimatorConfig(
        max_points=2048, max_features=M, image_width=128, image_height=64,
        ransac_num_hypotheses=64, ransac_subsample_points=512,
        do_use_ransac_plane=False)
    cam = PinholeCamera(128, 64, 100.0, 64.0, 32.0)
    state = TrackletDepthState.create(cfg, T, L)
    F = 4
    rngk = jax.random.split(jax.random.PRNGKey(0), F)
    pts = np.random.default_rng(0).uniform(
        [-5, -2, 5], [5, 2, 40], (F, 2048, 3)).astype(np.float32)
    ids = np.tile(np.arange(M, dtype=np.int32), (F, 1))
    uv = np.random.default_rng(1).uniform(
        [4, 4], [124, 60], (F, M, 2)).astype(np.float32)
    frames = FrameInput(
        cloud=jnp.asarray(pts), cloud_valid=jnp.ones((F, 2048), bool),
        ids=jnp.asarray(ids), ids_valid=jnp.ones((F, M), bool),
        uv_new=jnp.asarray(uv), uv_prev=jnp.asarray(uv),
        stamp=jnp.arange(F, dtype=jnp.float32),
        rng=rngk)
    final, depths, codes = process_sequence(cfg, cam, SE3.identity(),
                                            state, frames)
    assert depths.shape == (F, M)
    assert int(jnp.sum(final.table.active())) == M
    # counters: cur-pass counts every valid feature each frame; the
    # prev-pass counts only brand-new tracks (all M in frame 0 only,
    # since ids repeat afterwards).
    assert int(final.counters.sum()) == F * M + M
