"""Checkpoint / resume tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from mono_lidar_depth_tpu import DepthEstimatorConfig
from mono_lidar_depth_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from mono_lidar_depth_tpu.tracks.pipeline import TrackletDepthState
from mono_lidar_depth_tpu.vo.pipeline import OdometryConfig, OdometryState

CFG = DepthEstimatorConfig(max_points=1024, max_features=32,
                           image_width=128, image_height=64,
                           ransac_num_hypotheses=64,
                           ransac_subsample_points=256)


def test_roundtrip_odometry_state(tmp_path):
    state = OdometryState.create(CFG, OdometryConfig(), 64, 8)
    # mutate some leaves so the roundtrip is non-trivial
    state = state._replace(
        frame_idx=jnp.int32(17),
        win_t=state.win_t.at[0].set(jnp.asarray([1.0, 2.0, 3.0])))
    p = str(tmp_path / "ckpt.npz")
    save_checkpoint(p, state, {"frame": 17, "seq": "00"})
    like = OdometryState.create(CFG, OdometryConfig(), 64, 8)
    restored, meta = load_checkpoint(p, like)
    assert meta == {"frame": 17, "seq": "00"}
    assert int(restored.frame_idx) == 17
    np.testing.assert_allclose(np.asarray(restored.win_t[0]), [1, 2, 3])
    # full-tree equality
    import jax
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_shape_mismatch_rejected(tmp_path):
    state = TrackletDepthState.create(CFG, 64, 8)
    p = str(tmp_path / "ckpt.npz")
    save_checkpoint(p, state)
    wrong = TrackletDepthState.create(CFG, 32, 8)  # different capacity
    with pytest.raises(ValueError):
        load_checkpoint(p, wrong)


def test_atomic_overwrite(tmp_path):
    state = TrackletDepthState.create(CFG, 64, 8)
    p = str(tmp_path / "ckpt.npz")
    save_checkpoint(p, state, {"v": 1})
    save_checkpoint(p, state, {"v": 2})
    _, meta = load_checkpoint(p, state)
    assert meta["v"] == 2
