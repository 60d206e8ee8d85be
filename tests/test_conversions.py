"""Conversion-layer tests (mirrors
matches_msg_conversions_ros/test/test_matches_msg_conversions_ros.cpp:
structure preservation + flag propagation across record flavors)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mono_lidar_depth_tpu.conversions import (
    add_outlier_flags, lift_to_depth, mark_depth_outlier,
    newest_pair_points, semantic_labels_for_tracks)
from mono_lidar_depth_tpu.io.messages import FeatureTracks


def _tracks(n=4, L=3):
    rng = np.random.default_rng(0)
    return FeatureTracks(
        uv=rng.uniform(0, 100, (n, L, 2)).astype(np.float32),
        depth=rng.uniform(1, 50, (n, L)).astype(np.float32),
        length=np.array([3, 2, 3, 1]),
        track_id=np.array([10, 11, 12, 13]),
        age=np.array([2, 1, 2, 0]),
        stamps=np.array([2.0, 1.0, 0.0]))


def test_add_outlier_flags_default_shim():
    t = _tracks()
    out = add_outlier_flags(t)
    assert out.is_outlier is not None
    assert not out.is_outlier.any()  # AddOutlierFlag: all false
    np.testing.assert_array_equal(out.uv, t.uv)  # structure preserved
    np.testing.assert_array_equal(out.track_id, t.track_id)


def test_add_outlier_flags_size_mismatch():
    t = _tracks()
    with pytest.raises(ValueError):
        add_outlier_flags(t, is_outlier=np.zeros(3, bool))


def test_lift_to_depth():
    t = _tracks()
    lifted = lift_to_depth(t.uv, t.length, t.track_id, t.age, t.stamps)
    assert (lifted.depth == -1).all()
    np.testing.assert_array_equal(lifted.uv, t.uv)


def test_mark_depth_outlier_zips_by_id():
    t = _tracks()
    flagged = add_outlier_flags(
        _tracks(), is_outlier=np.array([True, False, True, False]),
        error=np.array([1.5, 0.0, 2.5, 0.0]))
    # permute the flagged record: join must be order-independent
    perm = np.array([2, 0, 3, 1])
    flagged_perm = FeatureTracks(
        uv=flagged.uv[perm], depth=flagged.depth[perm],
        length=flagged.length[perm], track_id=flagged.track_id[perm],
        age=flagged.age[perm], stamps=flagged.stamps,
        is_outlier=flagged.is_outlier[perm], error=flagged.error[perm])
    out = mark_depth_outlier(t, flagged_perm)
    np.testing.assert_array_equal(out.is_outlier, [True, False, True, False])
    np.testing.assert_allclose(out.error, [1.5, 0.0, 2.5, 0.0])
    np.testing.assert_array_equal(out.depth, t.depth)  # depths kept


def test_mark_depth_outlier_missing_track_raises():
    t = _tracks()
    flagged = add_outlier_flags(_tracks())
    flagged.track_id[0] = 999
    with pytest.raises(ValueError):
        mark_depth_outlier(t, flagged)


def test_semantic_labels_roi_argmax():
    img = np.zeros((64, 64), np.int32)
    img[10:20, 10:20] = 7  # road patch
    img[15, 15] = 3  # single other label inside the ROI
    uv = jnp.asarray([[15.0, 15.0], [50.0, 50.0]], dtype=jnp.float32)
    valid = jnp.asarray([True, True])
    labels = semantic_labels_for_tracks(uv, valid, jnp.asarray(img), roi=5)
    assert int(labels[0]) == 7  # majority label in ROI wins
    assert int(labels[1]) == 0
    # invalid track → -1
    labels2 = semantic_labels_for_tracks(uv, jnp.asarray([True, False]),
                                         jnp.asarray(img), roi=5)
    assert int(labels2[1]) == -1


def test_newest_pair_points():
    t = _tracks()
    cur, prev, ids = newest_pair_points(t)
    # only tracks with length >= 2 (drops the length-1 track id 13)
    assert set(ids.tolist()) == {10, 11, 12}
    np.testing.assert_array_equal(cur, t.uv[t.length >= 2, 0])
    np.testing.assert_array_equal(prev, t.uv[t.length >= 2, 1])


def test_feature_tracks_roundtrip(tmp_path):
    t = add_outlier_flags(_tracks(), is_outlier=np.array([1, 0, 0, 1], bool))
    p = str(tmp_path / "tracks.npz")
    t.save(p)
    t2 = FeatureTracks.load(p)
    np.testing.assert_array_equal(t2.uv, t.uv)
    np.testing.assert_array_equal(t2.is_outlier, t.is_outlier)
    s, f = t2.success_fail_counts()
    assert s + f == int(t.length.sum())
