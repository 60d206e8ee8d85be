"""The scanned eval drivers process sequences in bounded-memory chunks
(kitti_eval._CHUNK_FRAMES); chunking is an execution detail and must
not change a single number — same counters, same trajectory — because
the scan carry threads unchanged across chunk boundaries."""

import numpy as np
import pytest

from mono_lidar_depth_tpu import DepthEstimatorConfig
from mono_lidar_depth_tpu.eval import eval_depth_sequence, eval_vo_sequence
from mono_lidar_depth_tpu.eval import kitti_eval
from mono_lidar_depth_tpu.io.kitti import KittiSequence
from mono_lidar_depth_tpu.io.synthetic_dataset import (SyntheticSpec,
                                                       generate_kitti_sequence)

W, H = 256, 96


@pytest.fixture(scope="module")
def seq(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("kitti_chunk"))
    generate_kitti_sequence(
        root, "95",
        SyntheticSpec(frames=25, image_width=W, image_height=H,
                      focal=160.0, lidar_rows=16, lidar_cols=300,
                      step=0.55))
    return KittiSequence(root, "95", image_width=W, image_height=H)


@pytest.fixture(scope="module")
def cfg():
    return DepthEstimatorConfig(
        max_points=8192, max_features=256, image_width=W, image_height=H,
        radiusSearch_count_min=1,
        ransac_num_hypotheses=128, ransac_subsample_points=512)


def _with_chunk(monkeypatch, n):
    monkeypatch.setattr(kitti_eval, "_CHUNK_FRAMES", n)


def test_depth_eval_chunk_invariant(seq, cfg, monkeypatch):
    big = eval_depth_sequence(seq, cfg, max_tracks=256, max_length=6,
                              verbose=False)
    _with_chunk(monkeypatch, 7)  # 25 frames -> chunks of 7/7/7/4
    small = eval_depth_sequence(seq, cfg, max_tracks=256, max_length=6,
                                verbose=False)
    assert big["counters"] == small["counters"]


def test_vo_eval_chunk_invariant(seq, cfg, monkeypatch):
    big = eval_vo_sequence(seq, cfg, max_tracks=256, max_length=6,
                           verbose=False)
    _with_chunk(monkeypatch, 9)
    small = eval_vo_sequence(seq, cfg, max_tracks=256, max_length=6,
                             verbose=False)
    assert big["frames"] == small["frames"]
    np.testing.assert_allclose(small["poses"], big["poses"],
                               rtol=0, atol=1e-6)


def test_vo_checkpoint_resume_equivalence(seq, cfg, monkeypatch, tmp_path):
    """Mid-run checkpoint/resume must reproduce the straight-through
    trajectory exactly: run frames 0..13, snapshot the scan carry
    through the on-disk checkpoint format, resume at frame 14, and
    compare against one uninterrupted run (the endurance-run
    requirement — scripts/endurance_run.py does this at 2000+ frames;
    this pins the mechanism in CI)."""
    from mono_lidar_depth_tpu.io.checkpoint import (load_checkpoint,
                                                    save_checkpoint)

    _with_chunk(monkeypatch, 7)
    full = eval_vo_sequence(seq, cfg, max_tracks=256, max_length=6,
                            verbose=False)
    part1 = eval_vo_sequence(seq, cfg, max_tracks=256, max_length=6,
                             verbose=False, max_frames=14,
                             return_carry=True)
    ckpt = str(tmp_path / "vo_state.npz")
    save_checkpoint(ckpt, part1["carry"], {"next_frame": 14})
    # restore through the file (round-trips dtypes/shapes)
    carry, meta = load_checkpoint(ckpt, part1["carry"])
    assert meta["next_frame"] == 14
    part2 = eval_vo_sequence(seq, cfg, max_tracks=256, max_length=6,
                             verbose=False, start_frame=14,
                             init_carry=carry)
    stitched = np.concatenate([part1["poses"], part2["poses"]])
    assert part1["frame_ids"][-1] + 1 == part2["frame_ids"][0]
    assert len(stitched) == len(full["poses"])
    np.testing.assert_allclose(stitched, full["poses"], rtol=0, atol=1e-6)
