#!/usr/bin/env python
"""Diagnose loop-closure measurement quality on the 84-frame synthetic
loop: for every proposed candidate print the measured Z vs the
ground-truth relative pose, the verification stats, and the derived
confidence weights.  Caches the dataset + VO run under /tmp for fast
iteration."""

import pickle
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402

CACHE = Path("/tmp/diag_closures_cache")


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")

    from mono_lidar_depth_tpu import DepthEstimatorConfig
    from mono_lidar_depth_tpu.eval import (eval_vo_sequence,
                                           propose_loop_closures,
                                           run_pose_graph_backend)
    from mono_lidar_depth_tpu.eval.kitti_eval import (
        closure_constraint_from_frames)
    from mono_lidar_depth_tpu.io.kitti import KittiSequence
    from mono_lidar_depth_tpu.io.synthetic_dataset import (
        SyntheticSpec, generate_kitti_sequence)
    from mono_lidar_depth_tpu.vo.metrics import ate_rmse

    W, H = 384, 128
    CACHE.mkdir(exist_ok=True)
    root = str(CACHE / "data")
    vo_pkl = CACHE / "vo.pkl"
    if not (CACHE / "data" / "sequences" / "98").exists() \
            and not list(Path(root).glob("**/98")):
        generate_kitti_sequence(
            root, "98",
            SyntheticSpec(frames=84, image_width=W, image_height=H,
                          focal=240.0, lidar_rows=20, lidar_cols=500,
                          step=0.55, loop=True))
    cfg = DepthEstimatorConfig(
        max_points=16384, max_features=384, image_width=W, image_height=H,
        radiusSearch_count_min=1,
        ransac_num_hypotheses=256, ransac_subsample_points=1024)
    seq = KittiSequence(root, "98", image_width=W, image_height=H)
    if vo_pkl.exists():
        vo = pickle.loads(vo_pkl.read_bytes())
    else:
        vo = eval_vo_sequence(seq, cfg, max_tracks=384, max_length=8,
                              verbose=False)
        vo_pkl.write_bytes(pickle.dumps(
            {k: v for k, v in vo.items()}))
    poses = vo["poses"]
    gt = seq.gt_poses[vo["frame_ids"]]
    ate_vo = ate_rmse(poses[:, :3, 3], gt[:, :3, 3])
    print(f"VO ATE {ate_vo:.3f} m")

    cands = propose_loop_closures(poses, min_gap=30, radius=8.0, stride=2,
                                  max_candidates=8)
    print(f"{len(cands)} candidates: {cands}")
    closures = []
    for (i, j) in cands:
        z = closure_constraint_from_frames(
            seq, cfg, vo["frame_ids"][i], vo["frame_ids"][j],
            max_features=cfg.max_features)
        Tg = np.linalg.inv(gt[i]) @ gt[j]
        tg = Tg[:3, 3]
        if z is None:
            print(f"  ({i:2d},{j:2d}) REJECTED   gt |t|={np.linalg.norm(tg):5.2f}")
            continue
        zr, zt, w6 = z
        ang_err = np.degrees(np.arccos(np.clip(
            (np.trace(Tg[:3, :3].T @ zr) - 1) / 2, -1, 1)))
        t_err = np.linalg.norm(zt - tg)
        print(f"  ({i:2d},{j:2d}) |Zt|={np.linalg.norm(zt):5.2f} "
              f"gt|t|={np.linalg.norm(tg):5.2f} t_err={t_err:5.2f} m "
              f"rot_err={ang_err:6.3f} deg conf_t={w6[0]:.3f} "
              f"conf_r={w6[3]:.3f}")
        closures.append((i, j, zr, zt, w6))
    if closures:
        opt = run_pose_graph_backend(poses, closures)
        ate_pg = ate_rmse(opt[:, :3, 3], gt[:, :3, 3])
        print(f"pose-graph ATE {ate_pg:.3f} m (VO {ate_vo:.3f})")


if __name__ == "__main__":
    main()
