#!/usr/bin/env python
"""Diagnose the multi-lap endurance closure failure (VERDICT r4 #1).

Replicates ENDURANCE_r4's setup at a configurable scale (default 3
laps x 220 frames), caches VO + verified closures under /tmp, and
prints per-closure ground-truth error, the consistency matrix, the
filter's keep/kill decisions, calibrated weights, and the backend ATE
under the current strategy — so filter/solver changes iterate in
seconds instead of re-running 6-minute VO.

Usage: python scripts/diag_multilap.py [--laps 3] [--fresh-closures]
"""

import argparse
import pickle
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402

W, H = 384, 128
LAP = 220


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--laps", type=int, default=3)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--fresh-closures", action="store_true")
    ap.add_argument("--max-candidates", type=int, default=None)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from mono_lidar_depth_tpu import DepthEstimatorConfig
    from mono_lidar_depth_tpu.eval import (eval_vo_sequence,
                                           propose_loop_closures,
                                           run_pose_graph_backend)
    from mono_lidar_depth_tpu.eval.kitti_eval import (
        calibrate_closure_weights, closure_constraint_from_frames,
        filter_consistent_closures)
    from mono_lidar_depth_tpu.io.kitti import KittiSequence
    from mono_lidar_depth_tpu.io.synthetic_dataset import (
        SyntheticSpec, generate_kitti_sequence)
    from mono_lidar_depth_tpu.vo.metrics import ate_rmse

    frames = args.laps * LAP
    cache = Path(f"/tmp/diag_multilap_{args.laps}")
    cache.mkdir(exist_ok=True)
    root = str(cache / "data")
    if not (cache / "data" / "sequences" / "97").exists():
        print(f"generating {frames}-frame {args.laps}-lap sequence...",
              flush=True)
        generate_kitti_sequence(
            root, "97", SyntheticSpec(frames=frames, image_width=W,
                                      image_height=H, focal=240.0,
                                      lidar_rows=20, lidar_cols=500,
                                      step=0.55, loop=True,
                                      lap_frames=LAP))
    seq = KittiSequence(root, "97", image_width=W, image_height=H)
    cfg = DepthEstimatorConfig(
        max_points=16384, max_features=384, image_width=W, image_height=H,
        radiusSearch_count_min=1,
        ransac_num_hypotheses=256, ransac_subsample_points=1024)

    vo_pkl = cache / "vo.pkl"
    if vo_pkl.exists():
        vo = pickle.loads(vo_pkl.read_bytes())
    else:
        t0 = time.perf_counter()
        vo = eval_vo_sequence(seq, cfg, max_tracks=384, max_length=8,
                              verbose=False)
        print(f"VO wall {time.perf_counter()-t0:.1f}s", flush=True)
        vo = {k: v for k, v in vo.items() if k != "carry"}
        vo_pkl.write_bytes(pickle.dumps(vo))
    poses = vo["poses"]
    gt = seq.gt_poses[vo["frame_ids"]]
    ate_vo = float(ate_rmse(poses[:, :3, 3], gt[:, :3, 3]))
    print(f"frames={len(poses)}  ATE VO = {ate_vo:.3f} m")

    # ---- closures (cached) -------------------------------------------
    cl_pkl = cache / "closures.pkl"
    if cl_pkl.exists() and not args.fresh_closures:
        cands, closures = pickle.loads(cl_pkl.read_bytes())
    else:
        kw = {}
        if args.max_candidates is not None:
            kw["max_candidates"] = args.max_candidates
        cands = propose_loop_closures(poses, min_gap=100, radius=8.0,
                                      stride=4,
                                      **({"max_candidates": 60} | kw))
        print(f"{len(cands)} candidates proposed", flush=True)
        closures = []
        t0 = time.perf_counter()
        for (i, j) in cands:
            z = closure_constraint_from_frames(
                seq, cfg, vo["frame_ids"][i], vo["frame_ids"][j],
                max_features=cfg.max_features)
            if z is not None:
                closures.append((i, j, *z))
        print(f"{len(closures)} verified "
              f"({time.perf_counter()-t0:.1f}s)", flush=True)
        cl_pkl.write_bytes(pickle.dumps((cands, closures)))

    # ---- per-closure ground truth error -------------------------------
    def gt_rel(i, j):
        return np.linalg.inv(gt[i]) @ gt[j]

    def ang(R):
        return np.degrees(np.arccos(np.clip((np.trace(R) - 1) / 2, -1, 1)))

    print(f"\nproposed={len(cands)} verified={len(closures)}")
    print("per-closure measurement error vs GT "
          "(lap_i, lap_j = lap index of endpoints):")
    for k, c in enumerate(closures):
        i, j, zr, zt = c[:4]
        Z = np.eye(4)
        Z[:3, :3] = np.asarray(zr, np.float64)
        Z[:3, 3] = np.asarray(zt, np.float64)
        E = np.linalg.inv(Z) @ gt_rel(i, j)
        print(f"  [{k:2d}] ({i:4d},{j:4d}) laps({i//LAP},{j//LAP}) "
              f"pos_in_lap({i%LAP:3d},{j%LAP:3d}) "
              f"err: {np.linalg.norm(E[:3,3]):7.3f} m "
              f"{ang(E[:3,:3]):6.2f} deg  w6={np.asarray(c[4])[:1]}"
              f"/{np.asarray(c[4])[3:4]}" if len(c) > 4 else "")

    # ---- consistency matrix + filter ---------------------------------
    def _remeasure(a, b):
        return closure_constraint_from_frames(
            seq, cfg, vo["frame_ids"][a], vo["frame_ids"][b],
            max_features=cfg.max_features)

    used = filter_consistent_closures(poses, closures,
                                      remeasure=_remeasure)
    kept = [k for k, c in enumerate(closures) if any(
        c[0] == u[0] and c[1] == u[1] for u in used)]
    print(f"\nfilter kept {len(used)}/{len(closures)}: {kept}")

    calib = calibrate_closure_weights(poses, used) if used else []
    for k, c in enumerate(calib):
        print(f"  used[{k}] ({c[0]},{c[1]}) w6={np.asarray(c[4])}")

    # ---- solves -------------------------------------------------------
    for name, cl in (("used(filtered)", used),
                     ("all-verified", closures)):
        if not cl:
            print(f"{name}: no closures")
            continue
        t0 = time.perf_counter()
        opt = run_pose_graph_backend(poses, cl, consistency_filter=False)
        ate = float(ate_rmse(opt[:, :3, 3], gt[:, :3, 3]))
        print(f"{name}: n={len(cl)}  ATE {ate_vo:.3f} -> {ate:.3f} m "
              f"({time.perf_counter()-t0:.1f}s)")


if __name__ == "__main__":
    main()
