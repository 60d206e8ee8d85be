#!/usr/bin/env python
"""Offline experiments on cached multi-lap closures (diag_multilap
cache): try filter variants and solve configurations without re-running
VO/verification."""

import pickle
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402

LAP = 220


def main():
    laps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    cache = Path(f"/tmp/diag_multilap_{laps}")
    import jax
    jax.config.update("jax_platforms", "cpu")

    from mono_lidar_depth_tpu.io.kitti import KittiSequence
    from mono_lidar_depth_tpu.eval import run_pose_graph_backend
    from mono_lidar_depth_tpu.vo.metrics import ate_rmse

    vo = pickle.loads((cache / "vo.pkl").read_bytes())
    cands, closures = pickle.loads((cache / "closures.pkl").read_bytes())
    seq = KittiSequence(str(cache / "data"), "97",
                        image_width=384, image_height=128)
    poses = vo["poses"]
    gt = seq.gt_poses[vo["frame_ids"]]
    ate_vo = float(ate_rmse(poses[:, :3, 3], gt[:, :3, 3]))
    print(f"ATE VO {ate_vo:.3f} m,  {len(closures)} verified closures")

    def gt_err(c):
        i, j, zr, zt = c[:4]
        Z = np.eye(4)
        Z[:3, :3] = np.asarray(zr, np.float64)
        Z[:3, 3] = np.asarray(zt, np.float64)
        E = np.linalg.inv(Z) @ (np.linalg.inv(gt[i]) @ gt[j])
        return float(np.linalg.norm(E[:3, 3]))

    def solve(cl, label, **kw):
        if not cl:
            print(f"  {label}: EMPTY")
            return
        opt = run_pose_graph_backend(poses, cl, consistency_filter=False,
                                     **kw)
        ate = float(ate_rmse(opt[:, :3, 3], gt[:, :3, 3]))
        print(f"  {label}: n={len(cl)}  ATE {ate_vo:.3f} -> {ate:.3f} m")
        return ate

    # A. oracle filter: keep GT-error < 0.5 m closures
    good = [c for c in closures if gt_err(c) < 0.5]
    print(f"A. oracle-good closures: {len(good)}")
    solve(good, "oracle-good")
    solve(good, "oracle-good nocalib", calibrate_weights=False)

    # B. all verified
    solve(list(closures), "all-verified")
    solve(list(closures), "all-verified nocalib", calibrate_weights=False)

    # C. current filter
    from mono_lidar_depth_tpu.eval.kitti_eval import (
        filter_consistent_closures)
    used = filter_consistent_closures(poses, closures)
    print(f"C. current filter kept {len(used)}")
    solve(used, "current-filter")


if __name__ == "__main__":
    main()
