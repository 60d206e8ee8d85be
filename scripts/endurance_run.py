#!/usr/bin/env python
"""Endurance record: one 2000+ frame sequence end-to-end — VO +
sliding-window BA + pose-graph backend — with a mid-run
checkpoint/resume equivalence check (VERDICT r3 item 8; KITTI 00 is
4541 frames, BASELINE configs 4-5).

Stages:
  1. generate a 2048-frame synthetic loop sequence (cached per tmpdir);
  2. straight-through VO (chunked scan driver), wall + per-frame time;
  3. checkpointed run: stop at frame ~1024, snapshot the scan carry to
     the on-disk .npz format, restore, resume — the stitched
     trajectory must match the straight-through one to 1e-5;
  4. pose-graph backend over the full trajectory (proposal on the
     estimate, KLT+depth+GN verification from the images, consistency
     filter, calibrated chain-preconditioned solve) — the closure
     budget scales with the number of laps so coverage reaches the
     drifted tail;
  5. the same full chain under INJECTED heavy drift (0.05 deg/frame
     yaw bias + 3% scale on the VO output; images untouched) —
     recovery percentage at endurance scale;
  6. write ENDURANCE_<tag>.json.

Usage: python scripts/endurance_run.py [--frames 2048] [--platform cpu]
"""

import argparse
import json
import time
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

W, H = 384, 128


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=2048)
    ap.add_argument("--checkpoint-at", type=int, default=1024)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--tag", default="r5")
    ap.add_argument("--seq-dir", default=None,
                    help="reuse a previously generated sequence dir")
    ap.add_argument("--skip-checkpoint", action="store_true",
                    help="skip stage 3 (resume-equivalence) for faster "
                         "backend iteration; the committed record runs "
                         "all stages")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import numpy as np

    from mono_lidar_depth_tpu import DepthEstimatorConfig
    from mono_lidar_depth_tpu.eval import (eval_vo_sequence,
                                           propose_loop_closures,
                                           propose_loop_closures_appearance,
                                           run_pose_graph_backend,
                                           union_closure_candidates)
    from mono_lidar_depth_tpu.eval.kitti_eval import (
        closure_constraint_from_frames, filter_consistent_closures)
    from mono_lidar_depth_tpu.io.checkpoint import (load_checkpoint,
                                                    save_checkpoint)
    from mono_lidar_depth_tpu.io.kitti import KittiSequence
    from mono_lidar_depth_tpu.io.synthetic_dataset import (
        SyntheticSpec, generate_kitti_sequence)
    from mono_lidar_depth_tpu.vo.metrics import ate_rmse

    rec = {"frames": args.frames, "backend": jax.default_backend()}

    # ---- 1. sequence -------------------------------------------------
    root = args.seq_dir or tempfile.mkdtemp(prefix="endurance_")
    if not (Path(root) / "sequences" / "97").exists():
        print(f"[1/5] generating {args.frames}-frame loop sequence "
              f"under {root} ...", flush=True)
        t0 = time.perf_counter()
        generate_kitti_sequence(
            root, "97", SyntheticSpec(frames=args.frames, image_width=W,
                                      image_height=H, focal=240.0,
                                      lidar_rows=20, lidar_cols=500,
                                      step=0.55, loop=True,
                                      lap_frames=220))
        rec["gen_wall_s"] = round(time.perf_counter() - t0, 1)
    seq = KittiSequence(root, "97", image_width=W, image_height=H)
    cfg = DepthEstimatorConfig(
        max_points=16384, max_features=384, image_width=W, image_height=H,
        radiusSearch_count_min=1,
        ransac_num_hypotheses=256, ransac_subsample_points=1024)

    # ---- 2. straight-through VO --------------------------------------
    print("[2/5] straight-through VO + window BA ...", flush=True)
    t0 = time.perf_counter()
    vo = eval_vo_sequence(seq, cfg, max_tracks=384, max_length=8,
                          verbose=False)
    wall = time.perf_counter() - t0
    gt = seq.gt_poses[vo["frame_ids"]]
    ate_vo = float(ate_rmse(vo["poses"][:, :3, 3], gt[:, :3, 3]))
    rec["vo"] = {"frames": vo["frames"],
                 "wall_s": round(wall, 1),
                 "ms_per_frame": round(1e3 * wall / vo["frames"], 1),
                 "ate_rmse_m": round(ate_vo, 3)}
    print("   ", json.dumps(rec["vo"]), flush=True)

    # ---- 3. checkpoint/resume equivalence ----------------------------
    if args.skip_checkpoint:
        print("[3/5] checkpoint/resume SKIPPED (--skip-checkpoint)",
              flush=True)
        rec["checkpoint_resume"] = {"skipped": True}
    else:
        print(f"[3/5] checkpoint at frame {args.checkpoint_at} "
              "+ resume ...", flush=True)
        part1 = eval_vo_sequence(seq, cfg, max_tracks=384, max_length=8,
                                 verbose=False,
                                 max_frames=args.checkpoint_at,
                                 return_carry=True)
        ckpt = str(Path(root) / "vo_checkpoint.npz")
        save_checkpoint(ckpt, part1["carry"],
                        {"next_frame": args.checkpoint_at})
        carry, meta = load_checkpoint(ckpt, part1["carry"])
        part2 = eval_vo_sequence(seq, cfg, max_tracks=384, max_length=8,
                                 verbose=False,
                                 start_frame=meta["next_frame"],
                                 init_carry=carry)
        stitched = np.concatenate([part1["poses"], part2["poses"]])
        max_dev = float(np.abs(stitched - vo["poses"]).max())
        rec["checkpoint_resume"] = {
            "checkpoint_frame": args.checkpoint_at,
            "checkpoint_bytes": Path(ckpt).stat().st_size,
            "max_pose_deviation": max_dev,
            "equivalent": bool(max_dev < 1e-5)}
        print("   ", json.dumps(rec["checkpoint_resume"]), flush=True)
        if not rec["checkpoint_resume"]["equivalent"]:
            raise SystemExit(f"resume NOT equivalent (max dev {max_dev})")

    # ---- 4. pose-graph backend ---------------------------------------
    print("[4/5] pose-graph backend ...", flush=True)
    poses = vo["poses"]
    laps = max(1, args.frames // 220)

    # Measurement memo: the drifted leg re-proposes many of the same
    # frame pairs and the consistency filter's remeasure callback
    # repeats hops — each KLT+depth+GN verification costs ~20 s of
    # per-pair dispatches on the remote TPU, so cache by frame pair.
    _memo: dict = {}

    def measure(fi: int, fj: int):
        key = (fi, fj)
        if key not in _memo:
            _memo[key] = closure_constraint_from_frames(
                seq, cfg, fi, fj, max_features=cfg.max_features)
        return _memo[key]

    # Appearance proposals consult only the images — no pose estimate
    # — so they are computed ONCE and shared by the nominal and
    # injected-drift legs (and stay valid in every drift regime; the
    # metric proposer's ranking is exactly what heavy drift corrupts).
    cands_app = propose_loop_closures_appearance(
        seq, [int(f) for f in vo["frame_ids"]], min_gap=100, stride=4,
        max_candidates=8 * laps)

    def run_backend(traj, label):
        """Full committed chain on a trajectory estimate: lap-scaled
        drift-aware metric proposal unioned with the pose-free
        appearance proposal, verification, consistency filter,
        calibrated solve.  Returns the record dict."""
        # Budget ~16 candidates per lap so coverage reaches the
        # drifted tail (the r4 cap of 60 truncated ascending-j and
        # clustered closures in the earliest laps); proposals thin
        # uniformly over j when over budget, and the jit-fused
        # verification (~0.8 s/pair) makes the bigger budget cheap.
        # min_candidates keeps the drift-aware escalation widening
        # until the proposal covers the loop, not just the
        # least-drifted revisit.
        cands = union_closure_candidates(
            propose_loop_closures(
                traj, min_gap=100, radius=8.0, stride=4,
                max_candidates=16 * laps, min_candidates=2 * laps),
            cands_app)
        closures = []
        t0 = time.perf_counter()
        for (i, j) in cands:
            z = measure(vo["frame_ids"][i], vo["frame_ids"][j])
            if z is not None:
                closures.append((i, j, *z))
        verify_wall = time.perf_counter() - t0

        def _remeasure(a, b):
            return measure(vo["frame_ids"][a], vo["frame_ids"][b])

        used = filter_consistent_closures(traj, closures,
                                          remeasure=_remeasure)
        t0 = time.perf_counter()
        if used:
            opt = run_pose_graph_backend(traj, used,
                                         consistency_filter=False)
            ate_pg = float(ate_rmse(opt[:, :3, 3], gt[:, :3, 3]))
        else:
            ate_pg = float("nan")
        ate_in = float(ate_rmse(traj[:, :3, 3], gt[:, :3, 3]))
        out = {
            "closures_proposed": len(cands),
            "closures_verified": len(closures),
            "closures_used": len(used),
            "closures_used_per_lap": round(len(used) / laps, 2),
            "verify_wall_s": round(verify_wall, 1),
            "solve_wall_s": round(time.perf_counter() - t0, 1),
            f"ate_{label}_m": round(ate_in, 3),
            "ate_posegraph_m": round(ate_pg, 3)}
        return out, ate_in, ate_pg

    rec["pose_graph"], ate_in, ate_pg = run_backend(poses, "vo")
    rec["pose_graph"]["ate_vo_m"] = round(ate_vo, 3)
    print("   ", json.dumps(rec["pose_graph"]), flush=True)

    # ---- 5. high-drift endurance leg ---------------------------------
    # The backend's raison d'etre at endurance scale: inject a
    # systematic yaw bias + scale error into the 2047-frame VO output
    # (images/clouds untouched, so verification measures TRUE relative
    # poses) and demand the full committed chain recovers it.  The
    # per-frame bias is scaled to the run length (0.05 deg/frame
    # accumulates 102 deg over 2048 frames — the same dominant-drift
    # regime as the 220-frame record's 0.5 deg/frame).
    print("[5/5] pose-graph backend under injected heavy drift ...",
          flush=True)
    yaw = np.radians(0.05)
    dR = np.array([[np.cos(yaw), 0, np.sin(yaw)], [0, 1, 0],
                   [-np.sin(yaw), 0, np.cos(yaw)]])
    drifted = [poses[0]]
    for k in range(len(poses) - 1):
        rel = np.linalg.inv(poses[k]) @ poses[k + 1]
        rel[:3, :3] = rel[:3, :3] @ dR
        rel[:3, 3] *= 1.03
        drifted.append(drifted[-1] @ rel)
    drifted = np.stack(drifted)
    hd, ate_drift, ate_hd = run_backend(drifted, "drifted")
    hd["injected"] = "0.05 deg/frame yaw bias + 3% scale error"
    hd["recovered_pct"] = (
        round(100.0 * (1.0 - ate_hd / ate_drift), 1)
        if np.isfinite(ate_hd) else None)
    rec["pose_graph_high_drift"] = hd
    print("   ", json.dumps(hd), flush=True)

    out = REPO / f"ENDURANCE_{args.tag}.json"
    out.write_text(json.dumps(rec, indent=1) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
