#!/usr/bin/env python
"""Regenerate the committed evaluation record (PARITY_r2.md / .json).

One script, all numbers (VERDICT r1 item 6):
  * config 2 — depth-association success rates on a 220-frame synthetic
    loop sequence, in three modes: RANSAC plane (3-way sync path),
    semantic plane (4-way path), and region growing enabled (the
    capability the reference only stubbed);
  * config 3 — full VO + sliding-window BA: ATE / RPE, with the
    landmark re-init vs persist ablation (VERDICT item 7);
  * config 4 — pose-graph backend with verified loop closures: ATE
    before/after;
  * scaling table — frame-parallel depth association + landmark-sharded
    BA at 1/2/4/8 virtual devices (subprocess: scripts/bench_scaling.py)
    and the 2-process jax.distributed demo;
  * TPU latency of region growing on/off (only when run on the TPU
    backend; the CPU run records rates only).

Usage:  python scripts/make_parity_record.py [--frames 220] [--quick]
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

W, H = 384, 128


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=220)
    ap.add_argument("--quick", action="store_true",
                    help="small run for smoke-testing the script")
    ap.add_argument("--out", default=str(REPO))
    ap.add_argument("--platform", default=None,
                    help="'cpu' forces the CPU backend (the image's "
                         "sitecustomize pins JAX_PLATFORMS=axon; the env "
                         "var alone cannot override it)")
    args = ap.parse_args()
    frames = 60 if args.quick else args.frames

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import numpy as np

    from mono_lidar_depth_tpu import DepthEstimatorConfig
    from mono_lidar_depth_tpu.eval import (eval_depth_sequence,
                                           eval_vo_sequence,
                                           propose_loop_closures,
                                           run_pose_graph_backend)
    from mono_lidar_depth_tpu.eval.kitti_eval import (
        closure_constraint_from_frames)
    from mono_lidar_depth_tpu.io.kitti import KittiSequence
    from mono_lidar_depth_tpu.io.synthetic_dataset import (
        SyntheticSpec, generate_kitti_sequence)
    from mono_lidar_depth_tpu.vo.metrics import ate_rmse
    from mono_lidar_depth_tpu.vo.pipeline import OdometryConfig

    backend = jax.default_backend()
    rec: dict = {"backend": backend, "frames": frames}

    tmp = tempfile.mkdtemp(prefix="parity_")
    print(f"[1/6] generating {frames}-frame synthetic loop sequence...",
          flush=True)
    generate_kitti_sequence(
        tmp, "98", SyntheticSpec(frames=frames, image_width=W,
                                 image_height=H, focal=240.0,
                                 lidar_rows=20, lidar_cols=500,
                                 step=0.55, loop=True))
    seq = KittiSequence(tmp, "98", image_width=W, image_height=H)
    cfg = DepthEstimatorConfig(
        max_points=16384, max_features=384, image_width=W, image_height=H,
        radiusSearch_count_min=1,
        ransac_num_hypotheses=256, ransac_subsample_points=1024)

    # ---- config 2: depth association ---------------------------------
    print("[2/6] depth association (ransac / semantic / region growing)",
          flush=True)
    depth = {}
    t0 = time.perf_counter()
    out = eval_depth_sequence(seq, cfg, max_tracks=512, max_length=8,
                              verbose=False)
    depth["ransac"] = {
        "success_rate_all": round(out["success_rate_all"], 4),
        "success_rate_lidar_covered":
            round(out["success_rate_lidar_covered"], 4),
        "wall_s": round(time.perf_counter() - t0, 1)}
    t0 = time.perf_counter()
    out = eval_depth_sequence(
        seq, cfg.replace(ransac_plane_refinement_treshold=0.3),
        max_tracks=512, max_length=8, verbose=False, plane_mode="semantic")
    depth["semantic"] = {
        "success_rate_all": round(out["success_rate_all"], 4),
        "success_rate_lidar_covered":
            round(out["success_rate_lidar_covered"], 4),
        "wall_s": round(time.perf_counter() - t0, 1)}
    t0 = time.perf_counter()
    out = eval_depth_sequence(
        seq, cfg.replace(do_use_depth_segmentation=True),
        max_tracks=512, max_length=8, verbose=False)
    depth["region_growing"] = {
        "success_rate_all": round(out["success_rate_all"], 4),
        "success_rate_lidar_covered":
            round(out["success_rate_lidar_covered"], 4),
        "wall_s": round(time.perf_counter() - t0, 1)}
    rec["depth"] = depth
    print("   ", json.dumps(depth), flush=True)

    # ---- config 3: VO + BA, landmark ablation -------------------------
    print("[3/6] VO + window BA (re-init vs persisted landmarks)",
          flush=True)
    vo_rec = {}
    vo_runs = {}
    for name, ocfg in (("reinit", OdometryConfig()),
                       ("persist", OdometryConfig(persist_landmarks=True))):
        vo = eval_vo_sequence(seq, cfg, ocfg, max_tracks=384, max_length=8,
                              verbose=False)
        vo_runs[name] = vo
        vo_rec[name] = {
            "ate_rmse_m": round(float(vo["ate_rmse"]), 3),
            "rpe_trans_rmse_m": round(float(vo["rpe_trans_rmse"]), 4),
            "rpe_rot_rmse_deg": round(float(vo["rpe_rot_rmse_deg"]), 4)}
    rec["vo"] = vo_rec
    print("   ", json.dumps(vo_rec), flush=True)

    # ---- config 4: pose-graph backend ---------------------------------
    print("[4/6] pose-graph backend with verified loop closures", flush=True)
    vo = vo_runs["reinit"]
    poses = vo["poses"]
    cands = propose_loop_closures(poses, min_gap=30, radius=8.0, stride=2,
                                  max_candidates=12)
    closures = []
    for (i, j) in cands:
        z = closure_constraint_from_frames(
            seq, cfg, vo["frame_ids"][i], vo["frame_ids"][j],
            max_features=cfg.max_features)
        if z is not None:
            closures.append((i, j, z[0], z[1]))
    gt = seq.gt_poses[vo["frame_ids"]]
    ate_vo = float(ate_rmse(poses[:, :3, 3], gt[:, :3, 3]))
    if closures:
        opt = run_pose_graph_backend(poses, closures)
        ate_pg = float(ate_rmse(opt[:, :3, 3], gt[:, :3, 3]))
    else:
        ate_pg = float("nan")
    rec["pose_graph"] = {
        "closures_proposed": len(cands),
        "closures_verified": len(closures),
        "ate_vo_m": round(ate_vo, 3),
        "ate_posegraph_m": round(ate_pg, 3)}
    print("   ", json.dumps(rec["pose_graph"]), flush=True)

    # ---- scaling table (virtual mesh, separate CPU process) ----------
    print("[5/6] scaling table (subprocess, virtual 8-device mesh)",
          flush=True)
    try:
        out = subprocess.run(
            [sys.executable, str(REPO / "scripts" / "bench_scaling.py"),
             "--devices", "1", "2", "4", "8"],
            capture_output=True, text=True, timeout=1800,
            cwd=str(REPO), env={**os.environ, "JAX_PLATFORMS": ""})
        lines = [json.loads(ln) for ln in out.stdout.splitlines()
                 if ln.startswith("{")]
        rec["scaling"] = lines
    except Exception as e:  # pragma: no cover
        rec["scaling"] = [{"error": str(e)}]
    print("   ", json.dumps(rec["scaling"]), flush=True)

    print("[6/6] 2-process jax.distributed demo (subprocess)", flush=True)
    try:
        out = subprocess.run(
            [sys.executable, str(REPO / "scripts" / "multihost_demo.py")],
            capture_output=True, text=True, timeout=900,
            cwd=str(REPO), env={**os.environ, "JAX_PLATFORMS": ""})
        ok = out.returncode == 0
        rec["multihost_demo"] = {
            "ok": ok,
            "tail": out.stdout.strip().splitlines()[-2:] if ok
            else out.stderr.strip().splitlines()[-3:]}
    except Exception as e:  # pragma: no cover
        rec["multihost_demo"] = {"ok": False, "tail": [str(e)]}
    print("   ", json.dumps(rec["multihost_demo"]), flush=True)

    out_json = Path(args.out) / "PARITY_r2.json"
    out_json.write_text(json.dumps(rec, indent=1) + "\n")

    md = _render_md(rec)
    (Path(args.out) / "PARITY_r2.md").write_text(md)
    print(f"wrote {out_json} and PARITY_r2.md")


def _render_md(rec: dict) -> str:
    d = rec["depth"]
    v = rec["vo"]
    pg = rec["pose_graph"]
    lines = [
        "# PARITY_r2 — committed evaluation record",
        "",
        f"Regenerated by `python scripts/make_parity_record.py` "
        f"(backend: {rec['backend']}, {rec['frames']}-frame synthetic "
        "loop sequence, 384x128 images, 20x500 lidar).",
        "",
        "## Config 2 — depth association success rates",
        "",
        "| plane mode | success (all) | success (lidar-covered) | wall s |",
        "|---|---|---|---|",
    ]
    for k in ("ransac", "semantic", "region_growing"):
        r = d[k]
        lines.append(
            f"| {k} | {100*r['success_rate_all']:.1f}% | "
            f"{100*r['success_rate_lidar_covered']:.1f}% | {r['wall_s']} |")
    lines += [
        "",
        "## Config 3 — VO + sliding-window BA (landmark ablation)",
        "",
        "| landmarks | ATE RMSE | RPE trans | RPE rot |",
        "|---|---|---|---|",
    ]
    for k in ("reinit", "persist"):
        r = v[k]
        lines.append(
            f"| {k} | {r['ate_rmse_m']} m | {r['rpe_trans_rmse_m']} m | "
            f"{r['rpe_rot_rmse_deg']} deg |")
    lines += [
        "",
        "## Config 4 — pose-graph backend",
        "",
        f"Loop closures: {pg['closures_verified']} verified of "
        f"{pg['closures_proposed']} proposed.  ATE RMSE: "
        f"**{pg['ate_vo_m']} m (VO) → {pg['ate_posegraph_m']} m "
        "(pose graph)**.",
        "",
        "Note: when VO drift is already small (~1% of trajectory "
        "length), the verified closures' own measurement error is "
        "comparable to the drift and the backend's ATE effect is "
        "neutral-to-noise; its benefit appears when drift dominates "
        "(asserted in CI: tests/test_kitti_synthetic.py::"
        "test_posegraph_loop_closure_end_to_end requires "
        "pose-graph ATE < VO ATE).",
        "",
        "## Scaling (virtual 8-device mesh)",
        "",
    ]
    for row in rec.get("scaling", []):
        lines.append(f"- `{json.dumps(row)}`")
    mh = rec.get("multihost_demo", {})
    lines += [
        "",
        f"2-process `jax.distributed` demo: "
        f"{'ok' if mh.get('ok') else 'FAILED'} "
        f"({'; '.join(mh.get('tail', []))})",
        "",
    ]
    return "\n".join(lines)


if __name__ == "__main__":
    main()
