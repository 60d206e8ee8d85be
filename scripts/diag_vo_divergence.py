#!/usr/bin/env python
"""Localize TPU-vs-CPU VO divergence (VERDICT r2 item 1).

HISTORICAL NOTE: the divergence this tool was built to chase (TPU ATE
15.8 m vs CPU 2.1 m) was root-caused in r3 to bf16 cancellation in the
6x6 Schur complement and fixed (DESIGN.md "r3 root cause"); the
regression net lives in tests_tpu/test_tpu_parity.py.  The tool stays
because the methodology (tracker-stream substitution to separate
tracker- from geometry-induced divergence) is how any FUTURE
backend-parity gap gets localized.

Runs the synthetic-loop VO eval on one backend and dumps PER-FRAME
streams (tracker outputs, depth-association outputs, pose-GN diag,
poses) to an npz.  A second invocation with --frames-from reuses the
first run's TRACKER stream so the geometry stack (depth association +
pose GN + BA) runs on identical inputs — separating tracker-induced
from geometry-induced divergence.

  # 1. full CPU run (tracker + geometry on CPU)
  python scripts/diag_vo_divergence.py --platform cpu --out /tmp/cpu.npz
  # 2. full TPU run
  python scripts/diag_vo_divergence.py --out /tmp/tpu.npz
  # 3. TPU geometry on the CPU tracker stream
  python scripts/diag_vo_divergence.py --frames-from /tmp/cpu.npz \
      --out /tmp/tpu_fixed.npz
  # 4. compare
  python scripts/diag_vo_divergence.py --compare /tmp/cpu.npz /tmp/tpu.npz
"""

import argparse
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

W, H = 384, 128
SEQ_DIR = "/tmp/diag_seq"
SEQ = "98"


def make_cfg():
    from mono_lidar_depth_tpu import DepthEstimatorConfig
    return DepthEstimatorConfig(
        max_points=16384, max_features=384, image_width=W, image_height=H,
        radiusSearch_count_min=1,
        ransac_num_hypotheses=256, ransac_subsample_points=1024)


def ensure_sequence(frames: int):
    from mono_lidar_depth_tpu.io.synthetic_dataset import (
        SyntheticSpec, generate_kitti_sequence)
    marker = Path(SEQ_DIR) / f"done_{frames}"
    if not marker.exists():
        generate_kitti_sequence(
            SEQ_DIR, SEQ, SyntheticSpec(frames=frames, image_width=W,
                                        image_height=H, focal=240.0,
                                        lidar_rows=20, lidar_cols=500,
                                        step=0.55, loop=True))
        marker.write_text("ok")


def run(args):
    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from mono_lidar_depth_tpu.eval.kitti_eval import _frame_inputs
    from mono_lidar_depth_tpu.io.kitti import KittiSequence
    from mono_lidar_depth_tpu.tracks.pipeline import (FrameInput,
                                                      prime_state)
    from mono_lidar_depth_tpu.vo.pipeline import (OdometryConfig,
                                                  OdometryState,
                                                  odometry_step)
    from mono_lidar_depth_tpu.vo.metrics import ate_rmse

    ensure_sequence(args.frames)
    seq = KittiSequence(SEQ_DIR, SEQ, image_width=W, image_height=H)
    cfg = make_cfg()
    ocfg = OdometryConfig()
    cam = seq.calib.camera
    T = seq.calib.lidar_to_cam

    state = OdometryState.create(cfg, ocfg, 384, 8)

    rec = {k: [] for k in ("uv_new", "uv_prev", "ids", "ids_valid",
                           "depths", "codes", "diag", "t_cw", "R_cw",
                           "frame_ids")}

    if args.frames_from:
        src = np.load(args.frames_from)
        n_frames = src["uv_new"].shape[0]
        from mono_lidar_depth_tpu.io.kitti import pad_cloud

        def gen():
            import jax.random as jr
            key = jr.PRNGKey(0)
            scans = seq.scans(cfg.max_points)
            fi = 0
            for f, (xyzi, count) in enumerate(scans):
                cloud, cvalid = pad_cloud(xyzi, count, cfg.max_points)
                if f == 0:
                    # prime payload (mirrors _frame_inputs)
                    gen.prime = (jnp.asarray(cloud), jnp.asarray(cvalid))
                    continue
                if fi >= n_frames:
                    return
                key, sub = jr.split(key)
                stamp = float(seq.times[f]) if seq.times is not None \
                    else float(f)
                yield FrameInput(
                    cloud=jnp.asarray(cloud),
                    cloud_valid=jnp.asarray(cvalid),
                    ids=jnp.asarray(src["ids"][fi]),
                    ids_valid=jnp.asarray(src["ids_valid"][fi]),
                    uv_new=jnp.asarray(src["uv_new"][fi]),
                    uv_prev=jnp.asarray(src["uv_prev"][fi]),
                    stamp=jnp.asarray(stamp), rng=sub), f
                fi += 1
        frame_iter = gen()
        prime_payload = None
    else:
        prime_list = []
        frame_iter = _frame_inputs(seq, cfg, args.frames, prime_list)
        prime_payload = prime_list

    primed = False
    for frame, f in frame_iter:
        if not primed:
            if args.frames_from:
                p_cloud, p_valid = gen.prime
            else:
                p_cloud, p_valid, _ = prime_payload.pop()
            state = state._replace(tracklets=prime_state(
                cfg, cam, T, state.tracklets, p_cloud, p_valid,
                jax.random.PRNGKey(1234)))
            primed = True
        state, R_cw, t_cw, diag = odometry_step(cfg, ocfg, cam, T, state,
                                                frame)
        # depth stream as seen by this frame's update: newest-column
        # depths of the table (what the odometry actually consumed)
        rec["depths"].append(np.asarray(state.tracklets.table.depth[:, 0]))
        rec["codes"].append(np.asarray(state.tracklets.table.length))
        rec["uv_new"].append(np.asarray(frame.uv_new))
        rec["uv_prev"].append(np.asarray(frame.uv_prev))
        rec["ids"].append(np.asarray(frame.ids))
        rec["ids_valid"].append(np.asarray(frame.ids_valid))
        rec["diag"].append(np.asarray(diag))
        rec["t_cw"].append(np.asarray(t_cw))
        rec["R_cw"].append(np.asarray(R_cw))
        rec["frame_ids"].append(f)

    out = {k: np.stack(v) for k, v in rec.items()}
    out["backend"] = np.array(jax.default_backend())
    # world positions
    Rs = out["R_cw"]
    ts = out["t_cw"]
    pos = -np.einsum("fij,fj->fi", Rs.transpose(0, 2, 1), ts)
    out["pos"] = pos
    if seq.gt_poses is not None:
        gt = seq.gt_poses[out["frame_ids"]]
        out["gt_pos"] = gt[:, :3, 3]
        print(f"ATE RMSE: {ate_rmse(pos, gt[:, :3, 3]):.3f} m")
    np.savez_compressed(args.out, **out)
    print(f"wrote {args.out} ({len(out['t_cw'])} frames, "
          f"backend {jax.default_backend()})")


def compare(path_a, path_b):
    a = np.load(path_a)
    b = np.load(path_b)
    n = min(a["pos"].shape[0], b["pos"].shape[0])
    print(f"{path_a} [{a['backend']}] vs {path_b} [{b['backend']}], "
          f"{n} frames")
    # tracker stream agreement
    duv = np.abs(a["uv_new"][:n] - b["uv_new"][:n]).max(axis=(1, 2))
    same_valid = (a["ids_valid"][:n] == b["ids_valid"][:n]).all(axis=1)
    # depth stream agreement (valid depths only)
    da, db = a["depths"][:n], b["depths"][:n]
    both = (da > 0) & (db > 0)
    rel = np.abs(da - db) / np.maximum(np.abs(da), 1e-6)
    drel = np.where(both, rel, 0.0).max(axis=1)
    only = ((da > 0) ^ (db > 0)).sum(axis=1)
    # pose agreement
    dpos = np.linalg.norm(a["pos"][:n] - b["pos"][:n], axis=1)
    # per-frame relative-motion difference: ||(Ra_k Ra_{k-1}^T) vs b||
    din = np.abs(a["diag"][:n, 1] - b["diag"][:n, 1])

    hdr = (" f | max|duv| vmatch | maxreldep #onlyone | d_inl | |dpos|")
    print(hdr)
    flagged = 0
    for f in range(n):
        flag = (duv[f] > 0.5 or not same_valid[f] or drel[f] > 0.01
                or only[f] > 8 or din[f] > 10 or dpos[f] > 0.5)
        if flag or f % max(1, n // 20) == 0:
            print(f"{f:3d} | {duv[f]:8.3f} {str(same_valid[f]):6s} | "
                  f"{drel[f]:9.4f} {only[f]:8d} | {din[f]:5.0f} | "
                  f"{dpos[f]:7.3f}")
            flagged += flag
        if flagged > 60:
            print("... (truncated)")
            break
    print(f"final |dpos|: {dpos[-1]:.3f} m; max: {dpos.max():.3f} m "
          f"at frame {dpos.argmax()}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--frames", type=int, default=220)
    ap.add_argument("--out", default="/tmp/diag_run.npz")
    ap.add_argument("--frames-from", default=None,
                    help="npz from a previous run; reuse its tracker "
                         "stream instead of running the tracker")
    ap.add_argument("--compare", nargs=2, default=None)
    args = ap.parse_args()
    if args.compare:
        compare(*args.compare)
    else:
        run(args)


if __name__ == "__main__":
    main()
