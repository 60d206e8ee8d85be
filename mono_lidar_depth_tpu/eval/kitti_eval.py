"""KITTI odometry evaluation (BASELINE.json configs 2-4).

  config 2: per-sequence depth association — success-rate statistics
            against the reference's published numbers
            (22.5% of all features / 82.7% of lidar-covered,
            monolidar_fusion/Logs/log_depth_calc_stats.txt).
  config 3: full VO with lidar depth priors + sliding-window BA —
            ATE RMSE / RPE against ground-truth poses.
  config 4: pose-graph backend over the VO trajectory with
            proximity-proposed, feature-verified loop closures.

All functions accept a KittiSequence; scripts/run_kitti.py is the CLI.
"""

from __future__ import annotations

from typing import Iterable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..config import DepthEstimatorConfig
from ..core.geometry import SE3, PinholeCamera
from ..io.kitti import KittiSequence, pad_cloud
from ..obs.stats import DepthCalcStats, format_stats_report, success_rates
from ..tracker.frontend import init_tracker, track_frame
from ..tracks.pipeline import (FrameInput, TrackletDepthState, prime_state,
                               process_frame)
from ..vo.metrics import ate_rmse, rpe_stats
from ..vo.pipeline import OdometryConfig, OdometryState, odometry_step
from ..vo.pose import estimate_pose_gn
from ..vo.pose_graph import PoseGraph, optimize_pose_graph


def _frame_inputs(seq: KittiSequence, cfg: DepthEstimatorConfig,
                  max_frames: Optional[int] = None,
                  prime: Optional[list] = None,
                  pyramid_levels: int = 4,
                  use_semantics: bool = False):
    """Generator of (FrameInput, frame index) over a sequence, driving
    the internal tracker on the grayscale images.  Frame 0 initializes
    the tracker; if `prime` is a list, its padded cloud is appended to
    it so the caller can prime the tracklet state (see
    tracks.pipeline.prime_state).  With `use_semantics` the sequence's
    semantic label images ride along (the reference's 4-way sync path);
    missing semantics raise."""
    tracker_state = None
    prev_key = jax.random.PRNGKey(0)
    n = len(seq) if max_frames is None else min(len(seq), max_frames)
    scans = seq.scans(cfg.max_points)
    for f, (xyzi, count) in enumerate(scans):
        if f >= n:
            break
        cloud, cvalid = pad_cloud(xyzi, count, cfg.max_points)
        img = seq.image(f)
        if img is None:
            raise FileNotFoundError(
                f"sequence {seq.sequence} has no image_0 data")
        sem = None
        if use_semantics:
            sem = seq.semantic(f)
            if sem is None:
                raise FileNotFoundError(
                    f"sequence {seq.sequence} has no semantic_0 data "
                    f"(frame {f}) — semantic plane mode needs it")
            sem = jnp.asarray(sem.astype(np.int32))
        jimg = jnp.asarray(img.astype(np.float32) / 255.0)
        if tracker_state is None:
            tracker_state = init_tracker(jimg, cfg.max_features,
                                         levels=pyramid_levels)
            if prime is not None:
                prime.append((jnp.asarray(cloud), jnp.asarray(cvalid), sem))
            continue
        tracker_state, out = track_frame(tracker_state, jimg)
        prev_key, sub = jax.random.split(prev_key)
        stamp = float(seq.times[f]) if seq.times is not None else float(f)
        yield FrameInput(
            cloud=jnp.asarray(cloud), cloud_valid=jnp.asarray(cvalid),
            ids=out.ids, ids_valid=out.valid,
            uv_new=out.uv_new, uv_prev=out.uv_prev,
            stamp=jnp.asarray(stamp), rng=sub, semantic=sem), f


def eval_depth_sequence(seq: KittiSequence, cfg: DepthEstimatorConfig,
                        max_frames: Optional[int] = None,
                        max_tracks: int = 4096, max_length: int = 12,
                        verbose: bool = True,
                        plane_mode: str = "ransac") -> dict:
    """Config 2: depth-augmented tracklets over a sequence; returns the
    outcome statistics dict (success rates + counters).

    plane_mode: "ransac" (3-way-sync path) or "semantic" (4-way path —
    the ground plane comes from the sequence's semantic label images)."""
    if plane_mode not in ("ransac", "semantic"):
        raise ValueError(f"unknown plane_mode {plane_mode!r}")
    state = TrackletDepthState.create(cfg, max_tracks, max_length)
    cam = seq.calib.camera
    T = seq.calib.lidar_to_cam
    frames = 0
    prime: list = []
    for frame, f in _frame_inputs(seq, cfg, max_frames, prime,
                                  use_semantics=plane_mode == "semantic"):
        if prime:
            p_cloud, p_valid, p_sem = prime.pop()
            state = prime_state(cfg, cam, T, state, p_cloud, p_valid,
                                jax.random.PRNGKey(1234), semantic=p_sem)
        state, depths, codes = process_frame(cfg, cam, T, state, frame)
        frames += 1
        if verbose and frames % 50 == 0:
            rates = success_rates(np.asarray(state.counters))
            print(f"frame {f}: success(all) "
                  f"{100 * rates['success_rate_all']:.1f}% "
                  f"covered {100 * rates['success_rate_lidar_covered']:.1f}%",
                  flush=True)
    stats = DepthCalcStats.zeros()
    stats = stats._replace(accumulated=state.counters,
                           frames=jnp.int32(frames))
    out = success_rates(np.asarray(state.counters))
    out["frames"] = frames
    if verbose:
        print(format_stats_report(stats))
    return out


def eval_vo_sequence(seq: KittiSequence, cfg: DepthEstimatorConfig,
                     ocfg: OdometryConfig = OdometryConfig(),
                     max_frames: Optional[int] = None,
                     max_tracks: int = 2048, max_length: int = 12,
                     verbose: bool = True) -> dict:
    """Config 3: full VO + sliding-window BA; ATE/RPE vs ground truth."""
    cam = seq.calib.camera
    T = seq.calib.lidar_to_cam
    state = OdometryState.create(cfg, ocfg, max_tracks, max_length)
    poses = []
    frame_ids = []
    prime: list = []
    for frame, f in _frame_inputs(seq, cfg, max_frames, prime):
        if prime:
            p_cloud, p_valid, p_sem = prime.pop()
            state = state._replace(tracklets=prime_state(
                cfg, cam, T, state.tracklets, p_cloud, p_valid,
                jax.random.PRNGKey(1234), semantic=p_sem))
        state, R_cw, t_cw, diag = odometry_step(cfg, ocfg, cam, T, state,
                                                frame)
        R_cw = np.asarray(R_cw)
        t_cw = np.asarray(t_cw)
        Tw = np.eye(4)
        Tw[:3, :3] = R_cw.T
        Tw[:3, 3] = -R_cw.T @ t_cw
        poses.append(Tw)
        frame_ids.append(f)
        if verbose and len(poses) % 100 == 0:
            print(f"frame {f}: pos {np.round(Tw[:3, 3], 1)} "
                  f"tracks {int(np.asarray(diag)[0])}", flush=True)
    poses = np.stack(poses)
    out = {"frames": len(poses), "poses": poses, "frame_ids": frame_ids}
    if seq.gt_poses is not None:
        gt = seq.gt_poses[frame_ids]
        out["ate_rmse"] = ate_rmse(poses[:, :3, 3], gt[:, :3, 3])
        out["ate_rmse_scaled"] = ate_rmse(poses[:, :3, 3], gt[:, :3, 3],
                                          with_scale=True)
        out.update({f"rpe_{k}": v
                    for k, v in rpe_stats(poses, gt).items()})
        if verbose:
            print(f"ATE RMSE: {out['ate_rmse']:.3f} m "
                  f"(scale-aligned {out['ate_rmse_scaled']:.3f} m); "
                  f"RPE trans {out['rpe_trans_rmse']:.3f} m "
                  f"rot {out['rpe_rot_rmse_deg']:.3f} deg")
    return out


def propose_loop_closures(poses: np.ndarray, min_gap: int = 100,
                          radius: float = 10.0, stride: int = 5,
                          max_heading_deg: float = 45.0,
                          max_candidates: int = 50) -> list[tuple[int, int]]:
    """Loop-closure candidates over a trajectory.

    Accepts [F, 4, 4] poses (or [F, 3] positions — then no heading
    filter): pairs (i, j) with j - i >= min_gap, |p_i - p_j| < radius,
    and relative heading below `max_heading_deg` (KLT verification can
    only match similar viewpoints; opposite-direction passes are
    skipped rather than wasted on doomed verification)."""
    poses = np.asarray(poses)
    if poses.ndim == 3:
        positions = poses[:, :3, 3]
        rots = poses[:, :3, :3]
    else:
        positions = poses
        rots = None
    cands = []
    last_j = -10 * stride
    for j in range(0, len(positions), stride):
        best = None
        for i in range(0, j - min_gap, stride):
            d = np.linalg.norm(positions[i] - positions[j])
            if d >= radius or (best is not None and d >= best[0]):
                continue
            if rots is not None:
                rel = rots[i].T @ rots[j]
                ang = np.degrees(np.arccos(
                    np.clip((np.trace(rel) - 1) / 2, -1, 1)))
                if ang > max_heading_deg:
                    continue
            best = (d, i)
        if best is not None and j - last_j >= 4 * stride:
            cands.append((best[1], j))
            last_j = j
        if len(cands) >= max_candidates:
            break
    return cands


def run_pose_graph_backend(poses: np.ndarray,
                           closures: Iterable[tuple[int, int, np.ndarray,
                                                    np.ndarray]],
                           closure_weight: float = 20.0,
                           gn_iters: int = 10, cg_iters: int = 80
                           ) -> np.ndarray:
    """Config 4: optimize a trajectory with odometry-chain edges plus
    loop-closure edges.

    Args:
      poses: [F, 4, 4] world←cam VO poses.
      closures: iterable of (i, j, Z_R [3,3], Z_t [3]) relative
        measurements T_i⁻¹ T_j.

    Returns the optimized [F, 4, 4] poses.
    """
    F = len(poses)
    R = poses[:, :3, :3].astype(np.float32)
    t = poses[:, :3, 3].astype(np.float32)
    ei, ej, ZR, Zt, w = [], [], [], [], []
    for k in range(F - 1):
        ei.append(k)
        ej.append(k + 1)
        ZR.append(R[k].T @ R[k + 1])
        Zt.append(R[k].T @ (t[k + 1] - t[k]))
        w.append(1.0)
    for (i, j, zr, zt) in closures:
        ei.append(i)
        ej.append(j)
        ZR.append(np.asarray(zr, np.float32))
        Zt.append(np.asarray(zt, np.float32))
        w.append(closure_weight)
    g = PoseGraph(
        R=jnp.asarray(R), t=jnp.asarray(t),
        edge_i=jnp.asarray(np.array(ei, np.int32)),
        edge_j=jnp.asarray(np.array(ej, np.int32)),
        Z_R=jnp.asarray(np.stack(ZR)), Z_t=jnp.asarray(np.stack(Zt)),
        edge_weight=jnp.asarray(np.array(w, np.float32)),
        edge_valid=jnp.ones(len(ei), bool),
        fixed=jnp.asarray(np.arange(F) == 0))
    out = optimize_pose_graph(g, gn_iters=gn_iters, cg_iters=cg_iters)
    res = np.tile(np.eye(4, dtype=np.float64), (F, 1, 1))
    res[:, :3, :3] = np.asarray(out.R)
    res[:, :3, 3] = np.asarray(out.t)
    return res


def closure_constraint_from_frames(seq: KittiSequence,
                                   cfg: DepthEstimatorConfig,
                                   frame_i: int, frame_j: int,
                                   max_features: int = 512
                                   ) -> Optional[tuple[np.ndarray, np.ndarray]]:
    """Measure the relative pose T_i⁻¹ T_j for a closure candidate:
    detect features in frame i, KLT-track them directly into frame j,
    lift to 3D with frame i's lidar depths, Gauss-Newton the 3D→2D
    pose.  Returns (Z_R, Z_t) — the transform mapping j-frame camera
    points from i-frame camera points — or None if verification fails
    (too few inliers)."""
    from ..core.depth_estimator import estimate_depths
    from ..core.ransac import fit_ground_plane_ransac
    from ..tracker.harris import detect_features
    from ..tracker.klt import build_pyramid, track_features

    img_i = seq.image(frame_i)
    img_j = seq.image(frame_j)
    if img_i is None or img_j is None:
        return None
    ji = jnp.asarray(img_i.astype(np.float32) / 255.0)
    jj = jnp.asarray(img_j.astype(np.float32) / 255.0)
    uv_i, ok = detect_features(ji, max_features)
    pi = build_pyramid(ji, 4)
    pj = build_pyramid(jj, 4)
    uv_j, ok_t = track_features(pi, pj, uv_i, ok, fb_threshold=2.0)

    if frame_i >= len(seq.scan_paths):
        return None
    from ..io.kitti import read_velodyne

    xyzi, count = read_velodyne(seq.scan_paths[frame_i], cfg.max_points)
    cloud, cvalid = pad_cloud(xyzi, count, cfg.max_points)
    cam = seq.calib.camera
    gp = fit_ground_plane_ransac(
        jnp.asarray(cloud), jnp.asarray(cvalid), jax.random.PRNGKey(0),
        distance_threshold=cfg.ransac_plane_distance_treshold,
        num_hypotheses=cfg.ransac_num_hypotheses,
        subsample=cfg.ransac_subsample_points)
    pad = cfg.max_features - uv_i.shape[0]
    if pad > 0:
        uv_i = jnp.concatenate([uv_i, jnp.zeros((pad, 2))])
        ok_t = jnp.concatenate([ok_t, jnp.zeros(pad, bool)])
        uv_j = jnp.concatenate([uv_j, jnp.zeros((pad, 2))])
    est = estimate_depths(cfg, cam, seq.calib.lidar_to_cam,
                          jnp.asarray(cloud), jnp.asarray(cvalid),
                          uv_i[:cfg.max_features],
                          ok_t[:cfg.max_features], gp)
    d = est.depths
    usable = ok_t[:cfg.max_features] & (d > 0)
    rays = cam.viewing_rays(uv_i[:cfg.max_features])
    lm = rays / jnp.maximum(rays[:, 2:3], 1e-6) * d[:, None]
    pose = estimate_pose_gn(cam, lm, uv_j[:cfg.max_features], usable,
                            iters=15)
    if int(pose.num_inliers) < 25:
        return None
    # pose maps i-frame points to j-frame: x_j = R x_i + t == T_j←i.
    # The pose-graph edge wants Z = T_i⁻¹ T_j (i.e. j expressed in i):
    # T_i⁻¹ T_j = (T_j←i)⁻¹ in relative terms → invert.
    Rji = np.asarray(pose.rotation)
    tji = np.asarray(pose.translation)
    Z_R = Rji.T
    Z_t = -Rji.T @ tji
    return Z_R, Z_t
