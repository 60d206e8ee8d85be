"""End-to-end VO pipeline test on a synthetic metric world."""

import numpy as np
import jax
import jax.numpy as jnp

from mono_lidar_depth_tpu import DepthEstimatorConfig, PinholeCamera, SE3
from mono_lidar_depth_tpu.tracks.pipeline import FrameInput
from mono_lidar_depth_tpu.vo.lie import so3_exp
from mono_lidar_depth_tpu.vo.metrics import ate_rmse
from mono_lidar_depth_tpu.vo.pipeline import OdometryConfig, run_odometry

M = 256  # track lanes
P = 8192  # padded cloud

CFG = DepthEstimatorConfig(
    max_points=P, max_features=M, image_width=640, image_height=480,
    ransac_num_hypotheses=256, ransac_subsample_points=2048,
    do_use_ransac_plane=True)
CAM = PinholeCamera(width=640, height=480, focal_length=500.0,
                    cx=320.0, cy=240.0)
# lidar frame: x forward, y left, z up; camera: z forward, x right, y down
R_LC = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], dtype=np.float32)
T_LC = SE3(jnp.asarray(R_LC), jnp.zeros(3, dtype=jnp.float32))


def _world(rng):
    """World points in WORLD frame (= frame-0 camera frame): ground
    plane (y=1.5) + vertical building facades flanking the road —
    locally planar surfaces, as the depth estimator requires."""
    n_g = 3000
    gx = rng.uniform(-12, 12, n_g)
    gz = rng.uniform(2, 80, n_g)
    ground = np.stack([gx, np.full(n_g, 1.5) + 0.01 * rng.normal(size=n_g),
                       gz], 1)
    walls = []
    for side in (-8.0, 8.0):  # side facades along the road
        n_w = 1500
        wz = rng.uniform(2, 80, n_w)
        wy = rng.uniform(-4, 1.3, n_w)
        walls.append(np.stack(
            [np.full(n_w, side) + 0.02 * rng.normal(size=n_w), wy, wz], 1))
    # frontal facade far ahead
    n_f = 1000
    fx = rng.uniform(-8, 8, n_f)
    fy = rng.uniform(-4, 1.3, n_f)
    walls.append(np.stack(
        [fx, fy, np.full(n_f, 85.0) + 0.02 * rng.normal(size=n_f)], 1))
    return np.concatenate([ground] + walls).astype(np.float32)


def _trajectory(F):
    """Camera poses (cam-from-world R, t): forward 1 m/frame + mild yaw."""
    Rs, ts = [], []
    R_wc = np.eye(3, dtype=np.float32)  # world←cam rotation
    c = np.zeros(3, dtype=np.float32)  # camera center in world
    for f in range(F):
        Rs.append(R_wc.copy())
        ts.append(c.copy())
        yaw = 0.01
        dR = np.asarray(so3_exp(jnp.asarray([0.0, yaw, 0.0],
                                            dtype=jnp.float32)))
        R_wc = R_wc @ dR
        c = c + R_wc @ np.array([0, 0, 1.0], dtype=np.float32)
    return Rs, ts  # world←cam rotation, camera center


def _make_frames(rng, F=12):
    world = _world(rng)
    Rs, ts = _trajectory(F)
    frames = []
    gt_centers = []
    # persistent landmark subset for feature tracks
    lm_idx = rng.choice(len(world), M, replace=False)
    lm_world = world[lm_idx]
    prev_uv = None
    key = jax.random.PRNGKey(0)
    for f in range(F):
        R_wc, c = Rs[f], ts[f]
        gt_centers.append(c)
        R_cw = R_wc.T
        t_cw = -R_cw @ c
        p_cam = world @ R_cw.T + t_cw
        # cloud in lidar frame
        p_lid = p_cam @ np.linalg.inv(R_LC).T
        cloud = np.zeros((P, 3), np.float32)
        n = min(len(p_lid), P)
        cloud[:n] = p_lid[:n]
        cvalid = np.zeros(P, bool)
        cvalid[:n] = True
        # feature tracks: project persistent landmarks
        l_cam = lm_world @ R_cw.T + t_cw
        z = l_cam[:, 2]
        uv = np.stack([500 * l_cam[:, 0] / np.maximum(z, 1e-3) + 320,
                       500 * l_cam[:, 1] / np.maximum(z, 1e-3) + 240], 1)
        uv += rng.normal(size=uv.shape) * 0.2  # tracking noise
        vis = ((z > 1) & (uv[:, 0] > 2) & (uv[:, 0] < 638)
               & (uv[:, 1] > 2) & (uv[:, 1] < 478))
        if prev_uv is None:
            prev_uv = uv.copy()
            prev_vis = vis.copy()
            continue  # first frame only initializes the "tracker"
        ids = np.arange(M, dtype=np.int32)
        valid = vis & prev_vis
        key, sub = jax.random.split(key)
        frames.append(FrameInput(
            cloud=jnp.asarray(cloud), cloud_valid=jnp.asarray(cvalid),
            ids=jnp.asarray(ids), ids_valid=jnp.asarray(valid),
            uv_new=jnp.asarray(uv.astype(np.float32)),
            uv_prev=jnp.asarray(prev_uv.astype(np.float32)),
            stamp=jnp.asarray(float(f)), rng=sub))
        prev_uv = uv.copy()
        prev_vis = vis.copy()
    return frames, np.stack(gt_centers[1:])  # gt for processed frames


def test_synthetic_odometry_metric():
    rng = np.random.default_rng(7)
    frames, gt_centers = _make_frames(rng, F=12)
    ocfg = OdometryConfig(ba_window=5, ba_iters=5)
    poses, diags = run_odometry(CFG, ocfg, CAM, T_LC, frames,
                                max_tracks=M, max_length=8)
    est_centers = poses[:, :3, 3]
    # The very first processed frame has no previous-frame depths (the
    # cloud cache starts empty) so its own motion is unobservable; the
    # window BA re-distributes that missed motion over the next few
    # frames.  Compare after this initialization transient (3 frames),
    # relative to the first compared frame.
    s = 3
    est = est_centers[s:] - est_centers[s]
    gt = gt_centers[s:] - gt_centers[s]
    # metric scale: total path length within 3%
    est_len = np.linalg.norm(np.diff(est, axis=0), axis=1).sum()
    gt_len = np.linalg.norm(np.diff(gt, axis=0), axis=1).sum()
    assert abs(est_len - gt_len) / gt_len < 0.03, (est_len, gt_len)
    # ATE without scale alignment must be small (metric odometry)
    rmse = ate_rmse(est, gt, align=True, with_scale=False)
    assert rmse < 0.10, rmse
    # motion tracks were available every frame after the first
    assert all(d[0] >= 12 for d in diags[1:])
