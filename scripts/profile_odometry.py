"""Break down odometry_step cost on the real TPU: process_frame vs
pose GN vs BA. Same in-program scan protocol as bench.py."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from mono_lidar_depth_tpu import DepthEstimatorConfig, PinholeCamera, SE3
from mono_lidar_depth_tpu.io.kitti import make_synthetic_scan, pad_cloud
from mono_lidar_depth_tpu.tracks.pipeline import FrameInput, process_frame
from mono_lidar_depth_tpu.vo.ba import BAProblem, run_ba
from mono_lidar_depth_tpu.vo.pipeline import (OdometryConfig, OdometryState,
                                              odometry_step)
from mono_lidar_depth_tpu.vo.pose import estimate_pose_gn


def timeit(label, jitted, *args, n=24):
    def sync(out):
        # 4-byte host fetch: block_until_ready is not a real sync on
        # the remote tunneled backend (and fetching a large leaf would
        # add tunnel transfer time to the measurement).
        np.asarray(jnp.sum(jax.tree.leaves(out)[0]))

    sync(jitted(*args))
    t0 = time.perf_counter()
    sync(jitted(*args))
    dt = (time.perf_counter() - t0) / n
    print(f"{label}: {dt*1e3:.2f} ms/frame")


def main():
    cfg = DepthEstimatorConfig.from_yaml(
        "/root/reference/monolidar_fusion/parameters.yaml")
    cfg = cfg.replace(do_use_depth_segmentation=False)
    cam = PinholeCamera(width=1226, height=370, focal_length=707.0,
                        cx=601.8, cy=183.1)
    R_lc = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], dtype=np.float32)
    T = SE3(jnp.asarray(R_lc),
            jnp.asarray(np.array([0.0, -0.08, 0.27], np.float32)))
    rng = np.random.default_rng(0)
    n_frames = 24
    M = cfg.max_features
    clouds, valids = [], []
    for _ in range(n_frames):
        scan = make_synthetic_scan(rng, 120000)
        c, v = pad_cloud(scan, len(scan), cfg.max_points)
        clouds.append(c)
        valids.append(v)
    clouds = jnp.asarray(np.stack(clouds))
    valids = jnp.asarray(np.stack(valids))
    base_uv = rng.uniform([8, 8], [1218, 362], (M, 2))
    drift = rng.normal(0.0, 1.5, (n_frames, M, 2))
    uv_new = np.clip(base_uv[None] + np.cumsum(drift, axis=0),
                     [1, 1], [1225, 369]).astype(np.float32)
    uv_prev = np.concatenate([uv_new[:1], uv_new[:-1]], axis=0)
    frames = FrameInput(
        cloud=clouds, cloud_valid=valids,
        ids=jnp.broadcast_to(jnp.arange(M, dtype=jnp.int32), (n_frames, M)),
        ids_valid=jnp.ones((n_frames, M), dtype=bool),
        uv_new=jnp.asarray(uv_new), uv_prev=jnp.asarray(uv_prev),
        stamp=jnp.arange(n_frames, dtype=jnp.float32) * 0.1,
        rng=jax.random.split(jax.random.PRNGKey(0), n_frames))

    ocfg = OdometryConfig()
    state0 = OdometryState.create(cfg, ocfg, max_tracks=M, max_length=12)

    # full odometry
    @jax.jit
    def run_full(state):
        def step(carry, frame):
            s, R, t, d = odometry_step(cfg, ocfg, cam, T, carry, frame)
            return s, (R, t, d)
        return jax.lax.scan(step, state, frames)

    timeit("odometry_step (full)   ", run_full, state0)

    # process_frame only
    @jax.jit
    def run_pf(state):
        def step(carry, frame):
            s, depths, codes = process_frame(cfg, cam, T, carry, frame)
            return s, (depths, codes)
        return jax.lax.scan(step, state.tracklets, frames)

    timeit("process_frame (2x est) ", run_pf, state0)

    # pose GN alone: synthetic landmark set
    lm = jnp.asarray(rng.uniform([-20, -5, 5], [20, 5, 60], (M, 3)).astype(np.float32))
    uv_obs = jnp.asarray(uv_new)
    usable = jnp.ones((n_frames, M), bool)

    @jax.jit
    def run_gn(acc):
        def step(carry, inp):
            uv, us = inp
            est = estimate_pose_gn(cam, lm, uv, us,
                                   R_init=jnp.eye(3), t_init=jnp.zeros(3))
            return carry + est.translation.sum(), (est.rotation,)
        return jax.lax.scan(step, acc, (uv_obs, usable))

    timeit("pose GN alone          ", run_gn, jnp.float32(0))

    # BA alone
    W = ocfg.ba_window
    obs_uv = jnp.asarray(np.stack([uv_new[k:k+W] for k in range(n_frames - W)])
                         ).transpose(0, 1, 2, 3)  # [F, W, M, 2]
    nF = obs_uv.shape[0]
    eyeW = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (W, 3, 3))

    @jax.jit
    def run_ba_scan(acc):
        def step(carry, ouv):
            pb = BAProblem(
                R=eyeW, t=jnp.zeros((W, 3), jnp.float32) + carry * 0,
                landmarks=lm,
                obs_uv=ouv, obs_mask=jnp.ones((W, M), bool),
                depth_prior=jnp.full((W, M), 12.0), depth_mask=jnp.ones((W, M), bool),
                fixed=jnp.arange(W) == W - 1,
                lm_valid=jnp.ones((M,), bool))
            res = run_ba(cam, pb, iters=ocfg.ba_iters,
                         depth_weight=ocfg.depth_weight)
            return carry + res.problem.t.sum(), None
        return jax.lax.scan(step, acc, obs_uv)

    timeit("window BA alone        ", run_ba_scan, jnp.float32(0), n=nF)


if __name__ == "__main__":
    main()
