"""Profile the full per-frame depth pipeline on the real TPU.

Honest protocol: `inner` sequential frames inside ONE device program
(lax.scan, every frame's outputs folded into the carry checksum), so
per-dispatch round-trip (~25 ms on the tunneled backend) and deferred
dispatches cannot distort the number.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from mono_lidar_depth_tpu import (DepthEstimatorConfig, PinholeCamera, SE3,
                                  estimate_depths, fit_ground_plane_ransac)
from mono_lidar_depth_tpu.io.kitti import make_synthetic_scan, pad_cloud


def main():
    cfg = DepthEstimatorConfig.from_yaml(
        "/root/reference/monolidar_fusion/parameters.yaml")
    cfg = cfg.replace(do_use_depth_segmentation=False)
    cam = PinholeCamera(width=1226, height=370, focal_length=707.0,
                        cx=601.8, cy=183.1)
    R_lc = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], dtype=np.float32)
    t_lc = np.array([0.0, -0.08, 0.27], dtype=np.float32)
    T = SE3(jnp.asarray(R_lc), jnp.asarray(t_lc))

    rng = np.random.default_rng(0)
    n_frames = 8
    clouds, valids = [], []
    for _ in range(n_frames):
        scan = make_synthetic_scan(rng, 120000)
        c, v = pad_cloud(scan, len(scan), cfg.max_points)
        clouds.append(c)
        valids.append(v)
    clouds = jnp.asarray(np.stack(clouds))
    valids = jnp.asarray(np.stack(valids))
    feats = jnp.asarray(rng.uniform(
        [1, 1], [1225, 369],
        (n_frames, cfg.max_features, 2)).astype(np.float32))
    fvalid = jnp.ones((n_frames, cfg.max_features), dtype=bool)
    keys = jax.random.split(jax.random.PRNGKey(0), n_frames)

    def frame_step(cloud, cvalid, uv, uvv, key):
        gp = fit_ground_plane_ransac(
            cloud, cvalid, key,
            distance_threshold=cfg.ransac_plane_distance_treshold,
            num_hypotheses=cfg.ransac_num_hypotheses,
            subsample=cfg.ransac_subsample_points,
            use_refinement=cfg.ransac_plane_use_refinement,
            refinement_threshold=cfg.ransac_plane_refinement_treshold)
        return estimate_depths(cfg, cam, T, cloud, cvalid, uv, uvv, gp)

    @jax.jit
    def many(clouds, valids, feats, fvalid, keys, reps: int = 4):
        def step(acc, inp):
            c, v, f, fv, k = inp
            out = frame_step(c, v, f, fv, k)
            return (acc + jnp.sum(out.depths) +
                    jnp.sum(out.counters).astype(jnp.float32)), None
        acc = jnp.float32(0)
        for _ in range(reps):
            acc, _ = jax.lax.scan(step, acc, (clouds, valids, feats, fvalid, keys))
        return acc

    # host fetch of the scalar checksum: block_until_ready is not a
    # real sync on the remote tunneled backend.
    np.asarray(many(clouds, valids, feats, fvalid, keys))
    t0 = time.perf_counter()
    np.asarray(many(clouds, valids, feats, fvalid, keys))
    dt = time.perf_counter() - t0
    n = n_frames * 4
    print(f"full frame: {dt/n*1e3:.3f} ms  -> {n/dt:.1f} frames/s")


if __name__ == "__main__":
    main()
