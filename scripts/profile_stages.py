"""Per-stage profile of the depth-association pipeline on the real TPU."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from mono_lidar_depth_tpu import (DepthEstimatorConfig, PinholeCamera, SE3,
                                  estimate_depths_from_frame,
                                  fit_ground_plane_ransac, rasterize_cloud)
from mono_lidar_depth_tpu.io.kitti import make_synthetic_scan, pad_cloud


def scan_time(label, step_fn, xs, n):
    @jax.jit
    def many(xs):
        def step(acc, x):
            out = step_fn(x)
            leaves = jax.tree.leaves(out)
            s = sum(jnp.sum(l).astype(jnp.float32) for l in leaves
                    if jnp.issubdtype(l.dtype, jnp.floating)
                    or jnp.issubdtype(l.dtype, jnp.integer))
            return acc + s, None
        acc, _ = jax.lax.scan(step, jnp.float32(0), xs)
        return acc

    # host fetch of the scalar checksum: block_until_ready is not a
    # real sync on the remote tunneled backend.
    np.asarray(many(xs))
    t0 = time.perf_counter()
    np.asarray(many(xs))
    dt = (time.perf_counter() - t0) / n
    print(f"{label}: {dt*1e3:.2f} ms")


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
    n = 16
    clouds, valids = [], []
    for _ in range(n):
        scan = make_synthetic_scan(rng, 120000)
        c, v = pad_cloud(scan, len(scan), cfg.max_points)
        clouds.append(c)
        valids.append(v)
    clouds = jnp.asarray(np.stack(clouds))
    valids = jnp.asarray(np.stack(valids))
    feats = jnp.asarray(rng.uniform(
        [1, 1], [1225, 369], (n, cfg.max_features, 2)).astype(np.float32))
    fvalid = jnp.ones((n, cfg.max_features), dtype=bool)
    keys = jax.random.split(jax.random.PRNGKey(0), n)

    def ransac(x):
        c, v, k = x
        return fit_ground_plane_ransac(
            c, v, k,
            distance_threshold=cfg.ransac_plane_distance_treshold,
            num_hypotheses=cfg.ransac_num_hypotheses,
            subsample=cfg.ransac_subsample_points,
            use_refinement=cfg.ransac_plane_use_refinement,
            refinement_threshold=cfg.ransac_plane_refinement_treshold)

    scan_time("ransac              ", ransac, (clouds, valids, keys), n)

    gps = jax.jit(jax.vmap(ransac))((clouds, valids, keys))

    def raster(x):
        c, v, gp = x
        return rasterize_cloud(cfg, cam, T, c, v, gp)

    scan_time("rasterize           ", raster, (clouds, valids, gps), n)

    frames = jax.jit(jax.vmap(raster))((clouds, valids, gps))

    def est(x):
        fr, uv, uvv, gp = x
        out = estimate_depths_from_frame(cfg, cam, T, fr, uv, uvv, gp)
        return (out.depths, out.codes, out.counters)

    scan_time("estimate_from_frame ", est, (frames, feats, fvalid, gps), n)


if __name__ == "__main__":
    main()
