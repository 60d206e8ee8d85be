"""Split the scanned eval harness's per-frame cost into tracker
(Harris+KLT on images) vs depth association (process_frame) on the
real TPU — the config-2 steady wall (~100 ms/frame) is far above
bench.py's tracker-less depth pipeline (~6 ms/frame), and this shows
which side owns the difference, stage by stage."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

W, H, F, LEVELS = 384, 128, 32, 4


def scan_time(label, step, carry, xs, n=F, reps=1):
    @jax.jit
    def many(carry, xs):
        return jax.lax.scan(step, carry, xs)

    def sync(out):
        # 4-byte host fetch: block_until_ready is not a real sync on
        # the remote tunneled backend, and fetching a large leaf would
        # pollute the number with tunnel transfer time.
        np.asarray(jnp.sum(jax.tree.leaves(out)[0]))

    sync(many(carry, xs))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = many(carry, xs)
        sync(out)
    dt = (time.perf_counter() - t0) / (n * reps)
    print(f"{label}: {dt * 1e3:.2f} ms/frame")
    return dt


def main():
    from mono_lidar_depth_tpu import DepthEstimatorConfig
    from mono_lidar_depth_tpu.tracker.frontend import (init_tracker,
                                                       track_frame)
    from mono_lidar_depth_tpu.tracker.harris import detect_features
    from mono_lidar_depth_tpu.tracker.klt import (build_pyramid,
                                                  track_features)

    print("backend:", jax.default_backend())
    cfg = DepthEstimatorConfig(
        max_points=16384, max_features=384, image_width=W, image_height=H,
        radiusSearch_count_min=1,
        ransac_num_hypotheses=256, ransac_subsample_points=1024)

    # Real sequence imagery — KLT iteration behavior (and therefore
    # while_loop trip counts) on noise images is not representative.
    import tempfile

    from mono_lidar_depth_tpu.io.kitti import KittiSequence
    from mono_lidar_depth_tpu.io.synthetic_dataset import (
        SyntheticSpec, generate_kitti_sequence)

    tmp = tempfile.mkdtemp(prefix="profsplit_")
    generate_kitti_sequence(
        tmp, "94", SyntheticSpec(frames=F + 1, image_width=W,
                                 image_height=H, focal=240.0,
                                 lidar_rows=20, lidar_cols=500,
                                 step=0.55))
    seq = KittiSequence(tmp, "94", image_width=W, image_height=H)
    imgs = jnp.asarray(np.stack([
        seq.image(f).astype(np.float32) / 255.0 for f in range(1, F + 1)]))
    ts0 = init_tracker(
        jnp.asarray(seq.image(0).astype(np.float32) / 255.0),
        cfg.max_features, levels=LEVELS)

    def step_track(ts, img):
        ts, out = track_frame(ts, img)
        return ts, (out.uv_new.sum(), out.valid.sum())

    scan_time("tracker full (track_frame)", step_track, ts0, imgs)

    # stages inside the tracker
    def step_pyr(acc, img):
        p = build_pyramid(img, LEVELS)
        return acc + sum(jnp.sum(l) for l in p), None

    scan_time("  build_pyramid", step_pyr, jnp.float32(0), imgs)

    def step_harris(acc, img):
        uv, ok = detect_features(img, cfg.max_features)
        return acc + jnp.sum(uv) + jnp.sum(ok), None

    scan_time("  harris detect", step_harris, jnp.float32(0), imgs)

    p0 = build_pyramid(imgs[0], LEVELS)
    uv0, ok0 = detect_features(imgs[0], cfg.max_features)

    def step_klt(carry, img):
        prev = carry
        cur = build_pyramid(img, LEVELS)
        uv, ok = track_features(prev, cur, uv0, ok0)
        return cur, (jnp.sum(uv), jnp.sum(ok))

    scan_time("  pyramid+klt", step_klt, p0, imgs)


if __name__ == "__main__":
    main()
