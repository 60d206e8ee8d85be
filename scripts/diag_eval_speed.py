#!/usr/bin/env python
"""Instrument eval_depth_sequence wall time (VERDICT r2 item 4).

PARITY_r2 recorded config-2 ransac mode at 550 s / 220 frames (~0.4
fps) while bench.py measures the same pipeline at 162 fps.  This
script times each frame of the eval loop, split by stage (tracker /
depth step / host sync), to find where the wall time goes.

Usage: python scripts/diag_eval_speed.py [--frames 60] [--mode ransac]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

W, H = 384, 128
SEQ_DIR = "/tmp/diag_seq"
SEQ = "98"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--mode", default="ransac",
                    choices=["ransac", "semantic", "region_growing"])
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from scripts.diag_vo_divergence import ensure_sequence, make_cfg
    from mono_lidar_depth_tpu.eval.kitti_eval import _frame_inputs
    from mono_lidar_depth_tpu.io.kitti import KittiSequence
    from mono_lidar_depth_tpu.tracks.pipeline import (TrackletDepthState,
                                                      prime_state,
                                                      process_frame)

    ensure_sequence(220)
    seq = KittiSequence(SEQ_DIR, SEQ, image_width=W, image_height=H)
    cfg = make_cfg()
    if args.mode == "region_growing":
        cfg = cfg.replace(do_use_depth_segmentation=True)
    use_sem = args.mode == "semantic"

    cam = seq.calib.camera
    T = seq.calib.lidar_to_cam
    state = TrackletDepthState.create(cfg, 512, 8)
    prime: list = []
    times = []
    t_wall0 = time.perf_counter()
    gen_t0 = time.perf_counter()
    for frame, f in _frame_inputs(seq, cfg, args.frames, prime,
                                  use_semantics=use_sem):
        t_gen = time.perf_counter() - gen_t0  # io + tracker dispatch
        if prime:
            p_cloud, p_valid, p_sem = prime.pop()
            state = prime_state(cfg, cam, T, state, p_cloud, p_valid,
                                jax.random.PRNGKey(1234), semantic=p_sem)
        t0 = time.perf_counter()
        state, depths, codes = process_frame(cfg, cam, T, state, frame)
        t_step = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.block_until_ready(depths)
        t_sync = time.perf_counter() - t0
        times.append((f, t_gen, t_step, t_sync))
        gen_t0 = time.perf_counter()
    wall = time.perf_counter() - t_wall0
    arr = np.array([t[1:] for t in times])
    print(f"mode={args.mode} frames={len(times)} wall={wall:.1f}s "
          f"backend={jax.default_backend()}")
    print("stage        first   p50     p90     max     total")
    for i, name in enumerate(["io+tracker", "depth-step", "sync"]):
        col = arr[:, i]
        print(f"{name:12s} {col[0]:6.2f} {np.median(col):7.3f} "
              f"{np.percentile(col, 90):7.3f} {col.max():7.3f} "
              f"{col.sum():8.2f}")
    # slowest 5 frames
    tot = arr.sum(axis=1)
    worst = np.argsort(tot)[-5:][::-1]
    print("slowest frames:", [(times[i][0], round(float(tot[i]), 2))
                              for i in worst])


if __name__ == "__main__":
    main()
