"""TPU-backend regression tests: Pallas kernel bit-exactness, depth
TPU↔CPU agreement, and short-horizon VO backend parity.

(a) slice_windows Pallas kernel == XLA dynamic_slice fallback,
    bit-exact, across shape classes incl. KITTI-sized grids and the
    lane-tile edge cases of the pre-slice arithmetic
    (pallas_windows.py:77-82): sx = 0, sx = W-Kx, sx % 128 in
    {0, 1, 127}, W % 128 == 0 and != 0.
(b) full depth-estimation cascade: TPU and CPU backends agree on
    >= 99.9% of result codes, and agreeing successes match depth to
    < 5e-3 relative.
(c) 60-frame VO: TPU ATE within 2x CPU ATE (plus a small absolute
    floor) — the regression net for the round-2/3 divergence class
    (bf16 corruption of the GN/Schur solves).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def _xla_windows(stack, sy, sx, Ky, Kx):
    def one(sy_i, sx_i):
        C = stack.shape[0]
        return jax.lax.dynamic_slice(stack, (0, sy_i, sx_i), (C, Ky, Kx))

    return jax.vmap(one)(sy, sx)


@pytest.mark.parametrize("C,H,W,Ky,Kx", [
    (2, 128, 384, 9, 11),     # synthetic-eval-sized grid
    (2, 376, 1241, 9, 11),    # KITTI-sized grid (W % 128 != 0)
    (2, 64, 256, 7, 7),       # W % 128 == 0
    (3, 96, 512, 15, 21),     # 3 attribute planes, wide window
])
def test_slice_windows_bitexact(C, H, W, Ky, Kx):
    from mono_lidar_depth_tpu.core.pallas_windows import slice_windows_tpu

    rng = np.random.default_rng(0)
    stack = jnp.asarray(rng.normal(size=(C, H, W)).astype(np.float32))
    # random interior starts + forced edge cases for the lane-tile
    # pre-slice/roll arithmetic
    n_rand = 192
    sy = rng.integers(0, H - Ky + 1, n_rand).astype(np.int32)
    sx = rng.integers(0, W - Kx + 1, n_rand).astype(np.int32)
    edges_x, edges_y = [], []
    for base in (0, 128, 256, (W - Kx) // 128 * 128):
        for off in (0, 1, 127):
            x = base + off
            if 0 <= x <= W - Kx:
                edges_x.append(x)
                edges_y.append(int(rng.integers(0, H - Ky + 1)))
    edges_x += [0, W - Kx]
    edges_y += [0, H - Ky]
    sy = jnp.asarray(np.concatenate([sy, np.asarray(edges_y, np.int32)]))
    sx = jnp.asarray(np.concatenate([sx, np.asarray(edges_x, np.int32)]))

    got = np.asarray(slice_windows_tpu(stack, sy, sx, Ky, Kx))
    want = np.asarray(_xla_windows(stack, sy, sx, Ky, Kx))
    mismatches = np.sum(got != want)
    assert mismatches == 0, (
        f"{mismatches} element mismatches (shape {got.shape}); first bad "
        f"feature {np.argwhere(got != want)[:1]}")


def _depth_inputs(cfg):
    from mono_lidar_depth_tpu import PinholeCamera, SE3
    from mono_lidar_depth_tpu.io.kitti import make_synthetic_scan, pad_cloud

    rng = np.random.default_rng(7)
    scan = make_synthetic_scan(rng, cfg.max_points // 2)
    cloud, valid = pad_cloud(scan, len(scan), cfg.max_points)
    cam = PinholeCamera(width=cfg.image_width, height=cfg.image_height,
                        focal_length=240.0, cx=cfg.image_width / 2,
                        cy=cfg.image_height / 2)
    R_lc = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], np.float32)
    T = SE3(jnp.asarray(R_lc), jnp.zeros(3, jnp.float32))
    feats = rng.uniform(
        [1, 1], [cfg.image_width - 2, cfg.image_height - 2],
        (cfg.max_features, 2)).astype(np.float32)
    return cam, T, cloud, valid, feats


def test_depth_codes_tpu_vs_cpu():
    from mono_lidar_depth_tpu import DepthEstimatorConfig, estimate_depths
    from mono_lidar_depth_tpu.core.ransac import fit_ground_plane_ransac

    cfg = DepthEstimatorConfig(
        max_points=8192, max_features=1024,
        image_width=768, image_height=256,
        radiusSearch_count_min=1,
        ransac_num_hypotheses=256, ransac_subsample_points=1024)
    cam, T, cloud, valid, feats = _depth_inputs(cfg)

    def run():
        gp = fit_ground_plane_ransac(
            jnp.asarray(cloud), jnp.asarray(valid), jax.random.PRNGKey(3))
        out = estimate_depths(cfg, cam, T, jnp.asarray(cloud),
                              jnp.asarray(valid), jnp.asarray(feats),
                              jnp.ones(cfg.max_features, bool), gp)
        return np.asarray(out.depths), np.asarray(out.codes)

    d_tpu, c_tpu = run()
    with jax.default_device(jax.devices("cpu")[0]):
        d_cpu, c_cpu = run()

    agree = np.mean(c_tpu == c_cpu)
    assert agree >= 0.999, f"code agreement {agree:.4f} < 99.9%"
    both = (d_tpu > 0) & (d_cpu > 0)
    rel = np.abs(d_tpu[both] - d_cpu[both]) / np.abs(d_cpu[both])
    # Agreeing codes can still pick a different (equally valid)
    # spanning triangle on a razor-edge margin, giving ~1% depth
    # difference on O(1/100) features — bound the distribution, not
    # the single worst lane (measured: median 1.6e-6, p99 ~6e-3 from a
    # handful of marginal features).  The regression class this guards
    # (bf16 matmul corruption, r2) moved the MEDIAN to ~4e-3 and code
    # agreement to 80% — orders of magnitude outside these bounds.
    assert np.median(rel) < 1e-4, f"median depth rel err {np.median(rel):.2e}"
    assert np.percentile(rel, 95) < 1e-3, (
        f"p95 depth rel err {np.percentile(rel, 95):.2e}")
    assert np.mean(rel > 2e-2) <= 0.002, (
        f"{np.mean(rel > 2e-2):.4f} of features differ >2% in depth")


def test_vo_short_horizon_tpu_vs_cpu(tmp_path):
    from mono_lidar_depth_tpu import DepthEstimatorConfig
    from mono_lidar_depth_tpu.eval import eval_vo_sequence
    from mono_lidar_depth_tpu.io.kitti import KittiSequence
    from mono_lidar_depth_tpu.io.synthetic_dataset import (
        SyntheticSpec, generate_kitti_sequence)
    from mono_lidar_depth_tpu.vo.metrics import ate_rmse

    W, H = 384, 128
    generate_kitti_sequence(
        str(tmp_path), "97",
        SyntheticSpec(frames=60, image_width=W, image_height=H,
                      focal=240.0, lidar_rows=20, lidar_cols=500,
                      step=0.55, loop=True))
    seq = KittiSequence(str(tmp_path), "97", image_width=W, image_height=H)
    cfg = DepthEstimatorConfig(
        max_points=16384, max_features=384, image_width=W, image_height=H,
        radiusSearch_count_min=1,
        ransac_num_hypotheses=256, ransac_subsample_points=1024)

    vo_tpu = eval_vo_sequence(seq, cfg, max_tracks=384, max_length=8,
                              verbose=False)
    with jax.default_device(jax.devices("cpu")[0]):
        vo_cpu = eval_vo_sequence(seq, cfg, max_tracks=384, max_length=8,
                                  verbose=False)

    gt = seq.gt_poses[vo_tpu["frame_ids"]]
    ate_t = float(ate_rmse(vo_tpu["poses"][:, :3, 3], gt[:, :3, 3]))
    ate_c = float(ate_rmse(vo_cpu["poses"][:, :3, 3], gt[:, :3, 3]))
    assert np.isfinite(ate_t) and np.isfinite(ate_c)
    assert ate_c < 2.0, f"CPU VO regressed: ATE {ate_c:.3f} m on 60 frames"
    assert ate_t <= max(2.0 * ate_c, ate_c + 0.25), (
        f"TPU ATE {ate_t:.3f} m vs CPU {ate_c:.3f} m — backend divergence")


def test_fast_rasterization_tpu_matches_exact_envelope():
    """(d) fast_rasterization ON the chip: the single-scatter key path
    must land inside the same error envelope as on CPU — identical
    occupancy vs the exact TPU rasterization, decoded depth within one
    quantization step, and the end-to-end depth cascade's outcomes
    near-identical to the exact TPU run (the packed-int32 scatter-min
    and bit-shift decode are exactly the op class where a TPU backend
    could diverge from CPU semantics)."""
    from mono_lidar_depth_tpu import DepthEstimatorConfig, estimate_depths
    from mono_lidar_depth_tpu.core.projection import (_FAST_STEP,
                                                      build_frame_cloud)
    from mono_lidar_depth_tpu.core.ransac import fit_ground_plane_ransac

    cfg = DepthEstimatorConfig(
        max_points=8192, max_features=1024,
        image_width=768, image_height=256,
        radiusSearch_count_min=1,
        ransac_num_hypotheses=256, ransac_subsample_points=1024)
    cam, T, cloud, valid, feats = _depth_inputs(cfg)
    cloudj, validj = jnp.asarray(cloud), jnp.asarray(valid)

    exact = build_frame_cloud(cloudj, validj, T, cam,
                              cfg.image_height, cfg.image_width, "nearest")
    fast = build_frame_cloud(cloudj, validj, T, cam,
                             cfg.image_height, cfg.image_width, "nearest",
                             fast=True)
    ze, zf = np.asarray(exact.planes[0]), np.asarray(fast.planes[0])
    np.testing.assert_array_equal(zf != 0, ze != 0)
    occ = ze != 0
    assert np.abs(np.abs(zf[occ]) - np.abs(ze[occ])).max() \
        <= _FAST_STEP + 1e-5
    gi = np.asarray(fast.grid)[occ]
    assert (gi >= 0).all() and np.asarray(exact.visible)[gi].all()

    cfg_fast = cfg.replace(fast_rasterization=True)

    def run(c):
        gp = fit_ground_plane_ransac(cloudj, validj, jax.random.PRNGKey(3))
        out = estimate_depths(c, cam, T, cloudj, validj,
                              jnp.asarray(feats),
                              jnp.ones(c.max_features, bool), gp)
        return np.asarray(out.depths), np.asarray(out.codes)

    d_tpu, c_tpu = run(cfg_fast)
    with jax.default_device(jax.devices("cpu")[0]):
        d_cpu, c_cpu = run(cfg_fast)
    agree = np.mean(c_tpu == c_cpu)
    assert agree >= 0.999, f"fast-mode code agreement {agree:.4f}"
    both = (d_tpu > 0) & (d_cpu > 0)
    rel = np.abs(d_tpu[both] - d_cpu[both]) / np.abs(d_cpu[both])
    assert np.median(rel) < 1e-4, np.median(rel)
    # Quantized inputs make bin-boundary features 1-ulp sensitive: a
    # backend FP difference in u/v can flip a ~2 cm zq bin or a cell
    # assignment, moving a few features by one quantization step
    # (rel ~1e-3 at 20 m) — so the tail bound is wider than the exact
    # path's (measured p95 2.2e-3; the bf16-corruption class this
    # guards sat at ~1e-2 MEDIAN).
    assert np.percentile(rel, 95) < 5e-3, np.percentile(rel, 95)
