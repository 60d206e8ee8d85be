"""Scan-row segmentation + region growing tests.

Fixture style mirrors the reference test `LidarSegmenter.test1`
(test_monolidar_fusion.cpp:173-275): a hand-built planar grid cloud,
row structure asserted, region growing from the image center.
"""

import numpy as np
import jax.numpy as jnp

from mono_lidar_depth_tpu import DepthEstimatorConfig, PinholeCamera, SE3
from mono_lidar_depth_tpu.core.projection import build_frame_cloud
from mono_lidar_depth_tpu.core.row_segmentation import (
    grow_regions, segment_rows)
from mono_lidar_depth_tpu.core.result_types import DepthResultType as R

H, W = 384, 512
CAM = PinholeCamera(width=W, height=H, focal_length=600.0,
                    cx=W / 2, cy=H / 2)


def _grid_cloud(z=20.0, nx=40, ny=12, pad=4096):
    """Scan-ordered planar grid: ny rows, each row sweeping x left→right
    in image space (x increasing), with a big x jump between rows."""
    pts = []
    for iy in range(ny):
        for ix in range(nx):
            # camera frame: x sweeps DECREASING within a row (Velodyne
            # azimuth direction — the reference starts a new row on an
            # x INCREASE of > 50 px, HelperLidarRowSegmentation.cpp:30)
            x = (0.5 - ix / (nx - 1)) * 12.0
            y = (iy / (ny - 1) - 0.5) * 6.0
            pts.append((x, y, z))
    pts = np.asarray(pts, dtype=np.float32)
    cloud = np.zeros((pad, 3), np.float32)
    cloud[:len(pts)] = pts
    valid = np.zeros(pad, bool)
    valid[:len(pts)] = True
    return jnp.asarray(cloud), jnp.asarray(valid), len(pts)


def _frame(cloud, valid):
    return build_frame_cloud(cloud, valid, SE3.identity(), CAM, H, W)


def test_segment_rows_structure():
    cloud, valid, n = _grid_cloud()
    frame = _frame(cloud, valid)
    rows = segment_rows(frame)
    assert int(rows.num_rows) == 12
    row_len = np.asarray(rows.row_len)
    assert (row_len[:12] == 40).all()
    assert (row_len[12:] == 0).all()
    # row ids are 0..11, 40 points each, columns 0..39 in scan order
    rid = np.asarray(rows.row_id)[:n]
    cid = np.asarray(rows.col_id)[:n]
    assert (rid == np.repeat(np.arange(12), 40)).all()
    assert (cid == np.tile(np.arange(40), 12)).all()


def test_segment_rows_respects_visibility():
    cloud, valid, n = _grid_cloud()
    # poke some points behind the camera: they must vanish from rows
    cloud = cloud.at[5, 2].set(-5.0)
    frame = _frame(cloud, valid)
    rows = segment_rows(frame)
    assert int(jnp.sum(rows.comp_valid)) == n - 1


def test_grow_region_on_plane():
    cloud, valid, n = _grid_cloud()
    frame = _frame(cloud, valid)
    rows = segment_rows(frame)
    # seed: the grid point nearest the image center (raw index)
    uv = np.asarray(frame.uv)[:n]
    center = np.array([W / 2, H / 2])
    seed = int(np.argmin(((uv - center) ** 2).sum(1)))
    out = grow_regions(
        rows, jnp.asarray([seed]), jnp.asarray([True]),
        jnp.asarray([[W / 2.0, H / 2.0]], dtype=jnp.float32),
        max_pointcount=8, window=16)
    assert int(out.status[0]) == 1
    m = np.asarray(out.mask[0])
    assert m.sum() == 8  # capped at max_pointcount
    # grown points span exactly two rows
    grown_raw = np.asarray(out.raw_indices[0])[m]
    grown_rows = set((grown_raw // 40).tolist())
    assert len(grown_rows) == 2


def test_grow_region_depth_discontinuity_stops():
    # two rows; the seed row has a depth jump mid-row: growth must stop
    # at the discontinuity.
    pts = []
    for iy in range(2):
        for ix in range(40):
            x = (0.5 - ix / 39) * 12.0
            y = -0.5 + iy * 1.0
            z = 20.0 if ix < 20 else 40.0  # jump at ix = 20
            # keep image-projection monotonic in x despite the z jump
            pts.append((x * z / 20.0, y * z / 20.0, z))
    pts = np.asarray(pts, dtype=np.float32)
    cloud = np.zeros((4096, 3), np.float32)
    cloud[:len(pts)] = pts
    valid = np.zeros(4096, bool)
    valid[:len(pts)] = True
    frame = _frame(jnp.asarray(cloud), jnp.asarray(valid))
    rows = segment_rows(frame)
    # seed on the near surface, close to the jump (ix = 18, row 0)
    seed = 18
    feat = np.asarray(frame.uv)[seed]
    out = grow_regions(
        rows, jnp.asarray([seed]), jnp.asarray([True]),
        jnp.asarray([feat]), max_pointcount=-1, window=16)
    m = np.asarray(out.mask[0])
    raw = np.asarray(out.raw_indices[0])[m]
    # nothing from the far surface (raw index >= 20 within row 0)
    row0 = raw[raw < 40]
    assert (row0 < 20).all()
    assert int(out.status[0]) == 1


def test_no_adjacent_row():
    # single-row cloud → region growing must fail with -1
    pts = np.asarray([[(0.5 - ix / 39) * 12.0, 0.0, 20.0]
                      for ix in range(40)], dtype=np.float32)
    cloud = np.zeros((4096, 3), np.float32)
    cloud[:len(pts)] = pts
    valid = np.zeros(4096, bool)
    valid[:len(pts)] = True
    frame = _frame(jnp.asarray(cloud), jnp.asarray(valid))
    rows = segment_rows(frame)
    out = grow_regions(rows, jnp.asarray([20]), jnp.asarray([True]),
                       jnp.asarray([[W / 2.0, H / 2.0]], dtype=jnp.float32))
    assert int(out.status[0]) == -1


def test_invalid_seed():
    cloud, valid, n = _grid_cloud()
    frame = _frame(cloud, valid)
    rows = segment_rows(frame)
    out = grow_regions(rows, jnp.asarray([0]), jnp.asarray([False]),
                       jnp.asarray([[10.0, 10.0]], dtype=jnp.float32))
    assert int(out.status[0]) == -4


def test_estimator_region_growing_integration():
    from mono_lidar_depth_tpu import estimate_depths

    cfg = DepthEstimatorConfig(
        max_points=4096, max_features=8, image_width=W, image_height=H,
        do_use_ransac_plane=False, do_use_depth_segmentation=True,
        radiusSearch_count_min=1,  # canonical parameters.yaml value
        ransac_num_hypotheses=64, ransac_subsample_points=256)
    cloud, valid, n = _grid_cloud(nx=80, ny=24)
    feats = np.zeros((8, 2), np.float32)
    feats[0] = [W / 2, H / 2]
    feats[1] = [W / 2 + 30, H / 2 - 20]
    fvalid = np.zeros(8, bool)
    fvalid[:2] = True
    out = estimate_depths(cfg, CAM, SE3.identity(), cloud, valid,
                          jnp.asarray(feats), jnp.asarray(fvalid), None)
    codes = np.asarray(out.codes)[:2]
    depths = np.asarray(out.depths)[:2]
    assert (codes == R.SuccessRegionGrowing).all(), codes
    np.testing.assert_allclose(depths, 20.0, atol=0.1)
