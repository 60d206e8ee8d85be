"""Config system tests, including loading the reference parameters.yaml."""

import os

import pytest

from mono_lidar_depth_tpu.config import DepthEstimatorConfig

REF_YAML = "/root/reference/monolidar_fusion/parameters.yaml"


def test_defaults_valid():
    cfg = DepthEstimatorConfig()
    assert cfg.histogram_bins > 0
    assert cfg.primary_window[0] >= cfg.pixelarea_search_height
    assert cfg.road_window[1] > cfg.primary_window[1]


def test_window_cells():
    cfg = DepthEstimatorConfig(pixelarea_search_witdh=6, pixelarea_search_height=9)
    # half extents 3.0 / 4.5 → at most 7 cols (floor span 6+1... bound 8)
    rows, cols = cfg.primary_window
    assert cols >= 7 and rows >= 10
    rows2, cols2 = cfg.road_window  # scales 2.0 / 1.5 → 6.0 / 6.75
    assert cols2 >= 13 and rows2 >= 14


@pytest.mark.skipif(not os.path.exists(REF_YAML), reason="reference absent")
def test_load_reference_yaml():
    cfg = DepthEstimatorConfig.from_yaml(REF_YAML)
    assert cfg.pixelarea_search_witdh == 6
    assert cfg.pixelarea_search_height == 9
    assert cfg.histogram_segmentation_bin_witdh == 0.3
    assert cfg.treshold_depth_max == 100
    assert cfg.plane_estimator_use_mestimator
    assert not cfg.plane_estimator_use_triangle_maximation
    assert cfg.viewray_plane_orthoganality_treshold == 0.03
    assert cfg.ransac_plane_probability == 0.999


def test_unknown_key_raises():
    with pytest.raises(KeyError):
        DepthEstimatorConfig.from_dict({"not_a_real_key": 1})


def test_alias_keys():
    cfg = DepthEstimatorConfig.from_dict({
        "pixelarea_search_width": 8,
        "threshold_depth_max": 80,
    })
    assert cfg.pixelarea_search_witdh == 8
    assert cfg.treshold_depth_max == 80


def test_validation():
    with pytest.raises(ValueError):
        DepthEstimatorConfig(plane_estimator_use_mestimator=False)
    with pytest.raises(ValueError):
        DepthEstimatorConfig(treshold_depth_mode=5)
    with pytest.raises(ValueError):
        DepthEstimatorConfig(grid_collision_rule="random")


def test_hashable_static_arg():
    a = DepthEstimatorConfig()
    b = DepthEstimatorConfig()
    assert hash(a) == hash(b) and a == b
    c = a.replace(treshold_depth_max=50.0)
    assert c != a
