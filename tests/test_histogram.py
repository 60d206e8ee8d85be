"""Histogram depth-blob segmentation tests.

Includes (a) the reference's hand-built fixture
(test_monolidar_fusion.cpp:306-374), (b) a pure-Python oracle that
literally implements the reference scan loop
(HistogramPointDepth.cpp:36-122), fuzz-compared against the vectorized
implementation.
"""

import math

import numpy as np
import jax.numpy as jnp

from mono_lidar_depth_tpu.core.histogram import (
    filter_points_min_dist_blob, nearest_point)

BINS = 512


def run_filter(depths, mask, bin_width, min_count, num_bins=BINS):
    d = jnp.asarray(depths, dtype=jnp.float32)[None, :]
    m = jnp.asarray(mask, dtype=bool)[None, :]
    out = filter_points_min_dist_blob(d, m, bin_width, min_count, num_bins)
    return (np.asarray(out.seg_mask[0]), bool(out.found[0]),
            float(out.lower[0]), float(out.upper[0]), int(out.bin_id[0]))


def reference_oracle(depths, bin_width, min_count):
    """Literal port of the reference scan loop semantics for testing
    (HistogramPointDepth.cpp:36-122).  Returns (found, selected_mask,
    lower, upper)."""
    depths = [min(d, 999.0) for d in depths]
    max_dist = 0
    for d in depths:
        if d > max_dist:
            max_dist = math.ceil(d)
    bin_count = int(max_dist / bin_width + 1)
    if bin_count <= 1:
        return False, [False] * len(depths), -1, -1
    counts = [0] * bin_count
    for d in depths:
        b = int(min(abs(d) / bin_width, bin_count - 1))
        counts[b] += 1
    bin_max_id, bin_max_val, bin_value = -1, -1, 0
    for i in range(bin_count):
        last = bin_value
        bin_value = counts[i]
        if bin_value > bin_max_val and bin_value >= min_count:
            bin_max_val = bin_value
            bin_max_id = i
        elif bin_value < bin_max_val:
            break
        if last > 0 and bin_value == 0:
            return False, [False] * len(depths), -1, -1
    if bin_max_id < 0:
        return False, [False] * len(depths), -1, -1
    lower = bin_max_id * bin_width
    upper = bin_max_id * bin_width + bin_width
    sel = [lower <= d < upper for d in depths]
    return True, sel, lower, upper


def test_reference_fixture():
    # test_monolidar_fusion.cpp:306-374: 13 depths, bin width 1,
    # min count 3 → first local max bin [8, 9), exactly 8.2/8.3/8.4.
    depths = [2.2, 3.5, 4.2, 5.2, 5.2, 6.2, 7.2, 8.2, 8.3, 8.4, 9.2, 10.2, 10.5]
    mask = [True] * len(depths)
    seg, found, lower, upper, _ = run_filter(depths, mask, 1.0, 3)
    assert found
    assert lower == 8.0 and upper == 9.0
    np.testing.assert_array_equal(
        seg, [False] * 7 + [True, True, True] + [False] * 3)


def test_gap_aborts():
    # Populated bin followed by a gap before any qualifying max → fail.
    depths = [1.1, 1.2, 5.5, 5.6, 5.7]
    seg, found, *_ = run_filter(depths, [True] * 5, 1.0, 3)
    assert not found
    assert not seg.any()


def test_first_local_max_not_global():
    # Later bigger blob must NOT win: first local max >= min_count wins.
    depths = [3.1, 3.2, 3.3, 4.5, 10.1, 10.2, 10.3, 10 + 0.4, 10.5]
    seg, found, lower, upper, _ = run_filter(depths, [True] * 9, 1.0, 3)
    assert found
    assert (lower, upper) == (3.0, 4.0)
    assert seg.sum() == 3


def test_empty_mask_fails():
    seg, found, *_ = run_filter([5.0, 6.0], [False, False], 1.0, 3)
    assert not found


def test_masked_entries_ignored():
    depths = [2.2, 2.3, 2.4, 50.0, 50.1, 50.2]
    mask = [True, True, True, False, False, False]
    seg, found, lower, upper, _ = run_filter(depths, mask, 1.0, 3)
    assert found and (lower, upper) == (2.0, 3.0)
    assert seg.sum() == 3


def test_fuzz_against_reference_oracle(rng):
    bin_width = 0.3
    min_count = 3
    mismatches = 0
    for trial in range(300):
        k = rng.integers(1, 40)
        # clustered depths: a few blobs + outliers
        centers = rng.uniform(1, 60, size=rng.integers(1, 4))
        depths = []
        for _ in range(k):
            c = centers[rng.integers(0, len(centers))]
            depths.append(float(max(0.05, c + rng.normal() * 0.4)))
        found_ref, sel_ref, lo_ref, up_ref = reference_oracle(
            depths, bin_width, min_count)
        seg, found, lo, up, _ = run_filter(depths, [True] * k, bin_width,
                                           min_count)
        assert found == found_ref, (trial, depths)
        if found:
            assert abs(lo - lo_ref) < 1e-5 and abs(up - up_ref) < 1e-5
            np.testing.assert_array_equal(seg, sel_ref)
    assert mismatches == 0


def test_nearest_point():
    # test_monolidar_fusion.cpp:277-303: 10 colinear points, depth
    # ascending from 5 → nearest is index 0.
    depths = jnp.asarray(np.arange(5, 10, 0.5, dtype=np.float32))[None, :]
    mask = jnp.ones_like(depths, dtype=bool)
    idx, ok = nearest_point(depths, mask)
    assert bool(ok[0]) and int(idx[0]) == 0

    # with mask: first valid minimum wins
    mask2 = mask.at[0, 0].set(False)
    idx2, ok2 = nearest_point(depths, mask2)
    assert bool(ok2[0]) and int(idx2[0]) == 1


def test_sorted_matches_scatter_variant(rng):
    """The default (sort-based) and scatter-based implementations must
    agree bit-for-bit on random batch inputs."""
    from mono_lidar_depth_tpu.core.histogram import (
        filter_points_min_dist_blob_scatter)
    N, K = 64, 70
    d = jnp.asarray(rng.uniform(0.5, 90, (N, K)).astype(np.float32))
    m = jnp.asarray(rng.random((N, K)) < 0.7)
    a = filter_points_min_dist_blob(d, m, 0.3, 3, BINS)
    b = filter_points_min_dist_blob_scatter(d, m, 0.3, 3, BINS)
    np.testing.assert_array_equal(np.asarray(a.found), np.asarray(b.found))
    np.testing.assert_array_equal(np.asarray(a.bin_id), np.asarray(b.bin_id))
    np.testing.assert_array_equal(np.asarray(a.seg_mask), np.asarray(b.seg_mask))
