"""Frame samplers: exact-parity checks against the reference index math
(lib/data/datasets/dataset.py:71-161, video_contrast_dataset.py:82-149)."""

import numpy as np
import pytest

from video_graph_ssl_tpu.data import samplers


def test_uniform_downstream_structure():
    rng = np.random.default_rng(0)
    idx = samplers.sample_indices_uniform(100, 8, new_length=1, rng=rng)
    assert idx.shape == (8,)
    # average_duration = 100 // 8 = 12: offsets in segment windows, 1-based
    avg = (100 - 1 + 1) // 8
    base = np.arange(8) * avg
    assert np.all(idx >= base + 1) and np.all(idx <= base + avg)


def test_uniform_contrast_uses_nframes_plus_one():
    # contrast variant: average_duration = (n+1)//L
    rng = np.random.default_rng(0)
    idx = samplers.sample_indices_uniform(7, 8, rng=rng, contrast=True)
    # (7+1)//8 = 1 -> deterministic arange
    np.testing.assert_array_equal(idx, np.arange(8) + 1)


def test_uniform_short_video_zero_offsets():
    rng = np.random.default_rng(0)
    idx = samplers.sample_indices_uniform(3, 8, rng=rng)
    np.testing.assert_array_equal(idx, np.ones(8))


def test_val_indices_golden():
    # reference: tick=(n-new+1)/L; offsets=int(tick/2 + tick*x) + 1
    idx = samplers.val_indices(100, 4)
    tick = 100 / 4.0
    expect = np.array([int(tick / 2 + tick * x) for x in range(4)]) + 1
    np.testing.assert_array_equal(idx, expect)


def test_dense_main_path():
    rng = np.random.default_rng(1)
    idx = samplers.dense_indices(300, 16, step=4, rng=rng)
    assert idx.shape == (16,)
    diffs = np.diff(idx)
    np.testing.assert_array_equal(diffs, 4)
    assert idx[0] >= 1 and idx[-1] <= 300


def test_dense_fallback_half_step():
    rng = np.random.default_rng(1)
    # n between L*(step//2) and L*step: stride becomes step//2
    idx = samplers.dense_indices(40, 16, step=4, rng=rng)
    np.testing.assert_array_equal(np.diff(idx), 2)


def test_dense_fallback_stride_one():
    rng = np.random.default_rng(1)
    idx = samplers.dense_indices(20, 16, step=4, rng=rng)
    np.testing.assert_array_equal(np.diff(idx), 1)


def test_dense_fallback_sorted_random():
    rng = np.random.default_rng(1)
    idx = samplers.dense_indices(8, 16, step=4, rng=rng)
    assert idx.shape == (16,)
    assert np.all(np.diff(idx) >= 0)
    assert idx.max() <= 8


def test_nclips_clamped_golden():
    idx = samplers.nclips_test_indices(200, 16, num_clips=3, step=4)
    assert len(idx) == 3 * 16
    assert min(idx) >= 1 and max(idx) <= 199
    # first clip follows the reference arithmetic
    tick = (200 - 64 + 1) / 3.0
    start = int(tick / 2)
    np.testing.assert_array_equal(idx[:16],
                                  np.arange(start, start + 64, 4) + 1)


def test_nclips_short_video_clamps():
    idx = samplers.nclips_test_indices(10, 16, num_clips=10, step=4)
    assert min(idx) >= 1 and max(idx) <= 9


def test_adver_indices_count():
    rng = np.random.default_rng(2)
    idx = samplers.adver_indices(100, 8, nsamples=5, rng=rng)
    assert len(idx) == 40
    assert min(idx) >= 1


def test_samplers_deterministic_with_seed():
    a = samplers.dense_indices(300, 16, 4, np.random.default_rng(7))
    b = samplers.dense_indices(300, 16, 4, np.random.default_rng(7))
    np.testing.assert_array_equal(a, b)
