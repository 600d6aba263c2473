"""Unit tests: Nystrom sampling + permutation (SURVEY.md §2.2 #3, §4.2)."""

import numpy as np
import pytest

from graphlap_tpu.utils.sampling import uniform_grid_sample


@pytest.mark.parametrize("h,w,p", [(128, 128, 164), (96, 64, 61), (32, 32, 1024),
                                   (17, 31, 7), (8, 8, 64), (100, 40, 1)])
def test_exact_count_and_permutation_roundtrip(h, w, p):
    plan = uniform_grid_sample(h, w, p)
    n = h * w
    assert plan.p == p
    assert plan.perm.shape == (n,)
    assert plan.inv_perm.shape == (n,)
    # perm is a permutation and [A; B] ordered
    assert np.array_equal(np.sort(plan.perm), np.arange(n))
    assert np.array_equal(plan.perm[:p], plan.idx_a)
    # round trip
    x = np.random.default_rng(0).standard_normal(n)
    assert np.array_equal(x[plan.perm][plan.inv_perm], x)


def test_indices_sorted_unique_in_range():
    plan = uniform_grid_sample(64, 48, 31)
    assert np.all(np.diff(plan.idx_a) > 0)
    assert plan.idx_a.min() >= 0 and plan.idx_a.max() < 64 * 48


def test_spatial_uniformity():
    # samples should cover the image, not bunch up: every quadrant gets some
    h = w = 64
    plan = uniform_grid_sample(h, w, 64)
    rows, cols = plan.idx_a // w, plan.idx_a % w
    for rlo, rhi in [(0, h // 2), (h // 2, h)]:
        for clo, chi in [(0, w // 2), (w // 2, w)]:
            inq = ((rows >= rlo) & (rows < rhi) & (cols >= clo) & (cols < chi)).sum()
            assert inq >= 64 // 8


def test_oversample_clamps_to_n():
    plan = uniform_grid_sample(8, 8, 1000)
    assert plan.p == 64
