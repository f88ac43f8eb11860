"""Conformance: moving statistics vs reference cycore semantics
(reference tests/test_cycore.py + MATLAB golden muinvn files)."""

import numpy as np
import pytest

from matrixprofile_1_ray.kernels import (
    moving_avg_std,
    moving_max,
    moving_median,
    moving_min,
    muinvn,
)
from tests.conftest import golden


def test_moving_avg_std_tiny():
    mu, std = moving_avg_std(np.array([1, 2, 3, 4, 5, 6], dtype="d"), 3)
    np.testing.assert_almost_equal(mu, [2.0, 3.0, 4.0, 5.0])
    np.testing.assert_almost_equal(std, [0.81649658] * 4)


def test_constant_series_exact_zero_std():
    a = np.full(7, 10.1)
    mu, std = moving_avg_std(a, 3)
    mu2, inv = muinvn(a, 3)
    np.testing.assert_almost_equal(mu, np.full(5, 10.1))
    assert (std == 0).all()
    np.testing.assert_almost_equal(mu2, np.full(5, 10.1))
    assert (inv == 0).all()


def test_muinvn_tiny():
    mu, inv = muinvn(np.array([1, 2, 3, 4, 5, 6], dtype="d"), 3)
    np.testing.assert_almost_equal(mu, [2.0, 3.0, 4.0, 5.0])
    np.testing.assert_almost_equal(inv, [0.7071068] * 4)


def test_muinvn_vs_matlab(sampledata):
    mu, inv = muinvn(sampledata, 32)
    np.testing.assert_almost_equal(golden("muinvn_mua.txt"), mu, decimal=4)
    np.testing.assert_almost_equal(golden("muinvn_stda.txt"), inv, decimal=4)


def test_moving_min_max_median():
    a = np.array([3.0, 1.0, 4.0, 1.0, 5.0, 9.0])
    np.testing.assert_array_equal(moving_min(a, 3), [1, 1, 1, 1])
    np.testing.assert_array_equal(moving_max(a, 3), [4, 4, 5, 9])
    np.testing.assert_array_equal(moving_median(a, 3), [3, 1, 4, 5])


def test_window_larger_than_series_raises():
    with pytest.raises(ValueError):
        muinvn(np.arange(3, dtype="d"), 5)


def test_muinvn_mu_precision_on_offset_data():
    """The exact-path mu must not inherit the running cumsum's global
    cancellation: on data with a large constant offset the windowed mean
    error stays near machine precision (the old length-n cumsum
    difference lost ~3 digits because the running total grows with n)."""
    rng = np.random.default_rng(0)
    a = 1e8 + rng.normal(size=20000)
    w = 32
    mu, _ = muinvn(a, w)
    exact = np.array([a[i:i + w].mean() for i in range(0, len(a) - w + 1,
                                                       997)])
    got = mu[::997][: len(exact)]
    assert np.max(np.abs(got - exact)) < 1e-6


def test_muinvn_exact_path_still_dyadic_exact():
    """Integer (token) inputs: per-window pairwise sums are exact, so mu
    is the correctly rounded rational — bit-identical to the scalar walk
    the tie-semantics tests rely on."""
    rng = np.random.default_rng(1)
    a = rng.integers(0, 128, size=4096).astype("d")
    w = 16
    mu, _ = muinvn(a, w)
    ref = np.array([a[i:i + w].sum() / w for i in range(len(a) - w + 1)])
    assert np.array_equal(mu, ref)
