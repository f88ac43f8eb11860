"""Conformance: MASS v2 + distance helpers (reference tests/test_mass2.py)."""

import numpy as np

from matrixprofile_1_ray.kernels import (
    apply_exclusion_zone,
    distance_profile,
    fft_convolve,
    find_skip_locations,
    mass2,
    sliding_dot_product,
)


def test_mass2_complex_output():
    ts = np.array([1, 1, 1, 2, 1, 1, 4, 5])
    query = np.array([2, 1, 1, 4])
    actual = mass2(ts, query)
    desired = np.array([0.67640791, 3.43092352, 3.43092352, 0.0, 1.85113597])
    assert np.iscomplexobj(actual)
    np.testing.assert_almost_equal(actual, desired)


def test_mass2_extras():
    out = mass2(np.arange(16, dtype="d"), np.array([1.0, 2.0, 3.0, 4.0]), extras=True)
    assert set(out) == {"distance_profile", "product", "data_mean",
                       "query_mean", "data_std", "query_std"}
    assert out["data_mean"].shape[0] == 16


def test_fft_convolve_matches_direct():
    rng = np.random.default_rng(0)
    ts = rng.normal(size=257)
    q = rng.normal(size=16)
    np.testing.assert_allclose(fft_convolve(ts, q), sliding_dot_product(ts, q),
                               atol=1e-8)


def test_distance_profile_zero_at_self():
    rng = np.random.default_rng(1)
    ts = rng.normal(size=64)
    w = 8
    from matrixprofile_1_ray.kernels import moving_avg_std

    mu, sig = moving_avg_std(ts, w)
    prod = fft_convolve(ts, ts[:w])
    dp = distance_profile(prod, w, mu, sig, mu[0], sig[0])
    # the reference allows sqrt of a tiny negative -> nan at the self match
    assert np.isnan(dp[0]) or abs(dp[0]) < 1e-6
    assert np.nanmin(dp[1:]) > 0.1


def test_exclusion_zone_and_skip_locations():
    dp = np.zeros(10)
    apply_exclusion_zone(2, False, 4, 13, 5, dp)
    assert np.isinf(dp[3:8]).all() and np.isfinite(dp[:3]).all()
    dp2 = np.zeros(10)
    apply_exclusion_zone(2, True, 4, 13, 5, dp2)
    assert np.isfinite(dp2).all()

    ts = np.array([1.0, np.nan, 3.0, 4.0, 5.0, 6.0])
    skips = find_skip_locations(ts, 3, 4)
    np.testing.assert_array_equal(skips, [True, True, False])


def test_pearson_to_euclidean_truncated_windows_rows_are_inf():
    """Rows beyond len(windows) must come back inf (reference fills with
    np.full(inf)); np.empty would return uninitialized heap memory."""
    from matrixprofile_1_ray.kernels.mass import pearson_to_euclidean

    out = pearson_to_euclidean(np.zeros((3, 5)), [4, 8])
    assert np.isinf(out[2]).all()
    assert np.allclose(out[0], np.sqrt(2 * 4 * 1.0))
