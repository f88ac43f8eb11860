"""Conformance: shared helper kernels vs reference inline vectors
(reference tests/test_core.py:117-289)."""

import numpy as np

from matrixprofile_1_ray.kernels import (
    clean_nan_inf,
    fft_convolve,
    find_skip_locations,
    moving_average,
    moving_std,
    pearson_to_euclidean,
    rolling_window,
    sliding_dot_product,
)


def test_rolling_window():
    actual = rolling_window(np.array([1, 2, 3, 4, 5, 6]), 3)
    np.testing.assert_array_equal(
        actual, [[1, 2, 3], [2, 3, 4], [3, 4, 5], [4, 5, 6]])


def test_moving_average_and_std():
    a = np.array([1, 2, 3, 4, 5, 6])
    np.testing.assert_equal(moving_average(a, 3), [2.0, 3.0, 4.0, 5.0])
    np.testing.assert_almost_equal(moving_std(a, 3), [0.81649658] * 4)


def test_fft_convolve_vector():
    query = np.array([1, 2, 3, 4])
    ts = np.array([4, 5, 6, 1, 2, 3, 8, 9, 1, 7, 8, 15, 20])
    desired = [36, 28, 26, 46, 68, 50, 57, 64, 99, 148]
    np.testing.assert_almost_equal(fft_convolve(ts, query), desired)
    np.testing.assert_almost_equal(sliding_dot_product(ts, query), desired)


def test_clean_nan_inf_vector():
    ts = np.array([np.nan, 1.0, np.inf, 2.0, -np.inf])
    np.testing.assert_array_equal(clean_nan_inf(ts), [0, 1, 0, 2, 0])
    # input untouched (unlike the mutating reference)
    assert np.isnan(ts[0])


def test_find_skip_locations_vector():
    ts = np.array([1.0, 2, np.inf, 3, 4, 5])
    np.testing.assert_array_equal(
        find_skip_locations(ts, 4, 3), [True, True, True, False])


def test_pearson_to_euclidean_vectors():
    a = np.array([0.23, 0.5, 0.34, 0.67, 0.88])
    desired = [2.48193473, 2, 2.29782506, 1.62480768, 0.9797959]
    np.testing.assert_almost_equal(pearson_to_euclidean(a, [4]), desired)
    two = np.stack([a, a])
    np.testing.assert_almost_equal(pearson_to_euclidean(two, [4, 4]),
                                   [desired, desired])
    # inf stays inf in the 2-D case (reference core.py:617-620)
    with_inf = two.copy()
    with_inf[0, 0] = np.inf
    out = pearson_to_euclidean(with_inf, [4, 4])
    assert np.isinf(out[0, 0])
