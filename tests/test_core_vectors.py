"""Conformance vectors from reference tests/test_core.py re-expressed:
inline inputs/outputs the reference pins for its core helpers."""

import numpy as np
import pytest

from matrixprofile_1_ray.kernels.mass import (
    fft_convolve,
    pearson_to_euclidean,
    sliding_dot_product,
)
from matrixprofile_1_ray.kernels.moving_stats import moving_max, moving_min
from matrixprofile_1_ray.kernels.preprocess import (
    precheck_series_and_query_1d,
    to_np_array,
)


def test_dot_product_vectors():
    """reference tests/test_core.py:176-193."""
    query = np.array([1, 2, 3, 4])
    ts = np.array([4, 5, 6, 1, 2, 3, 8, 9, 1, 7, 8, 15, 20])
    desired = np.array([36, 28, 26, 46, 68, 50, 57, 64, 99, 148])
    np.testing.assert_almost_equal(fft_convolve(ts, query), desired)
    np.testing.assert_almost_equal(sliding_dot_product(ts, query), desired)


def test_moving_min_vectors():
    """reference tests/test_core.py:309-325."""
    np.testing.assert_equal(moving_min(np.array([1, 1, 1, 2, 0, 2]), 4),
                            [1, 0, 0])
    np.testing.assert_equal(moving_min(np.array([1, 0, 1, 2, 0, 2]), 4),
                            [0, 0, 0])
    np.testing.assert_equal(moving_min(np.array([1, 1, 1, 2, 0, 2]), 2),
                            [1, 1, 1, 0, 0])


def test_moving_max_vectors():
    """reference tests/test_core.py:329-344."""
    np.testing.assert_equal(moving_max(np.array([1, 1, 1, 2, 0, 2]), 4),
                            [2, 2, 2])
    np.testing.assert_equal(moving_max(np.array([1, 0, 1, 2, 0, 2]), 4),
                            [2, 2, 2])
    np.testing.assert_equal(moving_max(np.array([1, 1, 1, 2, 0, 2]), 2),
                            [1, 1, 2, 2, 2])


def test_pearson_to_euclidean_2d_vector():
    """reference tests/test_core.py:279-287."""
    a = np.array([[0.23, 0.5, 0.34, 0.67, 0.88],
                  [0.23, 0.5, 0.34, 0.67, 0.88]])
    desired = np.array([[2.48193473, 2, 2.29782506, 1.62480768, 0.9797959],
                        [2.48193473, 2, 2.29782506, 1.62480768, 0.9797959]])
    np.testing.assert_almost_equal(pearson_to_euclidean(a, [4, 4]), desired)


def test_to_np_array_contract():
    """reference tests/test_core.py:50-74."""
    for bad in ("s", 1, {1, 2, 3}):
        with pytest.raises(ValueError, match="Unable to convert"):
            to_np_array(bad)
    np.testing.assert_equal(to_np_array([1, 2, 3]), np.array([1, 2, 3]))
    np.testing.assert_equal(to_np_array((1, 2, 3)), np.array([1, 2, 3]))
    np.testing.assert_equal(to_np_array(range(3)), np.array([0, 1, 2]))


def test_precheck_contract():
    """reference tests/test_core.py:76-97."""
    ts, q = precheck_series_and_query_1d([1, 2, 3], [4, 5])
    assert ts.dtype == "d" and q.dtype == "d"
    with pytest.raises(ValueError, match="Invalid ts value"):
        precheck_series_and_query_1d("1", [1, 2, 3])
    with pytest.raises(ValueError, match="Invalid query value"):
        precheck_series_and_query_1d([1, 2, 3], "1")
