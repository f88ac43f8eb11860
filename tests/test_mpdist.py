"""Conformance: MPDist scalar / vector / pairwise
(reference tests/test_mpdist.py, test_pairwise_dist.py)."""

import numpy as np
import pytest

from matrixprofile_1_ray.kernels import mpdist, mpdist_vector, pairwise_dist


TS = np.array([1, 2, 3, 1, 2, 3, 4, 5, 6, 0, 0, 1,
               1, 2, 2, 4, 5, 1, 1, 9], dtype="d")
QUERY = np.array([0.23595094, 0.9865171, 0.1934413, 0.60880883,
                  0.55174926, 0.77139988, 0.33529215, 0.63215848])


def test_mpdist_tiny():
    np.testing.assert_almost_equal(mpdist(TS, QUERY, 4), 0.437690617625298)


def test_mpdist_matlab(sampledata):
    actual = mpdist(sampledata, sampledata[199:300], 32)
    np.testing.assert_almost_equal(actual, 1.460009659995543e-07)


def test_mpdist_validation():
    with pytest.raises(ValueError):
        mpdist(np.array([[1, 1], [2, 2]]), QUERY, 4)
    with pytest.raises(ValueError):
        mpdist(TS, QUERY, 4, threshold=0)


def test_mpdist_vector_shape(sampledata):
    ts_b = sampledata[:64]
    out = mpdist_vector(sampledata, ts_b, 32)
    assert out.shape[0] == len(sampledata) - len(ts_b) + 1
    # the window containing ts_b itself must be (near) zero distance
    assert out.min() < 1e-6
    assert int(np.argmin(out)) == 0


def test_pairwise_dist_condensed():
    rng = np.random.default_rng(3)
    series = [rng.normal(size=40) for _ in range(4)]
    dm = pairwise_dist(series, 8)
    assert dm.shape == (6,)
    # self-distance sanity: identical series at slots 0/1
    dm2 = pairwise_dist([series[0], series[0].copy(), series[1]], 8)
    assert dm2[0] < 1e-9


def test_calculate_mpdist_boundary_equals_max_not_indexerror():
    """clean.size == dist_loc must fall through to max(clean) — the
    reference indexes clean[dist_loc] under a >= guard and crashes with
    IndexError on exact equality (w close to len(ts_b))."""
    from matrixprofile_1_ray.kernels.mpdist import calculate_mpdist

    prof = np.array([1.0, 2.0, 3.0, 4.0])
    assert calculate_mpdist(prof, 0.05, 80) == 4.0  # dist_loc = 4 == size
    # and the order statistic itself is unchanged vs a full sort
    rng = np.random.default_rng(3)
    for _ in range(50):
        p = rng.normal(size=int(rng.integers(5, 60)))
        p[rng.random(size=p.size) < 0.2] = np.inf
        dlen = int(rng.integers(10, 200))
        srt = np.sort(p)
        clean = srt[np.isfinite(srt)]
        k = int(np.ceil(0.05 * dlen))
        exp = (np.inf if clean.size < 1
               else clean[k] if clean.size > k else clean.max())
        assert calculate_mpdist(p, 0.05, dlen) == exp
