"""Conformance: imputation/preprocess, gap-fill and annotation vectors
(reference tests/test_preprocess.py, test_annotation_vector.py)."""

import numpy as np
import pytest

from matrixprofile_1_ray.kernels import (
    add_noise_to_series,
    apply_av,
    impute_missing,
    is_subsequence_constant,
    make_clipping_av,
    make_complexity_av,
    make_default_av,
    make_meanstd_av,
    mpx,
    preprocess,
    statistics,
    validate_preprocess_kwargs,
)
from matrixprofile_1_ray.kernels.preprocess import gapfill


NAN_SERIES = np.array(
    [np.nan, np.inf, 2, 3, np.nan, 4, 5, np.inf, np.nan, np.nan, 7,
     8, 9, np.nan, np.inf, 10, 11, 12, np.nan, np.inf], dtype="d")


def test_impute_missing_removes_all_nan_inf():
    for method in ("mean", "median", "min", "max"):
        for direction in ("forward", "backward"):
            out = impute_missing(NAN_SERIES, 4, method=method, direction=direction)
            assert np.isfinite(out).all()


def test_impute_validation():
    with pytest.raises(ValueError):
        impute_missing(NAN_SERIES, 4, method="bogus")
    with pytest.raises(ValueError):
        impute_missing(NAN_SERIES, 4, direction="bogus")
    with pytest.raises(ValueError):
        impute_missing(NAN_SERIES, "4")


def test_preprocess_noise_on_constant_windows():
    ts = np.full(32, 5.0)
    out = preprocess(ts, 8, seed=7)
    assert np.isfinite(out).all()
    assert not is_subsequence_constant(out[:8])
    assert np.abs(out - 5.0).max() < 1e-5
    # deterministic given the same seed
    np.testing.assert_array_equal(out, preprocess(np.full(32, 5.0), 8, seed=7))


def test_add_noise_bounds():
    out = add_noise_to_series(np.zeros(100), seed=1)
    assert (out >= 0).all() and (out < 9e-7).all()


def test_validate_preprocess_kwargs():
    assert validate_preprocess_kwargs(None) is None
    out = validate_preprocess_kwargs({"window": 5})
    assert out == {"window": 5, "impute_method": "mean",
                   "impute_direction": "forward", "add_noise": True}
    with pytest.raises(ValueError):
        validate_preprocess_kwargs({"bogus": 1})
    with pytest.raises(ValueError):
        validate_preprocess_kwargs({"impute_method": "bogus"})


def test_gapfill_forward_and_linear():
    ts = np.array([np.nan, 1.0, np.nan, np.nan, 4.0, np.nan])
    np.testing.assert_array_equal(gapfill(ts, "forward_fill"),
                                  [1, 1, 1, 1, 4, 4])
    np.testing.assert_array_equal(gapfill(ts, "linear"), [1, 1, 2, 3, 4, 4])
    with pytest.raises(ValueError):
        gapfill(np.full(3, np.nan))


def test_annotation_vectors_exact():
    """Reference inline vectors (tests/test_annotation_vector.py:85-145)."""
    np.testing.assert_almost_equal(
        make_default_av([0, 1, 2, 3, 4, 5], 3), [1, 1, 1, 1])

    complexity_cases = [
        ([3.0] * 6, [0, 0, 0, 0]),
        ([0.0, 1, 2, 3, 4, 5], [0, 0, 0, 0]),
        ([0.0, 3, 0, 2, 0, 1],
         [0.47295372330527, 0.32279030890406757, 0.13962038997193682, 0.0]),
    ]
    for ts, expect in complexity_cases:
        np.testing.assert_almost_equal(make_complexity_av(np.array(ts), 3), expect)

    meanstd_cases = [
        ([3.0] * 6, [0, 0, 0, 0]),
        ([-10.0, 10, -10, 1, -1, 1], [0, 0, 1, 1]),
        ([0.0, 3, 0, 2, 0, 1], [0, 0, 1, 1]),
    ]
    for ts, expect in meanstd_cases:
        np.testing.assert_almost_equal(make_meanstd_av(np.array(ts), 3), expect)

    clipping_cases = [
        ([3.0] * 6, [0, 0, 0, 0]),
        ([0.0, 1, 2, 3, 4, 5], [0, 1, 1, 0]),
        ([0.0, 3, 0, 2, 0, 1], [0, 0.5, 0.5, 1]),
    ]
    for ts, expect in clipping_cases:
        np.testing.assert_almost_equal(make_clipping_av(np.array(ts), 3), expect)


def test_annotation_vectors(sampledata):
    w = 32
    n = len(sampledata) - w + 1
    assert (make_default_av(sampledata, w) == 1).all()
    for maker in (make_complexity_av, make_meanstd_av, make_clipping_av):
        av = maker(sampledata, w)
        assert av.shape[0] == n
        assert (av >= 0).all() and (av <= 1).all()


def test_apply_av_cmp(sampledata):
    profile = mpx(sampledata, 32)
    out = apply_av(profile, "complexity")
    assert out["av_type"] == "complexity"
    assert (out["cmp"] >= out["mp"] - 1e-12).all()
    with pytest.raises(ValueError):
        apply_av(profile, "bogus")
    with pytest.raises(ValueError):
        apply_av(profile, "custom", custom_av=np.full(10, 0.5))
    with pytest.raises(ValueError):
        apply_av(profile, "custom", custom_av=np.full(len(profile["mp"]), 2.0))


def test_statistics(sampledata):
    out = statistics(sampledata, 32)
    assert out["class"] == "Statistics"
    np.testing.assert_almost_equal(out["mean"], np.mean(sampledata))
    assert out["moving_min"].shape[0] == len(sampledata) - 31
    with pytest.raises(ValueError):
        statistics(sampledata, 2)
    with pytest.raises(ValueError):
        statistics(sampledata, len(sampledata) + 1)


def test_gapfill_rejects_unknown_mode_even_without_gaps():
    with pytest.raises(ValueError, match="unknown gapfill mode"):
        gapfill(np.array([1.0, 2.0, 3.0]), mode="ffill")


def test_to_np_array_rejects_numpy_scalars():
    """np.float64 carries __array__ but the reference raises for it; a
    0-d wrapper here would surface as a different, later error."""
    from matrixprofile_1_ray.kernels.preprocess import to_np_array

    with pytest.raises(ValueError, match="Unable to convert"):
        to_np_array(np.float64(3.0))
    # 0-d ndarray stays ACCEPTED (reference returns any ndarray as-is)
    assert to_np_array(np.array(3.0)).ndim == 0
