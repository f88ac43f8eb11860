"""The reference import layout resolves on this package directly (the
compat/matrixprofile shim only renames it): core/cycore/preprocess/datasets
alias modules, algorithms function re-exports, cympx signatures, and the
identical-window correlation snap these surfaces rely on."""

import numpy as np
import pytest


def test_core_namespace(sampledata):
    from matrixprofile_1_ray import core

    # reference core.py surface (reference tests/test_core.py)
    assert list(core.generate_batch_jobs(9, 1)) == [(0, 9)]
    assert list(core.generate_batch_jobs(9, 4)) == [(0, 3), (3, 6), (6, 9)]
    assert list(core.generate_batch_jobs(9, 12)) == [
        (i, i + 1) for i in range(9)]
    assert core.rolling_window(np.arange(6), 3).shape == (4, 3)
    mu, sig = core.moving_avg_std(sampledata, 32)
    assert mu.shape == sig.shape == (len(sampledata) - 31,)
    with pytest.raises(ValueError):
        core.clean_nan_inf(None)
    np.testing.assert_equal(
        core.clean_nan_inf(np.array([np.nan, 1, np.inf, 2])),
        np.array([0, 1, 0, 2]))


def test_cycore_and_preprocess_namespaces(sampledata):
    from matrixprofile_1_ray import cycore, preprocess

    mu, sig = cycore.muinvn(sampledata, 32)
    assert mu.shape == (len(sampledata) - 31,)
    with pytest.raises(ValueError):
        preprocess.impute_missing(1, window=4)
    with pytest.raises(ValueError):
        preprocess.add_noise_to_series(1)
    with pytest.raises(ValueError):
        preprocess.is_subsequence_constant(1)
    with pytest.raises(ValueError):
        preprocess.preprocess(1, window=4)
    out = preprocess.preprocess(
        np.array([np.nan, 1.0, 2.0, 3.0, np.inf, 2.0, 1.0, 4.0]), window=4)
    assert np.isfinite(out).all()


def test_algorithms_function_reexports(sampledata):
    # reference algorithms/__init__.py exports the functions, so
    # `algorithms.mpx` is CALLABLE (reference tests/test_io.py style)
    from matrixprofile_1_ray import algorithms

    prof = algorithms.mpx(sampledata, 32)
    assert prof["algorithm"] == "mpx"
    assert "mpb" not in prof and "pib" not in prof  # reference dict shape
    pmp = algorithms.skimp(sampledata, windows=[16, 32])
    assert pmp["class"] == "PMP"
    assert callable(algorithms.stomp) and callable(algorithms.mass2)
    assert callable(algorithms.pairwise_dist) and callable(algorithms.mpdist)


def test_cympx_signatures(sampledata):
    from matrixprofile_1_ray.algorithms.cympx import (
        mpx_ab_parallel,
        mpx_parallel,
    )

    mp1, pi1 = mpx_parallel(sampledata, 32, 0, 1)
    mp2, pi2 = mpx_parallel(sampledata, 32, 0, 4)  # n_jobs never changes values
    np.testing.assert_array_equal(mp1, mp2)
    np.testing.assert_array_equal(pi1, pi2)
    mpa, mpia, mpb, mpib = mpx_ab_parallel(sampledata, sampledata[199:300],
                                           32, 0, 2)
    assert mpa.shape[0] == len(sampledata) - 31
    assert mpb.shape[0] == 101 - 31


def test_identical_window_snap(sampledata):
    """mpx_ab snaps correlations within 1e-13 of 1 to exactly 1, so a
    series joined with an exact slice of itself reports distance 0 for the
    aligned windows (the reference's clamp reaches the same 0 when its
    rounding lands above 1 — cympx.pyx:250-254)."""
    from matrixprofile_1_ray.kernels.mpdist import mpdist
    from matrixprofile_1_ray.kernels.mpx import mpx_ab

    mp, _, mpb, _ = mpx_ab(sampledata, sampledata, 32)
    assert mp.max() == 0.0 and mpb.max() == 0.0
    assert mpdist(sampledata, sampledata, 32) == 0.0
    assert mpdist(sampledata, sampledata[199:300], 32) == 0.0


def test_datasets_namespace(tmp_path, monkeypatch):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from matrixprofile_1_ray.datasets import datasets

    with pytest.raises(RuntimeError):
        datasets.fetch_available()  # no catalog configured, no network

    pq.write_table(pa.table({"x": [1, 2]}), str(tmp_path / "tiny.parquet"))
    monkeypatch.setenv("MP1RAY_DATASETS_ROOT", str(tmp_path))
    listing = datasets.fetch_available()
    assert [e["name"] for e in listing] == ["tiny"]
