"""Compiled-walk parity: the ctypes kernels must match the NumPy diagonal
path to fp rounding (seed-first vs cumsum-then-seed accumulation), with
identical neighbor indices on tie-free data."""

import numpy as np
import pytest

from matrixprofile_1_ray.kernels import _native
from matrixprofile_1_ray.kernels.mpx import (
    _ab_one_side,
    _diff_eqs,
    mpx_ab,
    mpx_precompute,
    mpx_self,
)
from matrixprofile_1_ray.kernels.moving_stats import muinvn

pytestmark = pytest.mark.skipif(not _native.AVAILABLE,
                                reason="no C compiler in this runtime")


def _numpy_only(monkeypatch):
    monkeypatch.setattr(_native, "AVAILABLE", False)


def test_self_join_native_matches_numpy(monkeypatch):
    rng = np.random.default_rng(7)
    ts = np.cumsum(rng.standard_normal(8192))
    mp_c, mpi_c = mpx_self(ts, 32)
    _numpy_only(monkeypatch)
    mp_np, mpi_np = mpx_self(ts, 32)
    np.testing.assert_allclose(mp_c, mp_np, atol=1e-9)
    np.testing.assert_array_equal(mpi_c, mpi_np)


def test_ab_join_native_matches_numpy(monkeypatch):
    rng = np.random.default_rng(9)
    ts = np.cumsum(rng.standard_normal(4096))
    q = np.cumsum(rng.standard_normal(2048))
    got = mpx_ab(ts, q, 32)
    _numpy_only(monkeypatch)
    exp = mpx_ab(ts, q, 32)
    np.testing.assert_allclose(got[0], exp[0], atol=1e-9)
    np.testing.assert_allclose(got[2], exp[2], atol=1e-9)
    np.testing.assert_array_equal(got[1], exp[1])
    np.testing.assert_array_equal(got[3], exp[3])


def test_ab_native_exclusion_band(monkeypatch):
    """delta/minlag skipping (the tiled self-join band) must match."""
    rng = np.random.default_rng(11)
    ts = np.cumsum(rng.standard_normal(3000))
    w, minlag = 32, 8
    mu, sig = muinvn(ts, w)
    df, dg = _diff_eqs(ts, mu, w)
    from matrixprofile_1_ray.kernels.mass import exact_sliding_dot_product

    seed = exact_sliding_dot_product(ts, ts[:w]) - w * mu * mu[0]
    pl = sig.shape[0]

    def run():
        mp_a = np.full(pl, -1.0)
        mpi_a = np.full(pl, -1, np.int64)
        mp_b = np.full(pl, -1.0)
        mpi_b = np.full(pl, -1, np.int64)
        _ab_one_side(seed, df, dg, df, dg, sig, sig, mp_a, mpi_a,
                     mp_b, mpi_b, delta=0, minlag=minlag)
        return mp_a, mpi_a, mp_b, mpi_b

    got = run()
    _numpy_only(monkeypatch)
    exp = run()
    np.testing.assert_allclose(got[0], exp[0], atol=1e-9)
    np.testing.assert_array_equal(got[1], exp[1])
    np.testing.assert_allclose(got[2], exp[2], atol=1e-9)
    np.testing.assert_array_equal(got[3], exp[3])


def test_native_diag_range_partial_merge():
    """Range-split + merge equals the full run (the chunked fan-out law)."""
    rng = np.random.default_rng(13)
    ts = np.cumsum(rng.standard_normal(4096))
    seed, df, dg, sig, minlag = mpx_precompute(ts, 32)
    pl = sig.shape[0]
    mp_full = np.full(pl, -1.0)
    mpi_full = np.full(pl, -1, np.int64)
    _native.mpx_diag_range_native(minlag + 1, pl, seed, df, dg, sig,
                                  mp_full, mpi_full)
    mid = (minlag + 1 + pl) // 2
    mp_m = np.full(pl, -1.0)
    mpi_m = np.full(pl, -1, np.int64)
    _native.mpx_diag_range_native(minlag + 1, mid, seed, df, dg, sig,
                                  mp_m, mpi_m)
    _native.mpx_diag_range_native(mid, pl, seed, df, dg, sig, mp_m, mpi_m)
    np.testing.assert_array_equal(mp_full, mp_m)
    np.testing.assert_array_equal(mpi_full, mpi_m)


def test_serial_mpx_32768_under_2s():
    """The round-1 per-core deficit (4.8s vs reference 1.555s) is closed:
    serial self-join at n=32768 w=32 must run in <= 2.5s."""
    import time

    rng = np.random.default_rng(0)
    ts = np.cumsum(rng.standard_normal(32768))
    mpx_self(ts, 32)  # warm (import, page-in)
    t0 = time.time()
    mpx_self(ts, 32)
    assert time.time() - t0 < 2.5
