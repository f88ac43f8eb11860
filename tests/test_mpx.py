"""Conformance: MPX self/AB joins vs reference inline vectors and the MATLAB
golden corpus (reference tests/test_mpx.py)."""

import numpy as np

from matrixprofile_1_ray.kernels import mpx
from matrixprofile_1_ray.kernels.mpx import mpx_ab, mpx_self
from tests.conftest import golden


def test_self_join_euclidean_tiny():
    ts = np.array([0, 1, 1, 1, 0, 0, 2, 1, 0, 0, 2, 1])
    profile = mpx(ts, 4)
    np.testing.assert_almost_equal(
        profile["mp"], [1.9550, 1.9550, 0.8739, 0, 0, 1.9550, 0.8739, 0, 0],
        decimal=4)
    np.testing.assert_array_equal(profile["pi"], [4, 5, 6, 7, 8, 1, 2, 3, 4])


def test_self_join_pearson_tiny():
    ts = np.array([0, 1, 1, 1, 0, 0, 2, 1, 0, 0, 2, 1])
    profile = mpx(ts, 4, cross_correlation=True)
    np.testing.assert_almost_equal(
        profile["mp"],
        [0.522232967867094, 0.522232967867094, 0.904534033733291, 1, 1,
         0.522232967867094, 0.904534033733291, 1, 1],
        decimal=4)
    np.testing.assert_array_equal(profile["pi"], [4, 5, 6, 7, 8, 1, 2, 3, 4])


def test_similarity_join_tiny():
    ts = np.array([1, 2, 3, 1, 2, 3, 4, 5, 6, 0, 0, 1,
                   1, 2, 2, 4, 5, 1, 1, 9], dtype="d")
    query = np.array([0, 0, 1, 1, 2, 2, 4, 5], dtype="d")
    profile = mpx(ts, 4, query=query)
    desired = [2.36387589e+00, 2.82842712e+00, 2.17957574e+00, 6.40728972e-01,
               6.40728972e-01, 6.40728972e-01, 3.26103392e+00, 3.61947699e+00,
               3.39984131e+00, 0.0, 4.21468485e-08, 0.0, 4.21468485e-08, 0.0,
               2.82842712e+00, 3.57109342e+00, 1.73771570e+00]
    np.testing.assert_almost_equal(profile["mp"], desired, decimal=4)
    np.testing.assert_array_equal(
        profile["pi"], [0, 1, 4, 1, 1, 1, 2, 1, 4, 2, 1, 2, 3, 4, 2, 1, 3])


def test_self_join_matlab(sampledata):
    mp, mpi = mpx_self(sampledata, 32)
    np.testing.assert_almost_equal(golden("mpx_mp.txt"), mp, decimal=4)


def test_similarity_join_matlab(sampledata):
    tsb = sampledata[199:300]
    mpa, mpia, mpb, mpib = mpx_ab(sampledata, tsb, 32)
    np.testing.assert_almost_equal(golden("mpx_ab_mpa.txt"), mpa, decimal=4)
    np.testing.assert_almost_equal(golden("mpx_ab_mpb.txt"), mpb, decimal=4)


def test_tiled_ab_join_equals_direct(sampledata):
    from matrixprofile_1_ray.kernels.mpx import mpx_ab, tiled_mpx_ab

    tsb = sampledata[199:300]
    mpa, mpia, mpb, mpib = mpx_ab(sampledata, tsb, 32)
    t_mpa, t_mpia, t_mpb, t_mpib = tiled_mpx_ab(sampledata, tsb, 32, tile=150)
    # sqrt(2w(1-rho)) amplifies 1e-16 correlation rounding to ~1e-7 near
    # perfect matches; indices must still agree exactly
    np.testing.assert_allclose(t_mpa, mpa, atol=1e-6)
    np.testing.assert_allclose(t_mpb, mpb, atol=1e-6)
    np.testing.assert_array_equal(t_mpia, mpia)
    np.testing.assert_array_equal(t_mpib, mpib)


def test_tiled_ab_self_pairs_snap_to_zero(sampledata):
    """Identical-window pairs must be distance exactly 0 in the tiled
    decomposition too (mpx_ab snaps; the tile path must match despite its
    larger per-tile cumsum rounding)."""
    from matrixprofile_1_ray.kernels.mpx import mpx_ab, tiled_mpx_ab

    mpa, mpia, mpb, mpib = mpx_ab(sampledata, sampledata, 32)
    t_mpa, _, t_mpb, _ = tiled_mpx_ab(sampledata, sampledata, 32, tile=128)
    assert (mpa == 0.0).all()
    np.testing.assert_allclose(t_mpa, mpa, atol=1e-7)
    np.testing.assert_allclose(t_mpb, mpb, atol=1e-7)


def test_fft_seed_path_matches_exact_seed(sampledata):
    """Long-series FFT seeding must agree with the exact BLAS path."""
    import importlib

    mpx_mod = importlib.import_module("matrixprofile_1_ray.kernels.mpx")

    exact_mp, exact_pi = mpx_self(sampledata, 32)
    limit = mpx_mod._EXACT_SDP_LIMIT
    mpx_mod._EXACT_SDP_LIMIT = 0
    try:
        fft_mp, fft_pi = mpx_self(sampledata, 32)
    finally:
        mpx_mod._EXACT_SDP_LIMIT = limit
    np.testing.assert_almost_equal(exact_mp, fft_mp, decimal=8)
    np.testing.assert_array_equal(exact_pi, fft_pi)
