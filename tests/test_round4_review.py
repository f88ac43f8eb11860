"""Round-4 kernel/state review fixes, each pinned by a regression test."""

import numpy as np
import pytest


def _serial_reference_walk(ts, w):
    """Literal transcription of the reference's ascending-offset diagonal
    walk (cympx.pyx:83-101): per offset, row update THEN column update,
    both strict > — the tie-break oracle for the vectorized paths."""
    from matrixprofile_1_ray.kernels.moving_stats import muinvn
    from matrixprofile_1_ray.kernels.mpx import _diff_eqs

    ts = np.asarray(ts, dtype="d")
    n = ts.shape[0]
    pl = n - w + 1
    mu, sig = muinvn(ts, w)
    df, dg = _diff_eqs(ts, mu, w)
    minlag = int(np.ceil(w / 4.0))
    mp = np.full(pl, -1.0)
    mpi = np.full(pl, -1, dtype=np.int64)
    for diag in range(minlag + 1, pl):
        c = np.sum((ts[diag : diag + w] - mu[diag]) * (ts[:w] - mu[0]))
        for offset in range(n - w - diag + 1):
            col = offset + diag
            if offset:
                c = c + df[offset] * dg[col] + df[col] * dg[offset]
            c_cmp = c * sig[offset] * sig[col]
            if c_cmp > mp[offset]:
                mp[offset] = c_cmp
                mpi[offset] = col
            if c_cmp > mp[col]:
                if c_cmp > 1.0:
                    c_cmp = 1.0
                mp[col] = c_cmp
                mpi[col] = offset
    return mp, mpi


def test_numpy_diag_walk_matches_reference_tie_order():
    """On an exactly periodic series every window has multiple perfect
    (corr == 1) neighbors; the reference's offset order makes the SMALLER
    index win those ties.  The vectorized walk must agree (it updated the
    row side first, handing ties to the larger neighbor)."""
    from matrixprofile_1_ray.kernels.moving_stats import muinvn
    from matrixprofile_1_ray.kernels.mpx import (
        _diff_eqs,
        _seed_products,
        mpx_diag_range,
    )

    w = 8
    pattern = np.array([0.0, 2.0, 1.0, 4.0, 3.0, 6.0, 5.0, 7.0])
    ts = np.tile(pattern, 12)  # n=96, many exact-tie neighbors
    pl = ts.shape[0] - w + 1
    mu, sig = muinvn(ts, w)
    df, dg = _diff_eqs(ts, mu, w)
    seed = _seed_products(ts, ts[:w]) - w * mu * mu[0]
    minlag = int(np.ceil(w / 4.0))

    mp = np.full(pl, -1.0)
    mpi = np.full(pl, -1, dtype=np.int64)
    mpx_diag_range(minlag + 1, pl, seed, df, dg, sig, mp, mpi)

    ref_mp, ref_mpi = _serial_reference_walk(ts, w)
    np.testing.assert_allclose(np.minimum(mp, 1.0),
                               np.minimum(ref_mp, 1.0), atol=1e-12)
    np.testing.assert_array_equal(mpi, ref_mpi)


def test_distributed_stomp_skips_nan_windows_like_serial():
    """Skip locations must come from the RAW series (before the NaN
    zero-fill), exactly as kernels.stomp.stomp orders it — otherwise
    zero-filled windows contribute spurious distances."""
    from matrixprofile_1_ray.kernels.stomp import stomp
    from matrixprofile_1_ray.state.chunked import distributed_stomp

    rng = np.random.default_rng(5)
    ts = rng.uniform(size=400)
    ts[120:125] = np.nan
    ts[300] = np.inf
    w = 16
    serial = stomp(ts.copy(), w)
    # partition invariance must hold on NaN-bearing series too: the
    # rolling state now advances exactly through skipped windows, so any
    # range batching yields the same (exact) distances
    for n_ranges in (2, 5):
        alt = stomp(ts.copy(), w, n_ranges=n_ranges)
        np.testing.assert_allclose(alt["mp"], serial["mp"], atol=1e-9)
        np.testing.assert_array_equal(alt["pi"], serial["pi"])
    dist = distributed_stomp(ts.copy(), w, n_partitions=4)
    np.testing.assert_allclose(dist["mp"], serial["mp"], atol=1e-9)
    np.testing.assert_array_equal(dist["pi"], serial["pi"])
    np.testing.assert_allclose(dist["lmp"], serial["lmp"], atol=1e-9)
    np.testing.assert_allclose(dist["rmp"], serial["rmp"], atol=1e-9)


def test_tiled_diagonal_skip_is_exact():
    """Skipping the mirror pass on merged diagonal tiles must not change
    anything: the merged one-pass partials equal the merged two-pass
    partials exactly, and the end-to-end tiled join still matches the
    untiled kernel (exactly on generic data; tie-heavy periodic data is
    checked on values, since tie WINNERS legitimately differ between
    decompositions)."""
    from matrixprofile_1_ray.kernels.mpx import (
        merge_tile_partial,
        mpx_self,
        tile_pair_partials,
        tiled_mpx_self,
    )

    rng = np.random.default_rng(11)

    # direct invariant: one diagonal tile, skip vs no-skip, merged equal
    strip = np.tile(rng.uniform(size=25), 8)  # tie-heavy on purpose
    w = 16
    pl = strip.shape[0] - w + 1
    minlag = int(np.ceil(w / 4.0))
    merged = {}
    for flag in (True, False):
        mp = np.full(pl, -1.0)
        mpi = np.full(pl, -1, dtype=np.int64)
        mp_a, mpi_a, mp_b, mpi_b = tile_pair_partials(
            strip, strip, w, delta=0, minlag=minlag, merged_tile=flag)
        merge_tile_partial(mp, mpi, 0, pl, mp_a, mpi_a, 0)
        merge_tile_partial(mp, mpi, 0, pl, mp_b, mpi_b, 0)
        merged[flag] = (mp, mpi)
    np.testing.assert_array_equal(merged[True][0], merged[False][0])
    np.testing.assert_array_equal(merged[True][1], merged[False][1])

    # end-to-end: exact on generic data
    series = rng.uniform(size=500)
    mp_ref, mpi_ref = mpx_self(series, w)
    mp_t, mpi_t = tiled_mpx_self(series, w, tile=120)
    np.testing.assert_allclose(mp_t, mp_ref, atol=1e-9)
    np.testing.assert_array_equal(mpi_t, mpi_ref)

    # tie-heavy: values agree to snap tolerance, indices stay valid
    per = np.tile(rng.uniform(size=25), 20)
    mp_ref, _ = mpx_self(per, w)
    mp_t, mpi_t = tiled_mpx_self(per, w, tile=120)
    np.testing.assert_allclose(mp_t, mp_ref, atol=1e-6)
    assert (mpi_t >= 0).all() and (mpi_t < mp_t.shape[0]).all()


def test_ab_self_identical_strips_keep_both_sides():
    """An AB join of a series WITH ITSELF keeps the two sides as separate
    outputs — the diagonal-tile skip must not fire there (it only applies
    when the caller merges both sides into one profile)."""
    from matrixprofile_1_ray.kernels.mpx import mpx_ab, tiled_mpx_ab

    rng = np.random.default_rng(3)
    ts = rng.uniform(size=300)
    w = 16
    ref = mpx_ab(ts, ts, w)
    tiled = tiled_mpx_ab(ts, ts, w, tile=100)
    for a, b in zip(tiled, ref):
        np.testing.assert_allclose(a, b, atol=1e-9)


def test_fcluster_monocrit_uses_provided_vector():
    from matrixprofile_1_ray.kernels.linkage import fcluster, linkage

    # 4 points on a line -> 3 links
    y = np.array([1.0, 3.0, 7.0, 2.0, 6.0, 4.0])  # condensed 4x4
    Z = linkage(y, method="single")
    with pytest.raises(ValueError, match="monocrit"):
        fcluster(Z, 0.5, criterion="monocrit")
    mono = np.array([0.0, 0.0, 99.0])  # forbid only the last merge
    T = fcluster(Z, 0.5, criterion="monocrit", monocrit=mono)
    assert len(set(T)) == 2
    mono_all = np.zeros(Z.shape[0])
    T1 = fcluster(Z, 0.5, criterion="monocrit", monocrit=mono_all)
    assert len(set(T1)) == 1


def test_run_partitioned_cleans_orphan_tmp_dirs(ray_session, tmp_path):
    import os

    import pyarrow as pa
    import ray.data

    from matrixprofile_1_ray.state.manifest import run_partitioned

    out = str(tmp_path / "out")
    os.makedirs(os.path.join(out, "p0.tmp-999-888"))  # crashed-run orphan
    open(os.path.join(out, "p0.tmp-999-888", "junk.parquet"), "w").close()

    def make(key):
        return ray.data.from_arrow(pa.table({"x": pa.array([1, 2])}))

    status = run_partitioned(out, {"p0": "fp0"}, make)
    assert status == {"p0": "done"}
    leftovers = [n for n in os.listdir(out) if ".tmp-" in n]
    assert leftovers == []
