"""Conformance: SKIMP / PMP utilities / maximum_subsequence / hierarchical
clustering (reference tests/test_skimp.py, test_utils.py,
test_hierarchical_clustering.py)."""

import numpy as np
import pytest

from matrixprofile_1_ray.kernels import (
    binary_split,
    hierarchical_clusters,
    maximum_subsequence,
    mpx,
    pick_mp,
    skimp,
    top_k_discords,
    top_k_motifs,
)


def test_binary_split():
    assert binary_split(1) == [0]
    assert binary_split(10) == [0, 5, 2, 7, 1, 3, 6, 8, 4, 9]
    assert binary_split(7) == [0, 3, 1, 5, 2, 4, 6]


def test_skimp_rows_match_mpx(sampledata):
    windows = [16, 32, 64]
    pmp = skimp(sampledata, windows=windows, sample_pct=1)
    assert pmp["class"] == "PMP"
    assert pmp["pmp"].shape == (3, len(sampledata))
    for row, w in enumerate(windows):
        prof = mpx(sampledata, w)
        np.testing.assert_almost_equal(pmp["pmp"][row, : len(prof["mp"])],
                                       prof["mp"])
        np.testing.assert_array_equal(pmp["pmpi"][row, : len(prof["pi"])],
                                      prof["pi"])
        assert np.isinf(pmp["pmp"][row, len(prof["mp"]) :]).all()


def test_pick_mp(sampledata):
    pmp = skimp(sampledata, windows=[16, 32], sample_pct=1)
    prof = pick_mp(pmp, 32)
    direct = mpx(sampledata, 32)
    np.testing.assert_almost_equal(prof["mp"], direct["mp"])
    assert prof["w"] == 32
    with pytest.raises(RuntimeError):
        pick_mp(pmp, 99)
    with pytest.raises(ValueError):
        pick_mp({"class": "MatrixProfile"}, 32)


def test_pmp_discords_and_motifs(sampledata):
    pmp = skimp(sampledata, windows=[16, 32], sample_pct=1)
    out = top_k_discords(pmp, k=2)
    assert out["discords"].shape[1] == 2  # (row, col) pairs
    out = top_k_motifs(pmp, k=1)
    assert len(out["motifs"]) >= 1
    assert isinstance(out["motifs"][0]["motifs"][0], tuple)


def test_skimp_pmp_obj_reuse(sampledata):
    """Precomputed windows are copied, not recomputed (skimp.py:193-205)."""
    first = skimp(sampledata, windows=[16, 32], sample_pct=1)
    reused = skimp(sampledata, windows=[16, 32, 64], sample_pct=1,
                   pmp_obj=first)
    np.testing.assert_array_equal(reused["pmp"][0], first["pmp"][0])
    direct = skimp(sampledata, windows=[16, 32, 64], sample_pct=1)
    np.testing.assert_array_equal(reused["pmp"], direct["pmp"])


def test_maximum_subsequence(sampledata):
    upper = maximum_subsequence(sampledata, threshold=0.95)
    assert isinstance(upper, (int, np.integer)) and 8 <= upper <= len(sampledata) // 2
    out = maximum_subsequence(sampledata, threshold=0.95, include_pmp=True)
    assert set(out) == {"upper_window", "windows", "pmp", "pmpi"}
    assert out["pmp"].shape[0] == len(out["windows"])


def test_hierarchical_clusters():
    rng = np.random.default_rng(5)
    base_a = rng.normal(size=64)
    base_b = rng.normal(size=64) * 5 + 2
    X = [base_a, base_a + rng.normal(scale=0.01, size=64), base_b,
         base_b + rng.normal(scale=0.01, size=64)]
    out = hierarchical_clusters(X, 16, 2, criterion="maxclust")
    assert out["class"] == "hclusters"
    assert out["assignments"][0] == out["assignments"][1]
    assert out["assignments"][2] == out["assignments"][3]
    assert out["assignments"][0] != out["assignments"][2]
    with pytest.raises(ValueError):
        hierarchical_clusters(X, 16, 2, method="bogus")


def test_reference_positional_signatures_do_not_shift():
    """The reference puts show_progress/n_jobs in POSITIONAL slots; a
    drop-in port that drops them silently shifts every positional call
    (skimp(ts, w, False, True) intending cross_correlation=True would
    bind pmp_obj; maximum_subsequence(ts, 0.98, 0.05, 1) intending
    n_jobs=1 would bind include_pmp and return a dict, not an int)."""
    ts = np.sin(np.linspace(0, 20, 300)) + 0.01 * np.arange(300)
    p = skimp(ts, [8, 10], False, True)     # show_progress, cross_corr
    assert p["metric"] == "pearson"
    u = maximum_subsequence(ts, 0.98, 0.05, 1)   # n_jobs positional
    assert isinstance(u, (int, np.integer))


def test_threshold_pmp_tiny_sample_pct_keeps_doc():
    """sample_pct truncation floors but never to zero windows: the
    reference with last_index == 0 still returns a PMP object for the
    doc (skimp.py:181-185), so the row-based stage must not silently
    drop the doc from its output."""
    import pyarrow as pa

    from matrixprofile_1_ray.stages.pmp import threshold_pmp_batch

    rng = np.random.default_rng(7)
    ts = np.sin(np.linspace(0, 12, 64)) + 0.05 * rng.standard_normal(64)
    batch = pa.table({"doc_id": ["d0"], "source": ["s0"],
                      "tokens": [ts.tolist()]})
    out = threshold_pmp_batch(batch, threshold=0.5, sample_pct=0.01)
    assert out.num_rows >= 1
    assert set(out["doc_id"].to_pylist()) == {"d0"}
