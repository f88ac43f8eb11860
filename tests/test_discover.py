"""Conformance: discords, motifs, regimes, snippets
(reference tests/test_top_k_discords.py, test_top_k_motifs.py,
test_regimes.py, test_snippets.py)."""

import numpy as np
import pytest

from matrixprofile_1_ray.kernels import (
    extract_regimes,
    fluss,
    mpx,
    snippets,
    top_k_discords,
    top_k_motifs,
)


def test_discords_all_same():
    profile = {"mp": np.ones(10), "ez": 2, "w": 4, "class": "MatrixProfile"}
    np.testing.assert_array_equal(top_k_discords(profile)["discords"], [9, 6, 3])


def test_discords_no_exclusion():
    profile = {"mp": np.array([1, 2, 3, 4]), "w": 4, "class": "MatrixProfile"}
    out = top_k_discords(profile, k=3, exclusion_zone=0)["discords"]
    np.testing.assert_array_equal(out, [3, 2, 1])
    out = top_k_discords(profile, k=4, exclusion_zone=0)["discords"]
    np.testing.assert_array_equal(out, [3, 2, 1, 0])
    out = top_k_discords(profile, k=4, exclusion_zone=1)["discords"]
    np.testing.assert_array_equal(out, [3, 1])


def test_discords_requires_profile():
    with pytest.raises(ValueError):
        top_k_discords({"mp": np.ones(4)})


def test_motifs_finds_planted_pair():
    rng = np.random.default_rng(11)
    ts = rng.normal(size=300)
    motif = np.sin(np.linspace(0, 4 * np.pi, 32))
    ts[40:72] += motif * 3
    ts[200:232] += motif * 3
    profile = mpx(ts, 32)
    profile["ez"] = 16
    out = top_k_motifs(profile, k=1)
    pair = out["motifs"][0]["motifs"]
    assert abs(pair[0] - 40) <= 2 and abs(pair[1] - 200) <= 2


def test_regimes_matlab(sampledata):
    profile = mpx(sampledata, 32)
    profile = extract_regimes(profile)
    np.testing.assert_array_equal(profile["regimes"], [759, 423, 583])
    profile = extract_regimes(profile, num_regimes=2)
    np.testing.assert_array_equal(profile["regimes"], [759, 423])


def test_fluss_bounds(sampledata):
    profile = mpx(sampledata, 32)
    cac = fluss(profile)
    assert cac.shape[0] == len(profile["pi"])
    assert (cac >= 0).all() and (cac <= 1).all()
    assert (cac[:32] == 1).all() and (cac[-32:] == 1).all()


def test_snippets_matlab(sampledata):
    result = snippets(sampledata, 64, window_size=32)
    assert result[0]["index"] == 384 and result[1]["index"] == 704
    assert sum(result[0]["neighbors"]) == 191408
    assert sum(result[1]["neighbors"]) == 190967

    result = snippets(sampledata, 64)  # inferred window = size/2
    assert result[0]["index"] == 384 and result[1]["index"] == 704

    result = snippets(sampledata, 128, window_size=32)
    assert result[0]["index"] == 384 and result[1]["index"] == 640
    assert sum(result[0]["neighbors"]) == 227661
    assert sum(result[1]["neighbors"]) == 154714


def test_snippets_validation():
    with pytest.raises(ValueError):
        snippets(np.arange(100.0), 2)
    with pytest.raises(ValueError):
        snippets(np.arange(10.0), 8)
    with pytest.raises(ValueError):
        snippets(np.arange(100.0), 8, window_size=8)


def test_pmp_discord_rows_batch_frozen_ez():
    """The greedy PMP discord pick freezes the exclusion zone from the
    FIRST discord's window and blanks only that window's row (reference
    top_k_discords.py:16-91) — checked end to end through
    pmp_discord_rows_batch against a hand-computed greedy walk."""
    import numpy as np
    import pyarrow as pa

    from matrixprofile_1_ray.stages.profile import (
        mp_rows_small_batch,
        pmp_discord_rows_batch,
    )

    rng = np.random.default_rng(11)
    toks = [rng.integers(0, 50, size=n).tolist() for n in (80, 120, 200)]
    batch = pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(3)], pa.string()),
        "source": pa.array(["s"] * 3, pa.string()),
        "tokens": pa.array(toks, pa.list_(pa.int64())),
    })
    out = pmp_discord_rows_batch(batch, k=2)
    assert len(out) > 0
    df = out.to_pandas()
    for doc, g in df.groupby("doc_id"):
        g = g.sort_values("rank")
        # replay the greedy walk on the same rounded rows
        rows = {}
        for w in (16, 32):
            t = mp_rows_small_batch(batch, w=w)
            tt = t.to_pandas()
            tt = tt[tt["doc_id"] == doc]
            if len(tt):
                rows[w] = tt
        ws = sorted(rows)
        length = max(int(r["idx"].max()) + 1 for r in rows.values())
        mat = np.full((len(ws), length), -np.inf)
        for r, w in enumerate(ws):
            mat[r, rows[w]["idx"].to_numpy()] = rows[w]["mp"].to_numpy()
        picks = []
        ez = None
        for _ in range(2):
            ridx, cidx = np.unravel_index(np.argmax(mat), mat.shape)
            if mat[ridx, cidx] == -np.inf:
                break
            picks.append((ws[ridx], int(cidx)))
            if ez is None:
                ez = ws[ridx] // 2
            mat[ridx, max(0, cidx - ez): cidx + ez] = -np.inf
        got = list(zip(g["window"].tolist(), g["discord_idx"].tolist()))
        assert got == picks, (doc, got, picks)
