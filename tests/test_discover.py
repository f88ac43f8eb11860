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
