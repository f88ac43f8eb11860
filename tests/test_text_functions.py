"""Text-analysis kernels: pinned fingerprint vectors (the vectorized
Mersenne-61 path must stay byte-identical to per-row Horner) and
counting-metric brute-force cross-checks."""

import numpy as np

from matrixprofile_1_ray.functions.text import (
    quality_metrics,
    rolling_fingerprint,
    segment_counts,
)

_MOD = (1 << 61) - 1
_BASE = 1000003


def _horner(seg) -> int:
    acc = 0
    for v in seg.tolist():
        acc = (acc * _BASE + int(v)) % _MOD
    return acc


def test_fingerprint_pinned_vectors():
    """Pinned against the round-1 per-token Horner implementation."""
    rng = np.random.default_rng(42)
    lens = [0, 1, 2, 5, 100, 4096, 5000]
    vals = np.concatenate(
        [rng.integers(0, 1_000_000, size=L) for L in lens]).astype(np.int64)
    offs = np.concatenate(([0], np.cumsum(lens))).astype(np.int64)
    out = rolling_fingerprint(vals, offs)
    assert list(out) == [0, 89250, 773958976439, 19189974007295928,
                         1341034246720230403, 1079730738656978446,
                         1028225451691006613]

    text = "the quick brown fox"
    arr = np.array([ord(c) for c in text], dtype=np.int64)
    assert list(rolling_fingerprint(arr, np.array([0, len(arr)]))) == \
        [1741865778403228446]


def test_fingerprint_matches_horner_random():
    for seed in range(4):
        rng = np.random.default_rng(seed)
        lens = rng.integers(0, 60, size=25)
        vals = rng.integers(0, 2**31, size=int(lens.sum()))
        offs = np.concatenate(([0], np.cumsum(lens)))
        got = rolling_fingerprint(vals, offs)
        for i in range(len(lens)):
            assert int(got[i]) == _horner(vals[offs[i]:offs[i + 1]]), (seed, i)


def test_fingerprint_empty_and_trailing_empty_rows():
    vals = np.array([7, 8], dtype=np.int64)
    offs = np.array([0, 0, 2, 2, 2])  # empty, [7,8], empty, empty (at end)
    got = rolling_fingerprint(vals, offs)
    assert got[0] == 0 and got[2] == 0 and got[3] == 0
    assert int(got[1]) == _horner(vals)


def test_segment_and_quality_counts():
    text = "ab cd e"
    vals = np.array([ord(c) for c in text])
    offs = np.array([0, len(vals)])
    assert segment_counts(vals, offs)[0] == 3
    n_chars, n_words, avg = quality_metrics(vals, offs)
    assert n_chars[0] == 7 and n_words[0] == 3
    assert avg[0] == (7 - 2) / 3
