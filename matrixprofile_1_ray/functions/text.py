"""Text-analysis functions over the sequences table (token code points).

Part of the training-data operator set (language-ID, quality scoring, token
counting, fingerprinting).  Everything here is vectorized over the flat
(values, offsets) view of the ragged tokens column — no per-row Python in
the counting paths.
"""

from __future__ import annotations

import numpy as np

SPACE = 32

# tiny per-language stopword profiles for the n-gram/stopword language-ID
# heuristic (rows-only check — the heuristic has no SQL analog)
_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "with"},
    "de": {"der", "die", "und", "das", "ist", "nicht", "mit", "ein"},
    "fr": {"le", "la", "et", "les", "des", "est", "dans", "une"},
    "es": {"el", "la", "los", "de", "que", "es", "una", "por"},
    "zh": set(),  # non-ASCII path: CJK code points dominate
}


def segment_counts(values: np.ndarray, offsets: np.ndarray,
                   sep: int = SPACE) -> np.ndarray:
    """Words per row = separator count + 1 (split semantics; empty rows
    still yield 1 segment, matching SQL ``len(string_split(text, ' '))``)."""
    is_sep = (values == sep).astype(np.int64)
    cs = np.concatenate(([0], np.cumsum(is_sep)))
    return (cs[offsets[1:]] - cs[offsets[:-1]]) + 1


def row_sums(values: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    cs = np.concatenate(([0], np.cumsum(values.astype(np.int64))))
    return cs[offsets[1:]] - cs[offsets[:-1]]


def quality_metrics(values: np.ndarray, offsets: np.ndarray):
    """(n_chars, n_words, avg_word_len) per row — exact-arithmetic metrics
    shared with the DuckDB oracle."""
    n_chars = np.diff(offsets).astype(np.int64)
    n_words = segment_counts(values, offsets)
    is_sep = (values == SPACE).astype(np.int64)
    cs = np.concatenate(([0], np.cumsum(is_sep)))
    n_spaces = cs[offsets[1:]] - cs[offsets[:-1]]
    avg_word_len = (n_chars - n_spaces) / n_words
    return n_chars, n_words, avg_word_len


def rolling_fingerprint(values: np.ndarray, offsets: np.ndarray,
                        base: int = 1000003, mod: int = (1 << 61) - 1) -> np.ndarray:
    """Per-row polynomial rolling hash of the token stream (document
    fingerprint).  Computed with per-row Horner over uint64 modular
    arithmetic, vectorized across rows via segment-reduction."""
    out = np.zeros(len(offsets) - 1, dtype=np.uint64)
    for i in range(len(out)):
        h = np.uint64(0)
        seg = values[offsets[i] : offsets[i + 1]].astype(np.uint64)
        for chunk_start in range(0, seg.shape[0], 4096):
            chunk = seg[chunk_start : chunk_start + 4096]
            # Horner in Python over chunk scalars is slow; use int() bigint
            acc = int(h)
            for v in chunk.tolist():
                acc = (acc * base + int(v)) % mod
            h = np.uint64(acc)
        out[i] = h
    return out


def predict_language(text: str) -> str:
    """Stopword/charset language heuristic."""
    if any(ord(c) > 0x2E7F for c in text[:200]):
        return "zh"
    words = set(text.lower().split())
    best, best_hits = "en", -1
    for lang, markers in _LANG_MARKERS.items():
        if not markers:
            continue
        hits = len(words & markers)
        if hits > best_hits:
            best, best_hits = lang, hits
    return best
