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
    # segment_counts IS separator-count + 1 by construction (empty rows:
    # 1 segment, 0 separators), so the separator count needs no second
    # O(total_tokens) cumsum pass
    n_spaces = n_words - 1
    avg_word_len = (n_chars - n_spaces) / n_words
    return n_chars, n_words, avg_word_len


_MERSENNE61 = np.uint64((1 << 61) - 1)
_POW_CACHE: dict = {}


def _mulmod61(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized (a*b) mod (2^61-1) for uint64 operands < 2^61.

    Schoolbook 32-bit split; every intermediate fits uint64 because
    p = 2^61-1 is Mersenne (2^61 === 1, 2^64 === 8 mod p)."""
    M = _MERSENNE61
    mask32 = np.uint64(0xFFFFFFFF)
    ah, al = a >> np.uint64(32), a & mask32          # ah < 2^29
    bh, bl = b >> np.uint64(32), b & mask32
    top = ah * bh * np.uint64(8)                      # *2^64 === *8; < 2^61
    mid = ah * bl + al * bh                           # < 2^62
    mid = (mid & M) + (mid >> np.uint64(61))          # < 2^61 + 2
    # mid * 2^32: split at 29 bits so the high part lands on 2^61 === 1
    mh, ml = mid >> np.uint64(29), mid & np.uint64((1 << 29) - 1)
    low = al * bl                                     # < 2^64
    low = (low & M) + (low >> np.uint64(61))
    s = top + mh + (ml << np.uint64(32)) + low        # < 4p, fits uint64
    s = (s & M) + (s >> np.uint64(61))
    s[s >= M] -= M
    return s


def _pow_table(base: int, n: int) -> np.ndarray:
    """base^k mod (2^61-1) for k in [0, n) — built by vectorized doubling
    (log2(n) _mulmod61 calls), cached and grown across calls."""
    cached = _POW_CACHE.get(base)
    if cached is not None and cached.shape[0] >= n:
        return cached
    pw = cached if cached is not None else np.array(
        [1, base % ((1 << 61) - 1)], dtype=np.uint64)
    while pw.shape[0] < n:
        pw = np.concatenate([pw, _mulmod61(pw, np.uint64(int(pw[-1])
                                                         * int(pw[1])
                                                         % ((1 << 61) - 1)))])
    _POW_CACHE[base] = pw
    return pw


def rolling_fingerprint(values: np.ndarray, offsets: np.ndarray,
                        base: int = 1000003, mod: int = (1 << 61) - 1) -> np.ndarray:
    """Per-row polynomial rolling hash of the token stream (document
    fingerprint): h = sum_j v[j] * base^(L-1-j) mod (2^61-1), identical to
    per-row Horner but fully vectorized — a power table built by doubling,
    one _mulmod61 over the flat values, and 32-bit-split segment sums via
    add.reduceat (no per-token Python; the round-1 Horner loop was the
    bench's worst stage)."""
    assert mod == (1 << 61) - 1, "vectorized path is specialized to 2^61-1"
    n_rows = len(offsets) - 1
    out = np.zeros(n_rows, dtype=np.uint64)
    total = int(offsets[-1])
    if total == 0 or n_rows == 0:
        return out
    offsets = np.asarray(offsets, dtype=np.int64)
    lengths = np.diff(offsets)
    pw = _pow_table(base, int(lengths.max()))

    # exponent of position t in row i: (row_end_i - 1) - t
    ends_rep = np.repeat(offsets[1:], lengths)
    exps = ends_rep - 1 - np.arange(total, dtype=np.int64)
    v = values.astype(np.uint64)
    v = (v & _MERSENNE61) + (v >> np.uint64(61))
    v[v >= _MERSENNE61] -= _MERSENNE61
    terms = _mulmod61(v, pw[exps])

    # segment sums without uint64 overflow: sum the 32-bit halves separately
    # (sum_lo < L*2^32, sum_hi < L*2^29 — safe to L ~ 2^30 tokens/row)
    nonempty = lengths > 0
    starts = offsets[:-1][nonempty]
    lo = np.add.reduceat(terms & np.uint64(0xFFFFFFFF), starts)
    hi = np.add.reduceat(terms >> np.uint64(32), starts)
    # recombine hi*2^32 + lo mod p: hi < 2^52, split at 29 bits again
    hh, hl = hi >> np.uint64(29), hi & np.uint64((1 << 29) - 1)
    s = hh + (hl << np.uint64(32)) + (lo & _MERSENNE61) + (lo >> np.uint64(61))
    s = (s & _MERSENNE61) + (s >> np.uint64(61))
    s[s >= _MERSENNE61] -= _MERSENNE61
    out[nonempty] = s
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
