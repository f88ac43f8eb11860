"""Unit tests for the Arrow-native string partition hash
(stages/dedup.py:_hash_str_arrow) — determinism, slice/chunk agreement,
empty-string handling, and partition uniformity."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from matrixprofile_1_ray.stages.dedup import _hash_str_arrow


def test_hash_str_arrow_deterministic_and_distinct():
    a = pa.array(["doc_1", "doc_2", "", "doc_1", "x",
                  "longer_string_here_ok", ""], pa.string())
    h = _hash_str_arrow(a)
    assert h.dtype == np.uint64
    assert h[0] == h[3]          # equal strings hash equal
    assert h[2] == h[6]          # empty strings hash equal
    assert len(set(h.tolist())) == 5
    # stable across calls
    assert (h == _hash_str_arrow(a)).all()


def test_hash_str_arrow_chunked_and_sliced_agree():
    a = pa.array(["doc_1", "doc_2", "", "doc_1", "x",
                  "longer_string_here_ok", ""], pa.string())
    h = _hash_str_arrow(a)
    chunked = pa.chunked_array([a[:3], a[3:]])
    assert (_hash_str_arrow(chunked) == h).all()
    assert (_hash_str_arrow(a.slice(1, 4)) == h[1:5]).all()
    assert _hash_str_arrow(a.slice(0, 0)).shape == (0,)


def test_hash_str_arrow_prefix_and_length_sensitivity():
    # same bytes, different split points must differ ("ab","c" vs "a","bc")
    h = _hash_str_arrow(pa.array(["ab", "c", "a", "bc", "abc", ""]))
    assert len(set(h.tolist())) == 6


def test_hash_str_arrow_partition_uniformity():
    big = pa.array([f"doc_{i:08d}" for i in range(50_000)])
    h = _hash_str_arrow(big)
    assert len(np.unique(h)) > 49_990            # essentially no collisions
    counts = np.bincount((h % np.uint64(16)).astype(np.int64), minlength=16)
    assert counts.min() > 0.8 * counts.max()     # balanced parts
