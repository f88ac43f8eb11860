"""Deterministic dataset splits (train/val/test) by keyed hash.

A training-data pipeline needs splits that are (a) stable across runs and
cluster sizes, (b) assignable per row with NO shuffle or global pass, and
(c) reproducible by any other engine reading the same corpus.  Random
sampling fails (a) and (c); this stage hashes the split key (doc_id) with
the same seeded Mersenne-61 polynomial the document fingerprints use
(functions/text.py:rolling_fingerprint — SQL-replayable in HUGEINT), maps
it to [0, 1) by one float64 division, and buckets by cumulative ratio
thresholds.  Every step is bit-identical in DuckDB, so the assignment has
a value-hash oracle.

At 100 TB this is one vectorized ``map_batches`` — each block assigns
independently, ratios hold in expectation corpus-wide, and membership of
any row can be recomputed from its key alone (no membership table to
store or ship)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.text import _MERSENNE61, _mulmod61, _pow_table
from ..functions.text import rolling_fingerprint
from ..functions.tokenize import list_column_to_numpy, tokenize_text_column

DEFAULT_RATIOS = (("train", 0.98), ("val", 0.01), ("test", 0.01))
_BASE = 1000003
# final multiplicative scatter ~ M/golden-ratio: the polynomial hash maps
# CONSECUTIVE keys ("u000001", "u000002", ...) to consecutive values, so
# raw fractions cluster; multiplying by a large constant mod M turns each
# run into an equidistributed Weyl-style progression across [0, M)
_SCATTER = 1425194756478658793


def split_thresholds(ratios=DEFAULT_RATIOS) -> list:
    """[(name, cumulative_upper_bound)] with the exact float64 partial
    sums BOTH engines must compare against (the last bound is forced to
    1.0 so rounding can never drop a row)."""
    total = float(sum(r for _, r in ratios))
    if not np.isclose(total, 1.0, atol=1e-9):
        raise ValueError(f"split ratios must sum to 1, got {total}")
    out, acc = [], 0.0
    for i, (name, r) in enumerate(ratios):
        acc = 1.0 if i == len(ratios) - 1 else acc + float(r)
        out.append((name, acc))
    return out


def keyed_hash_fraction(keys: pa.Array | pa.ChunkedArray,
                        seed: int = 1) -> np.ndarray:
    """Per-key float64 in [0, 1): seeded Mersenne-61 polynomial hash of
    the key's code points, scattered by one multiplication mod M, divided
    by the modulus — exactly the HUGEINT expression :func:`split_sql`
    replays in DuckDB."""
    if seed <= 0 or seed >= int(_MERSENNE61):
        raise ValueError("seed must be in (0, 2^61-1)")
    toks = tokenize_text_column(keys)
    values, offsets = list_column_to_numpy(toks)
    h = rolling_fingerprint(values, offsets)
    # fold the seed in as a virtual leading token:
    # h_total = (seed * base^len + h_chars) mod M  ==  Horner with init=seed
    lengths = np.diff(np.asarray(offsets, dtype=np.int64))
    pw = _pow_table(_BASE, int(lengths.max()) + 1 if len(lengths) else 1)
    seeded = _mulmod61(np.full(len(lengths), np.uint64(seed)), pw[lengths])
    h = seeded + h                      # both < 2^61, sum < 2^62: exact
    h = (h & _MERSENNE61) + (h >> np.uint64(61))
    h[h >= _MERSENNE61] -= _MERSENNE61
    h = _mulmod61(h, np.uint64(_SCATTER))
    return h.astype(np.float64) / float(int(_MERSENNE61))


def assign_split_batch(batch: pa.Table, ratios=DEFAULT_RATIOS,
                       key: str = "doc_id", seed: int = 1) -> pa.Table:
    """(key, split) assignment for one batch — vectorized, stateless."""
    frac = keyed_hash_fraction(batch[key].cast(pa.string()), seed=seed)
    bounds = split_thresholds(ratios)
    names = np.array([n for n, _ in bounds])
    uppers = np.array([u for _, u in bounds])
    idx = np.searchsorted(uppers, frac, side="right")
    # frac < 1.0 < uppers[-1] guard: searchsorted can only return len when
    # frac == 1.0, which the modulus division cannot produce
    return pa.table({
        key: batch[key].cast(pa.string()),
        "split": pa.array(names[idx], pa.string()),
    })


def assign_split(ds, ratios=DEFAULT_RATIOS, key: str = "doc_id",
                 seed: int = 1):
    """Attach the deterministic split assignment to a Dataset."""
    return ds.map_batches(
        lambda b: assign_split_batch(b, ratios=ratios, key=key, seed=seed),
        batch_format="pyarrow")


def hash_sample(ds, rate: float, key: str = "doc_id", seed: int = 1):
    """Deterministic corpus sampling: keep rows whose keyed hash fraction
    falls below ``rate``.  Unlike ``Dataset.random_sample`` the selection
    is stable across runs, cluster sizes and block layouts, and membership
    is recomputable from the key alone — the property a training-data
    ablation needs.  Same hash as :func:`assign_split`, so a sample at
    rate r is a PREFIX property: sample(0.01) is a subset of sample(0.1)
    at the same seed."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")

    def keep(batch: pa.Table) -> pa.Table:
        frac = keyed_hash_fraction(batch[key].cast(pa.string()), seed=seed)
        return batch.filter(pa.array(frac < rate))

    return ds.map_batches(keep, batch_format="pyarrow")


def split_sql(table: str = "documents", key: str = "doc_id",
              ratios=DEFAULT_RATIOS, seed: int = 1) -> str:
    """The DuckDB replay of :func:`assign_split_batch` (value-hash
    oracle): same hash, same float64 division, same threshold compares."""
    bounds = split_thresholds(ratios)
    case = "CASE\n"
    for name, upper in bounds[:-1]:
        case += f"  WHEN frac < {upper!r} THEN '{name}'\n"
    case += f"  ELSE '{bounds[-1][0]}'\nEND"
    return f"""
WITH h AS (
  SELECT CAST({key} AS VARCHAR) AS {key},
         list_reduce(
           list_prepend({seed}::HUGEINT,
             list_transform(split(CAST({key} AS VARCHAR), ''),
                            c -> unicode(c)::HUGEINT)),
           (acc, ch) -> (acc * 1000003 + ch) % 2305843009213693951) AS hp
  FROM {table}
), f AS (
  SELECT {key},
         CAST(CAST((hp * {_SCATTER}::HUGEINT) % 2305843009213693951
                   AS BIGINT) AS DOUBLE)
           / 2305843009213693951.0 AS frac
  FROM h
)
SELECT {key}, {case} AS split FROM f
"""
