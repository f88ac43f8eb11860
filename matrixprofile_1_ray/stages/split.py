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

from ..functions.text import (
    _MERSENNE61,
    _mulmod61,
    _pow_table,
    rolling_fingerprint,
)
from ..functions.tokenize import list_column_to_numpy, tokenize_text_column

DEFAULT_RATIOS = (("train", 0.98), ("val", 0.01), ("test", 0.01))
# the polynomial base is rolling_fingerprint's default; the SQL literal in
# split_sql is generated from this same constant so they cannot drift
_BASE = rolling_fingerprint.__defaults__[0]
# final multiplicative scatter ~ M/golden-ratio: the polynomial hash maps
# CONSECUTIVE keys ("u000001", "u000002", ...) to consecutive values, so
# raw fractions cluster; multiplying by a large constant mod M turns each
# run into an equidistributed Weyl-style progression across [0, M)
_SCATTER = 1425194756478658793
_MOD = int(_MERSENNE61)


def split_thresholds(ratios=DEFAULT_RATIOS) -> list:
    """[(name, cumulative_upper_bound)] with the exact float64 partial
    sums BOTH engines must compare against (the last bound is forced to
    1.0 so rounding can never drop a row)."""
    total = float(sum(r for _, r in ratios))
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split ratios must sum to 1, got {total}")
    out, acc = [], 0.0
    for i, (name, r) in enumerate(ratios):
        acc = 1.0 if i == len(ratios) - 1 else acc + float(r)
        out.append((name, acc))
    return out


def keyed_hash_fraction(keys: pa.Array | pa.ChunkedArray,
                        seed: int = 1) -> np.ndarray:
    """Per-key float64 in [0, 1]: seeded Mersenne-61 polynomial hash of
    the key's code points, scattered by one multiplication mod M, divided
    by the modulus — exactly the HUGEINT expression :func:`split_sql`
    replays in DuckDB.  NOTE: although the integer hash is < M, float64
    rounding maps the top ~127 hash values to exactly 1.0, so consumers
    must treat 1.0 as the last bucket (both engines do).  A null key
    hashes like the empty string (zero code points)."""
    if seed <= 0 or seed >= _MOD:
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
    return h.astype(np.float64) / float(_MOD)


def assign_split_batch(batch: pa.Table, ratios=DEFAULT_RATIOS,
                       key: str = "doc_id", seed: int = 1,
                       _bounds=None) -> pa.Table:
    """(key, split) assignment for one batch — vectorized, stateless."""
    keys = batch[key].cast(pa.string())
    frac = keyed_hash_fraction(keys, seed=seed)
    bounds = _bounds if _bounds is not None else split_thresholds(ratios)
    names = np.array([n for n, _ in bounds])
    uppers = np.array([u for _, u in bounds])
    idx = np.searchsorted(uppers, frac, side="right")
    # frac can round to EXACTLY 1.0 (the top ~127 of 2^61 hash values);
    # side="right" then returns len(uppers) — clamp to the last bucket,
    # which is what the SQL CASE's ELSE branch yields for the same row
    idx = np.minimum(idx, len(names) - 1)
    return pa.table({
        key: keys,
        "split": pa.array(names[idx], pa.string()),
    })


def assign_split(ds, ratios=DEFAULT_RATIOS, key: str = "doc_id",
                 seed: int = 1):
    """Attach the deterministic split assignment to a Dataset."""
    bounds = split_thresholds(ratios)   # validate once, not per batch
    return ds.map_batches(
        lambda b: assign_split_batch(b, key=key, seed=seed, _bounds=bounds),
        batch_format="pyarrow")


def hash_sample(ds, rate: float, key: str = "doc_id", seed: int = 2):
    """Deterministic corpus sampling: keep rows whose keyed hash fraction
    falls below ``rate``.  Unlike ``Dataset.random_sample`` the selection
    is stable across runs, cluster sizes and block layouts, and membership
    is recomputable from the key alone — the property a training-data
    ablation needs.  Rate-nested at one seed: sample(0.01) is a subset of
    sample(0.1).

    The default seed (2) is deliberately DIFFERENT from
    :func:`assign_split`'s (1): at a shared seed the two hashes coincide,
    so sampling at rate <= 0.98 and then splitting would put every
    sampled row in 'train' (val/test deterministically empty).  Keep the
    seeds distinct unless that coupling is exactly what you want."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")

    def keep(batch: pa.Table) -> pa.Table:
        # rate == 1.0 keeps EVERY row: `frac < 1.0` alone would drop keys
        # whose hash fraction rounds to exactly 1.0 (the top ~2^7 of 2^61
        # hash values), violating the module convention that frac == 1.0
        # lands in the kept/last bucket (see assign_split_batch's clamp)
        if rate >= 1.0:
            return batch
        frac = keyed_hash_fraction(batch[key].cast(pa.string()), seed=seed)
        return batch.filter(pa.array(frac < rate))

    return ds.map_batches(keep, batch_format="pyarrow")


def split_sql(table: str = "documents", key: str = "doc_id",
              ratios=DEFAULT_RATIOS, seed: int = 1) -> str:
    """The DuckDB replay of :func:`assign_split_batch` (value-hash
    oracle): same hash, same float64 division, same threshold compares.
    ``list_filter(.., c -> c <> '')`` drops the [''] artifact DuckDB's
    ``split('', '')`` produces for empty keys (unicode('') is -1, not a
    code point), and ``coalesce(key, '')`` makes null keys hash like the
    empty string — both matching the engine, which sees zero code points
    in each case.  frac == 1.0 (float64 rounding of the top hash values)
    falls through every WHEN to the ELSE/last bucket, matching the
    engine's clamp."""
    bounds = split_thresholds(ratios)
    if len(bounds) == 1:
        # a CASE with zero WHEN clauses is a DuckDB parser error; a
        # single-ratio split assigns everything to that bucket
        case = f"'{bounds[0][0]}'"
    else:
        case = "CASE\n"
        for name, upper in bounds[:-1]:
            case += f"  WHEN frac < {upper!r} THEN '{name}'\n"
        case += f"  ELSE '{bounds[-1][0]}'\nEND"
    return f"""
WITH h AS (
  SELECT CAST({key} AS VARCHAR) AS {key},
         list_reduce(
           list_prepend({seed}::HUGEINT,
             list_transform(
               list_filter(split(coalesce(CAST({key} AS VARCHAR), ''), ''),
                           c -> c <> ''),
               c -> unicode(c)::HUGEINT)),
           (acc, ch) -> (acc * {_BASE} + ch) % {_MOD}) AS hp
  FROM {table}
), f AS (
  SELECT {key},
         CAST(CAST((hp * {_SCATTER}::HUGEINT) % {_MOD}
                   AS BIGINT) AS DOUBLE)
           / {_MOD}.0 AS frac
  FROM h
)
SELECT {key}, {case} AS split FROM f
"""
