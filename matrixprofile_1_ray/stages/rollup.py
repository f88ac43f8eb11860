"""Retention-tier rollups: raw -> 1m -> 1h -> 1d continuous aggregates.

Token index = time (SURVEY.md §2.11): tier buckets are non-overlapping index
ranges over the token stream (60 / 3600 / 86400 tokens at the
1-token-per-second interpretation).  Bucket statistics reuse the reference's
``moving_*`` semantics evaluated on disjoint buckets (reference
core.py:282-394); the matrix-profile bucket stats (min distance + argmin
profile index) have no reference analog and are mandated by the north rule.

Because each input row carries a complete series, the whole rollup is a
single vectorized ``map_batches`` — no shuffle.  The chunked-long-series
path (series split across rows) goes through state/chunked.py, which
pre-aggregates per chunk with these same functions and min/merges partial
buckets under ``groupby(doc_id)``.

The entire batch is reduced with ``np.ufunc.reduceat`` over one flat value
array — no Python loop over rows or buckets.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.tokenize import list_column_to_numpy

TIERS = {"1m": 60, "1h": 3600, "1d": 86400}


def _bucket_layout(lengths: np.ndarray, bucket: int):
    """reduceat segment starts + per-row bucket counts for one tier."""
    n_buckets = (lengths + bucket - 1) // bucket
    total = int(n_buckets.sum())
    row_of_bucket = np.repeat(np.arange(len(lengths)), n_buckets)
    # bucket index within each row: global arange minus each row's first slot
    first_slot = np.concatenate(([0], np.cumsum(n_buckets)))[:-1]
    bucket_idx = np.arange(total) - np.repeat(first_slot, n_buckets)
    return row_of_bucket, bucket_idx, n_buckets


def bucket_reduce(values: np.ndarray, offsets: np.ndarray, bucket: int):
    """Vectorized per-bucket (min, max, sum, count, argmin) across a ragged
    batch.  ``argmin`` is the index *within the row* of the first minimum."""
    lengths = np.diff(offsets)
    row_of_bucket, bucket_idx, n_buckets = _bucket_layout(lengths, bucket)
    starts = (offsets[row_of_bucket] + bucket_idx * bucket).astype(np.int64)

    if values.size == 0 or starts.size == 0:
        z = np.empty(0)
        return row_of_bucket, bucket_idx, z, z, z, z.astype(np.int64), z.astype(np.int64)

    mins = np.minimum.reduceat(values, starts)
    maxs = np.maximum.reduceat(values, starts)
    sums = np.add.reduceat(values.astype("d"), starts)
    ends = np.minimum(starts + bucket,
                      np.repeat(offsets[1:], n_buckets)).astype(np.int64)
    counts = ends - starts

    # first-argmin per bucket: positions matching the bucket min, reduced
    bucket_of_pos = np.repeat(np.arange(len(starts)), counts)
    pos = np.arange(values.shape[0])
    is_min = values == mins[bucket_of_pos]
    pos_or_big = np.where(is_min, pos, np.iinfo(np.int64).max)
    argmin_flat = np.minimum.reduceat(pos_or_big, starts)
    argmin_in_row = argmin_flat - offsets[row_of_bucket]
    # a bucket containing NaN has a NaN min (minimum propagates NaN) and
    # therefore NO position equal to it — the reduce then returns
    # int64-max minus the row offset, a plausible-looking garbage index;
    # pin the sentinel -1 instead (the min/max/sum columns surface the
    # NaN, the argmin must not invent a location)
    nan_min = np.isnan(mins)
    if nan_min.any():
        argmin_in_row = np.where(nan_min, np.int64(-1), argmin_in_row)

    return row_of_bucket, bucket_idx, mins, maxs, sums, counts, argmin_in_row


def rollup_batch(batch: pa.Table, tiers=None,
                 value_col: str = "tokens") -> pa.Table:
    """sequences batch -> long-format tier rollups (one row per
    doc × tier × bucket) with SQL-matching column names."""
    tiers = tiers or TIERS
    values, offsets = list_column_to_numpy(batch[value_col])
    values = values.astype("d")
    doc_ids = batch["doc_id"]
    sources = batch["source"]

    parts = []
    for tier_name, bucket in tiers.items():
        row_of_bucket, bucket_idx, mins, maxs, sums, counts, _ = \
            bucket_reduce(values, offsets, bucket)
        parts.append(pa.table({
            "doc_id": doc_ids.take(pa.array(row_of_bucket, pa.int64())),
            "source": sources.take(pa.array(row_of_bucket, pa.int64())),
            "tier": pa.array([tier_name] * len(bucket_idx), pa.string()),
            "bucket": pa.array(bucket_idx, pa.int64()),
            "t_min": pa.array(mins, pa.float64()),
            "t_max": pa.array(maxs, pa.float64()),
            "t_sum": pa.array(sums, pa.float64()),
            "t_count": pa.array(counts, pa.int64()),
            "t_mean": pa.array(sums / counts, pa.float64()),
        }))
    return pa.concat_tables(parts)


def mp_rollup_batch(batch: pa.Table, tiers=None) -> pa.Table:
    """profiles batch -> tier rollups over the matrix-profile column:
    per-bucket min distance and the (row-local) argmin profile index."""
    tiers = tiers or TIERS
    batch = batch.filter(batch["valid"])
    values, offsets = list_column_to_numpy(batch["mp"])
    values = values.astype("d")

    parts = []
    for tier_name, bucket in tiers.items():
        row_of_bucket, bucket_idx, mins, _maxs, sums, counts, argmins = \
            bucket_reduce(values, offsets, bucket)
        take = pa.array(row_of_bucket, pa.int64())
        parts.append(pa.table({
            "doc_id": batch["doc_id"].take(take),
            "source": batch["source"].take(take),
            "w": batch["w"].take(take),
            "tier": pa.array([tier_name] * len(bucket_idx), pa.string()),
            "bucket": pa.array(bucket_idx, pa.int64()),
            "mp_min": pa.array(mins, pa.float64()),
            "mp_mean": pa.array(sums / counts, pa.float64()),
            "mp_count": pa.array(counts, pa.int64()),
            "mp_argmin": pa.array(argmins, pa.int64()),
        }))
    return pa.concat_tables(parts)


def rollup_stage(ds, tiers=None, value_col: str = "tokens",
                 batch_size: int = 1024):
    return ds.map_batches(
        lambda b: rollup_batch(b, tiers=tiers, value_col=value_col),
        batch_format="pyarrow", batch_size=batch_size,
    )
