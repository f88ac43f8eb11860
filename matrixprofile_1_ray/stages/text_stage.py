"""Text-analysis stages over the sequences table: quality metrics, token
counts, language ID, document fingerprints, and per-doc global / moving
statistics."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.text import (
    predict_language,
    quality_metrics,
    rolling_fingerprint,
    segment_counts,
    row_sums,
)
from ..functions.tokenize import detokenize, list_column_to_numpy
from ..kernels.moving_stats import moving_avg_std, moving_max, moving_min


def sequences_meta_batch(batch: pa.Table) -> pa.Table:
    """Tokenizer-verification projection: per-doc first/last/sum of tokens.
    Exact-integer arithmetic -> bitwise-stable against the DuckDB oracle."""
    values, offsets = list_column_to_numpy(batch["tokens"])
    lengths = np.diff(offsets)
    if values.size:
        first = np.where(lengths > 0,
                         values[np.minimum(offsets[:-1], values.size - 1)], -1)
        last = np.where(lengths > 0, values[np.maximum(offsets[1:] - 1, 0)], -1)
    else:
        # a block of only zero-token docs: any fancy-index into the empty
        # values array would raise, even with clamped indices
        first = np.full(len(lengths), -1, dtype=np.int64)
        last = first
    return pa.table({
        "doc_id": batch["doc_id"],
        "source": batch["source"],
        "n_tok": pa.array(lengths, pa.int64()),
        "tok_sum": pa.array(row_sums(values, offsets), pa.int64()),
        "tok_first": pa.array(first.astype(np.int64)),
        "tok_last": pa.array(last.astype(np.int64)),
    })


def quality_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, n_chars, n_words, avg_word_len) quality metrics."""
    values, offsets = list_column_to_numpy(batch["tokens"])
    n_chars, n_words, avg_word_len = quality_metrics(values, offsets)
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_chars": pa.array(n_chars, pa.int64()),
        "n_words": pa.array(n_words, pa.int64()),
        "avg_word_len": pa.array(avg_word_len, pa.float64()),
    })


def langid_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, lang_pred) — stopword/charset heuristic (rows-only check)."""
    values, offsets = list_column_to_numpy(batch["tokens"])
    preds = [predict_language(detokenize(values[offsets[i] : offsets[i + 1]]))
             for i in range(len(batch))]
    return pa.table({
        "doc_id": batch["doc_id"],
        "lang_pred": pa.array(preds, pa.string()),
    })


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, fingerprint) rolling-hash document fingerprints.
    Values live in [0, 2^61-1) so int64 is lossless — kept signed for
    DuckDB-oracle parity (HUGEINT arithmetic casts to BIGINT)."""
    values, offsets = list_column_to_numpy(batch["tokens"])
    fp = rolling_fingerprint(values, offsets)
    return pa.table({
        "doc_id": batch["doc_id"],
        "fingerprint": pa.array(fp.astype(np.int64), pa.int64()),
    })


def doc_stats_batch(batch: pa.Table) -> pa.Table:
    """Per-doc global statistics (reference statistics.py:76-90 flattened);
    min/max/sum/count/mean/median are exact-integer-derived, so they hash
    identically to the SQL oracle."""
    values, offsets = list_column_to_numpy(batch["tokens"])
    fvals = values.astype("d")
    lengths = np.diff(offsets)
    sums = row_sums(values, offsets)
    mins = np.minimum.reduceat(fvals, offsets[:-1][lengths > 0])
    maxs = np.maximum.reduceat(fvals, offsets[:-1][lengths > 0])
    medians = np.array([np.median(fvals[offsets[i] : offsets[i + 1]])
                        for i in range(len(batch)) if lengths[i] > 0])
    keep = lengths > 0
    take = pa.array(np.flatnonzero(keep), pa.int64())
    return pa.table({
        "doc_id": batch["doc_id"].take(take),
        "source": batch["source"].take(take),
        "t_count": pa.array(lengths[keep], pa.int64()),
        "t_min": pa.array(mins, pa.float64()),
        "t_max": pa.array(maxs, pa.float64()),
        "t_sum": pa.array(sums[keep].astype("d"), pa.float64()),
        "t_mean": pa.array(sums[keep] / lengths[keep], pa.float64()),
        "t_median": pa.array(medians, pa.float64()),
    })


def moving_stats_batch(batch: pa.Table, window: int = 8) -> pa.Table:
    """Long-format moving min/max/mean per doc (window = ``window`` tokens,
    reference core.py:282-337 semantics) — SQL-expressible as window
    functions over the unnested stream."""
    values, offsets = list_column_to_numpy(batch["tokens"])
    doc_rows, idxs, mmins, mmaxs, mmeans = [], [], [], [], []
    for i in range(len(batch)):
        seg = values[offsets[i] : offsets[i + 1]].astype("d")
        if seg.shape[0] < window:
            continue
        mmins.append(moving_min(seg, window))
        mmaxs.append(moving_max(seg, window))
        # exact integer mean: windowed integer sum / window
        csum = np.concatenate(([0], np.cumsum(seg.astype(np.int64))))
        mmeans.append((csum[window:] - csum[: seg.shape[0] - window + 1]) / window)
        k = seg.shape[0] - window + 1
        doc_rows.append(np.full(k, i, dtype=np.int64))
        idxs.append(np.arange(k, dtype=np.int64))
    if not doc_rows:
        return pa.table({"doc_id": pa.array([], pa.string()),
                         "idx": pa.array([], pa.int64()),
                         "mov_min": pa.array([], pa.float64()),
                         "mov_max": pa.array([], pa.float64()),
                         "mov_mean": pa.array([], pa.float64())})
    take = pa.array(np.concatenate(doc_rows), pa.int64())
    return pa.table({
        "doc_id": batch["doc_id"].take(take),
        "idx": pa.array(np.concatenate(idxs), pa.int64()),
        "mov_min": pa.array(np.concatenate(mmins), pa.float64()),
        "mov_max": pa.array(np.concatenate(mmaxs), pa.float64()),
        "mov_mean": pa.array(np.concatenate(mmeans), pa.float64()),
    })


def per_source_partials_batch(batch: pa.Table) -> pa.Table:
    """Per-batch combiner for the per-source aggregate: one partial row per
    source per batch, so the ``groupby("source")`` shuffle moves O(sources)
    rows per block instead of every document.  This pre-aggregation is what
    makes the Zipf-hot source keys harmless — the classic alternative is
    salting the key (source + hash(doc_id)%S) and de-salting in a second
    aggregate, which this combiner strictly dominates for algebraic stats."""
    values, offsets = list_column_to_numpy(batch["tokens"])
    sums = row_sums(values, offsets)
    lengths = np.diff(offsets).astype(np.int64)
    fvals = values.astype("d")
    nonempty = lengths > 0
    mins = np.full(len(lengths), np.inf)
    maxs = np.full(len(lengths), -np.inf)
    if nonempty.any():
        mins[nonempty] = np.minimum.reduceat(fvals, offsets[:-1][nonempty])
        maxs[nonempty] = np.maximum.reduceat(fvals, offsets[:-1][nonempty])

    import pandas as pd

    df = pd.DataFrame({
        "source": batch["source"].to_pylist(),
        "n_docs": 1,
        "n_tokens": lengths,
        "tok_sum": sums,
        "tok_min": mins,
        "tok_max": maxs,
    })
    g = df.groupby("source", as_index=False).agg(
        n_docs=("n_docs", "sum"), n_tokens=("n_tokens", "sum"),
        tok_sum=("tok_sum", "sum"), tok_min=("tok_min", "min"),
        tok_max=("tok_max", "max"))
    # explicit schema: a 0-row batch would otherwise infer source: null
    # (pandas empty object column) and hand the groupby shuffle blocks
    # with divergent schemas
    return pa.Table.from_pandas(g, preserve_index=False, schema=pa.schema([
        ("source", pa.string()), ("n_docs", pa.int64()),
        ("n_tokens", pa.int64()), ("tok_sum", pa.int64()),
        ("tok_min", pa.float64()), ("tok_max", pa.float64())]))


def per_source_stats(ds):
    """-> (source, n_docs, n_tokens, tok_sum, tok_min, tok_max) via
    partial-aggregate-then-shuffle."""
    from ray.data.aggregate import Max, Min, Sum

    partials = ds.map_batches(per_source_partials_batch, batch_format="pyarrow")
    return partials.groupby("source").aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Sum("n_tokens", alias_name="n_tokens"),
        Sum("tok_sum", alias_name="tok_sum"),
        Min("tok_min", alias_name="tok_min"),
        Max("tok_max", alias_name="tok_max"),
    )


def per_source_token_quantiles(ds, qs=(0.5, 0.9, 0.99)):
    """Exact per-source token quantiles via bounded-domain histograms.

    Quantiles are not algebraic, but the token domain is bounded (code
    points), so exact quantiles reduce to a histogram: per-batch bincount
    partials over a combined (source, token) key (combiner before
    shuffle), a keyed sum whose state is O(sources x vocab) REGARDLESS of
    corpus size, and rank extraction from the cumulative histogram — no
    sort, no per-row shuffle.  This is the scale-first alternative to a
    distributed sort or an approximate sketch, and it is exact.

    Rank convention matches DuckDB ``quantile_disc``: the value at 0-based
    rank ceil(q*n) - 1 of the sorted multiset.
    -> (source, n_tokens, p50, p90, p99 ...)."""
    from ray.data.aggregate import Sum

    def partial_hist(batch: pa.Table) -> pa.Table:
        import pandas as pd

        values, offsets = list_column_to_numpy(batch["tokens"])
        lengths = np.diff(offsets).astype(np.int64)
        srcs = pd.Series(batch["source"].to_pylist())
        codes, uniques = pd.factorize(srcs)
        src_per_tok = np.repeat(codes, lengths)
        if len(values) == 0:
            return pa.table({"source": pa.array([], pa.string()),
                             "tok": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        span = int(values.max()) + 1
        key = src_per_tok * span + values.astype(np.int64)
        counts = np.bincount(key, minlength=len(uniques) * span)
        nz = np.flatnonzero(counts)
        return pa.table({
            "source": pa.array(uniques[nz // span]),
            "tok": pa.array((nz % span).astype(np.int64), pa.int64()),
            "cnt": pa.array(counts[nz].astype(np.int64), pa.int64()),
        })

    hist = (ds.map_batches(partial_hist, batch_format="pyarrow")
            .groupby(["source", "tok"])
            .aggregate(Sum("cnt", alias_name="n")))

    def finish(g):
        import pandas as pd

        g = g.sort_values("tok")
        cum = g["n"].cumsum().to_numpy()
        n = int(cum[-1])
        toks = g["tok"].to_numpy()
        row = {"source": g["source"].iloc[0], "n_tokens": n}
        for q in qs:
            rank = int(np.ceil(q * n)) - 1
            # round, not int(): 0.29*100 == 28.999... would truncate to p28
            row[f"p{round(q * 100)}"] = int(
                toks[np.searchsorted(cum, rank + 1)])
        return pd.DataFrame([row])

    return hist.groupby("source").map_groups(finish, batch_format="pandas")


def per_source_distinct_tokens(ds, salt_buckets: int = 32):
    """Exact distinct-token count per source via SALTED keys.

    ``source`` is Zipf-skewed, and distinct-count is not algebraic, so a
    combiner can't fully pre-reduce it; a bare ``groupby(source)`` would
    ship every (source, token) pair of the hot source to one reducer.
    Salting splits each source's key space by ``hash(token) % S``: within-
    batch dedup -> shuffle on (source, salt) -> per-salt exact distinct
    (identical tokens always share a salt, so per-salt counts are disjoint)
    -> tiny second aggregate de-salts by summing.
    """
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        import pandas as pd

        values, offsets = list_column_to_numpy(batch["tokens"])
        lengths = np.diff(offsets)
        src = np.repeat(np.asarray(batch["source"].to_pylist(), dtype=object),
                        lengths)
        df = pd.DataFrame({"source": src, "tok": values.astype(np.int64)})
        df = df.drop_duplicates()           # within-batch dedup
        df["salt"] = (df["tok"] % salt_buckets).astype(np.int64)
        # explicit schema: an all-empty-docs (or 0-row) batch would
        # otherwise emit source: null and diverge from string blocks
        return pa.Table.from_pandas(df, preserve_index=False,
                                    schema=pa.schema([
                                        ("source", pa.string()),
                                        ("tok", pa.int64()),
                                        ("salt", pa.int64())]))

    def per_salt_distinct(g):
        import pandas as pd

        out = (g.drop_duplicates(["source", "tok"])
               .groupby(["source", "salt"], as_index=False)
               .agg(partial_distinct=("tok", "size")))
        return out

    salted = (ds.map_batches(partials, batch_format="pyarrow")
              .groupby(["source", "salt"])
              .map_groups(per_salt_distinct, batch_format="pandas"))
    out = salted.groupby("source").aggregate(
        Sum("partial_distinct", alias_name="n_distinct_tokens"))
    return out


def ngram_top_k(ds, n: int = 3, k: int = 50):
    """Corpus-level top-k character n-grams: per-batch counting (vectorized
    bytes-view shingles + pandas value_counts as the combiner), keyed sum,
    deterministic (count desc, gram asc) global top-k.  The shuffle moves
    one row per distinct gram per batch."""
    import pandas as pd
    from numpy.lib.stride_tricks import sliding_window_view
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        values, offsets = list_column_to_numpy(batch["tokens"])
        lengths = np.diff(offsets)
        if values.size < n:
            return pa.table({"gram": pa.array([], pa.string()),
                             "partial": pa.array([], pa.int64())})
        keep = np.zeros(values.size - n + 1, dtype=bool)
        for i in range(len(lengths)):
            if lengths[i] >= n:
                keep[offsets[i] : offsets[i] + lengths[i] - n + 1] = True
        if 0 < values.min() and values.max() < 128:
            # ASCII fast path: n-gram = n raw bytes, unique on fixed-width
            # bytestrings (no 0x00 so the S-dtype trailing-null strip
            # cannot bite)
            grams = np.ascontiguousarray(
                sliding_window_view(values.astype(np.uint8), n)
            ).view(f"S{n}").ravel()
            uniq, counts = np.unique(grams[keep], return_counts=True)
            gram_strs = [g.decode("ascii") for g in uniq]
        else:
            # general codepoint path: a uint8 view would truncate
            # codepoints >= 256 (wrong grams) and emit bytes that are not
            # valid UTF-8 (decode crash); unique whole codepoint rows
            wins = sliding_window_view(values, n)[keep]
            uniq_rows, counts = np.unique(wins, axis=0, return_counts=True)
            gram_strs = ["".join(map(chr, row)) for row in uniq_rows]
        return pa.table({
            "gram": pa.array(gram_strs, pa.string()),
            "partial": pa.array(counts.astype(np.int64), pa.int64()),
        })

    summed = (ds.map_batches(partials, batch_format="pyarrow")
              .groupby("gram").aggregate(Sum("partial", alias_name="n_grams")))

    def ranked(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["n_grams", "gram"],
                              ascending=[False, True]).head(k)

    # the distinct-gram table is tiny (bounded by alphabet^n); one final
    # compaction yields the deterministic global top-k
    return (summed.repartition(1)
            .map_batches(ranked, batch_format="pandas", batch_size=None))


def word_count_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, n_words) whitespace token counting."""
    values, offsets = list_column_to_numpy(batch["tokens"])
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_words": pa.array(segment_counts(values, offsets), pa.int64()),
    })
