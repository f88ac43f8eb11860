"""Chunked-series execution: series too long for one row/block.

Two scale paths, both exact:

* **Rollups**: chunks are disjoint index ranges; every bucket statistic
  (min/max/sum/count) is associative, so per-chunk partials merge under one
  ``groupby((doc_id, tier, bucket))`` — the hash-partitioned shuffle moves
  only bucket rows, never tokens.  Buckets spanning a chunk boundary are
  merged by the aggregate, which is what makes chunk size a free parameter.

* **Matrix profiles**: the reference's own range-batch scheme (reference
  stomp.py:313-357) is a partial+final aggregate: each task computes the
  distance profiles of a query-window range against the whole series and
  partials merge by elementwise min (kernels.stomp.merge_profiles, proven
  associative by the partition-count-invariance test).  The series and its
  moving statistics are broadcast once via ``ray.put`` and read by every
  range task — not re-shipped per batch.  Partitioning assumption: one
  series' full float64 stream fits in a worker's object-store slice (8 GB
  per 10^9 points); beyond that the tiled AB-join decomposition applies.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.tokenize import list_column_to_numpy
from ..kernels.mass import clean_nan_inf, fft_convolve, find_skip_locations
from ..kernels.moving_stats import moving_avg_std
from ..kernels.stomp import merge_profiles, stomp_batch
from ..stages.rollup import TIERS


def chunk_sequences_batch(batch: pa.Table, chunk_tokens: int = 4096) -> pa.Table:
    """Explode rows into disjoint chunks: (doc_id, source, start, tokens)."""
    values, offsets = list_column_to_numpy(batch["tokens"])
    doc_rows, starts, chunks = [], [], []
    for i in range(len(batch)):
        row = values[offsets[i] : offsets[i + 1]]
        for s in range(0, max(len(row), 1), chunk_tokens):
            doc_rows.append(i)
            starts.append(s)
            chunks.append(row[s : s + chunk_tokens])
    lens = np.array([len(c) for c in chunks], dtype=np.int64)
    off = np.concatenate(([0], np.cumsum(lens))).astype(np.int32)
    flat = np.concatenate(chunks) if chunks else np.empty(0, values.dtype)
    take = pa.array(np.array(doc_rows, dtype=np.int64), pa.int64())
    return pa.table({
        "doc_id": batch["doc_id"].take(take),
        "source": batch["source"].take(take),
        "start": pa.array(np.array(starts, dtype=np.int64), pa.int64()),
        "tokens": pa.ListArray.from_arrays(pa.array(off, pa.int32()),
                                           pa.array(flat)),
    })


def chunked_rollup(chunks_ds, tiers=None):
    """Tier rollups over chunked rows -> identical output to the single-row
    rollup (partition-count invariance).  Partial bucket stats per chunk,
    merged by a keyed aggregate."""
    tiers = tiers or TIERS

    def partials(batch: pa.Table) -> pa.Table:
        values, offsets = list_column_to_numpy(batch["tokens"])
        values = values.astype("d")
        starts_col = batch["start"].to_numpy()
        lengths = np.diff(offsets)
        parts = []
        for tier_name, bucket in tiers.items():
            # segment boundaries aligned to GLOBAL bucket edges: a chunk
            # whose start is mid-bucket emits a partial edge bucket that the
            # keyed aggregate merges with its sibling from the previous chunk
            seg_starts, seg_buckets, seg_rows = [], [], []
            for i in range(len(batch)):
                s, L, o = int(starts_col[i]), int(lengths[i]), int(offsets[i])
                if L == 0:
                    continue
                lead = (bucket - s % bucket) % bucket
                internal = np.arange(lead if lead else bucket, L, bucket)
                row_starts = np.concatenate(([0], internal))
                seg_starts.append(o + row_starts)
                seg_buckets.append(s // bucket + ((s % bucket) + row_starts) // bucket)
                seg_rows.append(np.full(row_starts.shape[0], i, dtype=np.int64))
            if not seg_starts:
                continue
            flat_starts = np.concatenate(seg_starts)
            bucket_ids = np.concatenate(seg_buckets)
            row_of_bucket = np.concatenate(seg_rows)

            mins = np.minimum.reduceat(values, flat_starts)
            maxs = np.maximum.reduceat(values, flat_starts)
            sums = np.add.reduceat(values, flat_starts)
            # rows abut in the flat array, so each segment ends at the next
            # start (or the array end) — also exactly the row boundary
            seg_ends = np.concatenate((flat_starts[1:], [len(values)]))
            counts = seg_ends - flat_starts
            take = pa.array(row_of_bucket, pa.int64())
            parts.append(pa.table({
                "doc_id": batch["doc_id"].take(take),
                "source": batch["source"].take(take),
                "tier": pa.array([tier_name] * len(bucket_ids), pa.string()),
                "bucket": pa.array(bucket_ids, pa.int64()),
                "p_min": pa.array(mins, pa.float64()),
                "p_max": pa.array(maxs, pa.float64()),
                "p_sum": pa.array(sums, pa.float64()),
                "p_count": pa.array(counts.astype(np.int64), pa.int64()),
            }))
        if not parts:
            # a batch of only empty-token docs contributes no buckets —
            # return an empty table with the output schema (concat_tables
            # on an empty list raises)
            return pa.table({
                "doc_id": batch["doc_id"].slice(0, 0),
                "source": batch["source"].slice(0, 0),
                "tier": pa.array([], pa.string()),
                "bucket": pa.array([], pa.int64()),
                "p_min": pa.array([], pa.float64()),
                "p_max": pa.array([], pa.float64()),
                "p_sum": pa.array([], pa.float64()),
                "p_count": pa.array([], pa.int64()),
            })
        return pa.concat_tables(parts)

    from ray.data.aggregate import Max, Min, Sum

    merged = (chunks_ds.map_batches(partials, batch_format="pyarrow")
              .groupby(["doc_id", "source", "tier", "bucket"])
              .aggregate(Min("p_min", alias_name="t_min"),
                         Max("p_max", alias_name="t_max"),
                         Sum("p_sum", alias_name="t_sum"),
                         Sum("p_count", alias_name="t_count")))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df["t_mean"] = df["t_sum"] / df["t_count"]
        return df

    return merged.map_batches(finish, batch_format="pandas")


def distributed_mpx(ts, w: int, n_partitions: int = 16):
    """Exact MPX self-join over one long series as a Ray fan-out over the
    diagonal axis — the reference parallelizes the same axis with OpenMP
    threads (cympx.pyx:82-112); here each Ray task walks a contiguous
    diagonal range against broadcast per-series state and the partials
    merge by elementwise max-correlation.

    Ranges are sized so each carries ~equal work: diagonal d costs
    (pl - d) updates, so boundaries follow the quantiles of the cumulative
    work curve rather than equal diagonal counts.

    This is one of the few places raw ``@ray.remote`` tasks beat the
    Dataset API: a per-series scatter-gather over a broadcast 4-array
    state with sub-second tasks — Dataset block accounting added ~8x
    overhead in measurement, while raw tasks reach 0.46 s at n=32768 on
    32 cpus vs the reference's 0.816 s with 4 OpenMP threads.
    """
    import ray

    from ..kernels.mpx import merge_pearson_partials, mpx_diag_range, mpx_precompute

    ts = np.ascontiguousarray(ts, dtype="d")
    seed, df, dg, sig, minlag = mpx_precompute(ts, w)
    pl = sig.shape[0]
    d0 = minlag + 1

    if d0 >= pl:
        # no admissible diagonals (series barely longer than w): same
        # all-unmatched profile mpx_self returns, no tasks to launch
        mp = np.full(pl, -1.0)
        return np.sqrt(2.0 * w * (1.0 - mp)), np.full(pl, -1, dtype=np.int64)

    # equal-work boundaries: cumulative work W(d) = sum_{d0..d}(pl - d)
    diag_costs = pl - np.arange(d0, pl)
    cum = np.cumsum(diag_costs)
    targets = np.linspace(0, cum[-1], n_partitions + 1)[1:-1]
    cuts = d0 + np.searchsorted(cum, targets)
    bounds = np.unique(np.concatenate(([d0], cuts, [pl])))

    state = ray.put((seed, df, dg, sig))

    @ray.remote
    def run_range(lo, hi, state_ref):
        seed_, df_, dg_, sig_ = state_ref
        mp = np.full(pl, -1.0)
        mpi = np.full(pl, -1, dtype=np.int64)
        mpx_diag_range(int(lo), int(hi), seed_, df_, dg_, sig_, mp, mpi)
        return mp, mpi

    parts = ray.get([run_range.remote(lo, hi, state)
                     for lo, hi in zip(bounds[:-1], bounds[1:])])
    mp, mpi = merge_pearson_partials(parts)
    np.minimum(mp, 1.0, out=mp)
    return np.sqrt(2.0 * w * (1.0 - mp)), mpi


def distributed_tiled_mpx(ts, w: int, tile: int, max_in_flight: int = 64):
    """Exact self-join MP for series too large for one worker's memory:
    the SCAMP-style tile decomposition (kernels.mpx.tiled_mpx_self) with
    each strip placed in the object store ONCE and every tile-pair task
    fetching exactly the two strips it touches — peak per-task memory is
    O(tile + w), independent of series length.  Partials merge by
    max-correlation on the driver as tasks complete (bounded in-flight
    window so the driver never holds all partials)."""
    import math as _math

    import ray

    from ..kernels.mpx import tile_pair_partials

    ts = np.ascontiguousarray(ts, dtype="d")
    n = ts.shape[0]
    pl = n - w + 1
    minlag = int(_math.ceil(w / 4.0))

    starts = list(range(0, pl, tile))
    strips = {r: ray.put(np.ascontiguousarray(ts[r : min(r + tile, pl) - 1 + w]))
              for r in starts}
    bounds = {r: min(r + tile, pl) for r in starts}

    @ray.remote
    def run_pair(a_lo, a_hi, b_lo, b_hi, strip_a, strip_b):
        return (a_lo, a_hi, b_lo, b_hi) + tile_pair_partials(
            strip_a, strip_b, w, delta=a_lo - b_lo, minlag=minlag,
            merged_tile=(a_lo == b_lo))

    mp = np.full(pl, -1.0)
    mpi = np.full(pl, -1, dtype=np.int64)

    def absorb(result):
        from ..kernels.mpx import merge_tile_partial

        a_lo, a_hi, b_lo, b_hi, mp_a, mpi_a, mp_b, mpi_b = result
        merge_tile_partial(mp, mpi, a_lo, a_hi, mp_a, mpi_a, b_lo, self_join_ties=True)
        merge_tile_partial(mp, mpi, b_lo, b_hi, mp_b, mpi_b, a_lo, self_join_ties=True)

    pending = []
    for r in starts:
        for c in starts:
            if c < r:
                continue
            pending.append(run_pair.remote(r, bounds[r], c, bounds[c],
                                           strips[r], strips[c]))
            if len(pending) >= max_in_flight:
                done, pending = ray.wait(pending, num_returns=1)
                absorb(ray.get(done[0]))
    for result in ray.get(pending):
        absorb(result)

    np.minimum(mp, 1.0, out=mp)
    return np.sqrt(2.0 * w * (1.0 - mp)), mpi


def distributed_stomp(ts, w: int, n_partitions: int = 8):
    """Exact STOMP over one long series as a Ray fan-out: broadcast the
    series + moving stats once, one task per query-window range, then a
    TASK-SIDE 8-ary tree reduce over merge_profiles (kernels/stomp.py:
    merge_profiles is associative with left-biased ties, so a group tree
    that keeps partials in range order is exact-equal to the serial
    fold).  The driver holds object refs only — at a 10^7-point series
    the partials (6 arrays x profile_length each) never all coexist in
    driver heap, and the merges run worker-side in parallel depth
    log8(n_partitions) instead of serializing on the driver.  Raw
    ``@ray.remote`` tasks, same rationale as distributed_mpx above.
    Returns the same dict as kernels.stomp.stomp."""
    import ray

    ts = np.asarray(ts, dtype="d")
    n = ts.shape[0]
    profile_length = n - w + 1
    ez = int(np.ceil(w / 2.0))
    # skip locations come from the RAW series, BEFORE the NaN/Inf
    # zero-fill — same order as kernels.stomp.stomp; computing them after
    # the clean yields an all-False mask and lets zero-filled windows
    # contribute spurious distances
    skip_locs = find_skip_locations(ts, profile_length, w)
    ts = clean_nan_inf(ts)
    data_mu, data_sig = moving_avg_std(ts, w)
    first_product = fft_convolve(ts, ts[:w])

    shared = ray.put({
        "ts": ts, "mu": data_mu, "sig": data_sig,
        "first_product": first_product, "skip": skip_locs,
    })

    bounds = np.linspace(0, profile_length, n_partitions + 1).astype(int)

    @ray.remote
    def run_range(s, e, state_ref):
        return stomp_batch(int(s), int(e), state_ref["ts"], state_ref["ts"],
                           w, ez, False, state_ref["mu"], state_ref["sig"],
                           state_ref["first_product"], state_ref["skip"])

    @ray.remote
    def merge_group(*parts):
        import functools

        return functools.reduce(merge_profiles, parts)

    # duplicate linspace bounds (profile_length < n_partitions) yield
    # zero-width ranges — skip them rather than launching empty tasks
    refs = [run_range.remote(s, e, shared)
            for s, e in zip(bounds[:-1], bounds[1:]) if e > s]
    # 8-ary tree reduce over contiguous groups: each task left-folds its
    # group in range order, so left-biased tie-breaks in merge_profiles
    # resolve exactly as the serial fold would.  Fan-in 8 beats binary
    # (fewer object-store writes: (N-1)/7 vs N-1 intermediate partials)
    # and beats a driver fold (merges run worker-side in parallel; the
    # driver holds refs only — measured at pl=2e6 x 16 partials: 0.64 s
    # vs 0.87-3.1 s driver fold vs 1.9-4.4 s binary tree)
    fan_in = 8
    while len(refs) > 1:
        refs = [merge_group.remote(*refs[i : i + fan_in])
                for i in range(0, len(refs), fan_in)]
    result = ray.get(refs[0])

    return {
        "mp": result["mp"], "pi": result["pi"],
        "rmp": result["rmp"], "rpi": result["rpi"],
        "lmp": result["lmp"], "lpi": result["lpi"],
        "metric": "euclidean", "w": w, "ez": ez, "join": False,
        "sample_pct": 1, "data": {"ts": ts, "query": None},
        "class": "MatrixProfile", "algorithm": "stomp_distributed",
    }


def distributed_scrimp(ts, w: int, step_size: float = 0.25,
                       sample_pct: float = 0.1, random_state=None,
                       n_partitions: int = 8):
    """SCRIMP++ over one long series as a Ray fan-out on the SAMPLED
    diagonal axis.  Reproduces kernels.scrimp.scrimp_plus_plus EXACTLY
    (same seed -> same sampled diagonals; contiguous slices of the sample
    order run per task starting from +inf partials; partials merge in
    slice order with the serial strict-< law, so values AND indices
    match): phase-1 PreSCRIMP runs on the driver (anchor count is
    len/(w*step) — cheap), phase 2 is the quadratic part that fans out."""
    import ray

    from ..kernels.scrimp import prescrimp, scrimp_refine_diags

    if random_state is not None:
        np.random.seed(random_state)
    profile = prescrimp(ts, w, step_size=step_size, sample_pct=sample_pct,
                        random_state=random_state)
    ts_arr = profile["data"]["ts"]
    m = profile["w"]
    ez = profile["ez"]
    pl = len(ts_arr) - m + 1

    # EXACT replication of the serial sampling (same RNG call sequence)
    orig_index = np.arange(pl)
    compute_order = orig_index[orig_index > ez]
    sample_size = int(np.ceil(len(compute_order) * sample_pct))
    compute_order = np.random.choice(compute_order, size=sample_size,
                                     replace=False)

    from ..kernels.moving_stats import moving_avg_std

    mu, sig = moving_avg_std(ts_arr, m)
    shared = ray.put({"ts": ts_arr, "mu": mu, "sig": sig})

    @ray.remote
    def refine_slice(diags):
        state = ray.get(shared)
        mp = np.full(pl, np.inf)
        pi = np.full(pl, -1, dtype=np.int64)
        scrimp_refine_diags(state["ts"], m, state["mu"], state["sig"],
                            diags, mp, pi)
        return mp, pi

    bounds = np.linspace(0, len(compute_order), n_partitions + 1).astype(int)
    futures = [refine_slice.remote(compute_order[lo:hi])
               for lo, hi in zip(bounds[:-1], bounds[1:]) if hi > lo]

    mp, pi = profile["mp"], profile["pi"]
    for part_mp, part_pi in ray.get(futures):  # slice order = serial order
        better = part_mp < mp
        mp[better] = part_mp[better]
        pi[better] = part_pi[better]

    profile["algorithm"] = "scrimp++_distributed"
    profile["sample_pct"] = sample_pct
    return profile
