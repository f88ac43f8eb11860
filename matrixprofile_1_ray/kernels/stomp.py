"""STOMP matrix profile with left/right profiles and range-partitioned
partial computation.

Semantics follow reference matrixprofile/algorithms/stomp.py:19-193
(``_batch_compute``: the O(1) rolling dot-product update, running query
sum/sum-of-squares recurrence, NaN-window skipping with its stale-state
behavior, left/right profile updates) and stomp.py:196-377 (driver: ez =
ceil(w/2) for self-joins, 0 for AB joins; elementwise-min merge of range
partials).  The merge law (stomp.py:339-357) is associative and commutative,
which is what lets a long series be split across Ray tasks and reduced with
``merge_profiles`` — the distributed path in stages/ relies on it.
"""

from __future__ import annotations

import numpy as np

from .mass import (
    apply_exclusion_zone,
    clean_nan_inf,
    distance_profile,
    fft_convolve,
    find_skip_locations,
)
from .moving_stats import moving_avg_std


def stomp_batch(batch_start, batch_end, ts, query, window_size, exclusion_zone,
                is_join, data_mu, data_sig, first_product, skip_locs):
    """Compute the profile contribution of query windows
    [batch_start, batch_end) — reference stomp.py:19-193."""
    data_length = ts.shape[0]
    profile_length = data_length - window_size + 1

    mp = np.full(profile_length, np.inf)
    pi = np.zeros(profile_length, dtype=np.int64)
    lmp = rmp = lpi = rpi = None
    if not is_join:
        lmp = np.full(profile_length, np.inf)
        rmp = np.full(profile_length, np.inf)
        lpi = np.zeros(profile_length, dtype=np.int64)
        rpi = np.zeros(profile_length, dtype=np.int64)

    if batch_start == 0:
        first_window = query[:window_size]
        last_product = first_product.copy()
    else:
        first_window = query[batch_start - 1 : batch_start + window_size - 1]
        last_product = fft_convolve(ts, first_window)

    query_sum = np.sum(first_window)
    query_2sum = np.sum(first_window ** 2)
    q_mu, q_sig = moving_avg_std(first_window, window_size)
    query_mu = q_mu[0]
    query_sig = q_sig[0]
    drop_value = first_window[0]

    if batch_start == 0:
        dp = distance_profile(last_product, window_size, data_mu, data_sig,
                              query_mu, query_sig)
        dp = apply_exclusion_zone(exclusion_zone, is_join, window_size,
                                  data_length, 0, dp)
        better = dp < mp
        mp[better] = dp[better]
        pi[better] = 0
        if not is_join:
            lmp[better] = dp[better]
            lpi[better] = 0
        batch_start += 1

    # inclusive upper edge so range partials leave no gaps (stomp.py:136-137)
    if batch_end < profile_length:
        batch_end += 1

    # scratch buffers reused across iterations (no per-step allocations)
    head = ts[: data_length - window_size]
    tail = ts[window_size:]
    dp_buf = np.empty(profile_length)
    m_buf = np.empty(profile_length, dtype=bool)

    for i in range(batch_start, batch_end):
        query_window = query[i : i + window_size]
        last = query_window[-1]
        query_sum = query_sum - drop_value + last
        query_2sum = query_2sum - drop_value ** 2 + last ** 2
        query_mu = query_sum / window_size
        query_sig = np.sqrt(max(query_2sum / window_size - query_mu ** 2, 0.0))
        # rolling dot-product update, fused in place (stomp.py:152-155)
        lp_head = last_product[: data_length - window_size]
        lp_head -= head * drop_value
        lp_head += tail * last
        last_product[1:] = lp_head
        last_product[0] = first_product[i]
        drop_value = query_window[0]

        if skip_locs[i]:
            # Advance the rolling state, emit nothing.  The reference
            # `continue`s BEFORE the updates (stomp.py:143-145), which
            # desynchronizes query_sum/last_product for every later window
            # of the batch — so its NaN-series output depends on how the
            # query range was batched (each batch reseeds exactly via
            # fft_convolve).  Keeping the state exact through skips makes
            # every emitted distance correct and the range partials
            # partition-invariant, which the distributed fan-out
            # (state/chunked.py) requires; deliberate divergence, covered
            # by tests/test_round4_review.py.
            continue

        # distance profile, in place (core.py:447-478 arithmetic)
        denom = data_sig * query_sig
        np.multiply(data_mu, window_size * query_mu, out=dp_buf)
        np.subtract(last_product, dp_buf, out=dp_buf)
        dp_buf /= denom
        np.subtract(window_size, dp_buf, out=dp_buf)
        dp_buf *= 2
        with np.errstate(divide="ignore", invalid="ignore"):
            np.sqrt(dp_buf, out=dp_buf)
        apply_exclusion_zone(exclusion_zone, is_join, window_size,
                             data_length, i, dp_buf)

        better = np.less(dp_buf, mp, out=m_buf)
        np.copyto(mp, dp_buf, where=better)
        pi[better] = i

        if not is_join:
            # neighbor i lies left of entries >= i, right of entries < i
            lb = better[i:]
            np.copyto(lmp[i:], dp_buf[i:], where=lb)
            lpi[i:][lb] = i
            rb = np.less(dp_buf[:i], rmp[:i], out=m_buf[:i])
            np.copyto(rmp[:i], dp_buf[:i], where=rb)
            rpi[:i][rb] = i

    return {"mp": mp, "pi": pi, "rmp": rmp, "rpi": rpi, "lmp": lmp, "lpi": lpi}


def merge_profiles(left, right):
    """Elementwise-min merge of two partial profiles (stomp.py:339-357);
    associative and commutative, safe as a distributed reduce."""
    out = {}
    for mp_key, pi_key in (("mp", "pi"), ("lmp", "lpi"), ("rmp", "rpi")):
        a, ai = left.get(mp_key), left.get(pi_key)
        b, bi = right.get(mp_key), right.get(pi_key)
        if a is None:
            out[mp_key], out[pi_key] = b, bi
            continue
        take_b = b < a
        mp = np.where(take_b, b, a)
        pi = np.where(take_b, bi, ai)
        out[mp_key], out[pi_key] = mp, pi
    return out


def stomp(ts, window_size: int, query=None, n_ranges: int = 1,
          n_jobs: int = 1):
    """Full STOMP profile dict (reference stomp.py:196-377).

    ``n_ranges`` splits the query-window range into partials merged by
    ``merge_profiles`` — the same result for any value (partition-count
    invariance), mirroring the reference's multiprocessing batches.
    ``n_jobs`` is accepted for reference-signature compatibility and
    ignored — parallelism belongs to the Ray layer, and the reference's
    own tests assert results are identical at any value."""
    del n_jobs
    is_join = query is not None
    ts = np.asarray(ts, dtype="d")
    query_arr = np.asarray(query, dtype="d") if is_join else ts

    if window_size < 4:
        raise ValueError("window size must be at least 4.")
    if window_size > len(query_arr) / 2:
        raise ValueError("Time series is too short relative to desired window size")

    profile_length = len(ts) - window_size + 1
    num_queries = len(query_arr) - window_size + 1
    exclusion_zone = 0 if is_join else int(np.ceil(window_size / 2.0))

    skip_locs = find_skip_locations(ts, profile_length, window_size)
    ts = clean_nan_inf(ts)
    query_arr = clean_nan_inf(query_arr)

    data_mu, data_sig = moving_avg_std(ts, window_size)
    first_product = fft_convolve(ts, query_arr[:window_size])

    n_ranges = max(1, min(n_ranges, num_queries))
    bounds = np.linspace(0, num_queries, n_ranges + 1).astype(int)
    partials = [
        stomp_batch(int(s), int(e), ts, query_arr, window_size, exclusion_zone,
                    is_join, data_mu, data_sig, first_product, skip_locs)
        for s, e in zip(bounds[:-1], bounds[1:])
        if e > s
    ]
    result = partials[0]
    for part in partials[1:]:
        result = merge_profiles(result, part)

    return {
        "mp": result["mp"],
        "pi": result["pi"],
        "rmp": result["rmp"],
        "rpi": result["rpi"],
        "lmp": result["lmp"],
        "lpi": result["lpi"],
        "metric": "euclidean",
        "w": window_size,
        "ez": exclusion_zone,
        "join": is_join,
        "sample_pct": 1,
        "data": {"ts": ts, "query": query_arr if is_join else None},
        "class": "MatrixProfile",
        "algorithm": "stomp",
    }
