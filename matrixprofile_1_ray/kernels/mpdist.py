"""MPDist scalar/vector distances and all-pairs distance computation.

Semantics follow reference matrixprofile/algorithms/mpdist.py:20-184 and
algorithms/pairwise_dist.py:36-101.  ``pairwise_dist`` here is the serial
kernel; the distributed pairs-table version lives in stages/pairs.py.
"""

from __future__ import annotations

import numpy as np

# (moving_min no longer needed: mpdist_vector uses one vectorized sliding min)
from .mpx import mpx_ab


def mpdist(ts, ts_b, w: int, threshold: float = 0.05,
           n_jobs: int = 1) -> float:
    """k-th smallest of the concatenated AB/BA join profiles with
    k = ceil(threshold*(len(a)+len(b))) - 1 (reference mpdist.py:20-77).
    ``n_jobs`` accepted for reference-signature compatibility, ignored."""
    del n_jobs
    ts = np.asarray(ts, dtype="d")
    ts_b = np.asarray(ts_b, dtype="d")
    if ts.ndim != 1 or ts_b.ndim != 1:
        raise ValueError("ts and ts_b must be one dimensional!")
    if not isinstance(threshold, float) or not (0 < threshold < 1):
        raise ValueError("threshold must be a float greater than 0 and less than 1")

    mp, _, mpb, _ = mpx_ab(ts, ts_b, w)
    mp_abba = np.concatenate((mp, mpb))
    data_len = len(ts) + len(ts_b)
    abba_sorted = np.sort(mp_abba[np.isfinite(mp_abba)])

    if abba_sorted.size == 0:
        return np.inf
    upper_idx = int(np.ceil(threshold * data_len)) - 1
    return float(abba_sorted[min(abba_sorted.size - 1, upper_idx)])


def mass_distance_matrix(ts, query, w: int) -> np.ndarray:
    """Row i = MASS profile of query window i over ts
    (reference mpdist.py:80-106), with all sliding dot products as one
    BLAS GEMM (exact; the reference's per-window FFT does n*log(n) work
    per row).  mass2's constant-window conventions are reproduced:
    distance w where the data window is near-constant, 0 where the query
    window is too (mass2.py:82-83), 1e-12 guard on zero denominators."""
    from numpy.lib.stride_tricks import sliding_window_view

    from .moving_stats import moving_avg_std

    ts = np.asarray(ts, dtype="d")
    query = np.asarray(query, dtype="d")
    meanx, sigmax = moving_avg_std(ts, w)
    meany, sigmay = moving_avg_std(query, w)

    W = np.ascontiguousarray(sliding_window_view(ts, w))       # [pl, w]
    Q = np.ascontiguousarray(sliding_window_view(query, w))    # [k, w]
    prods = Q @ W.T                                            # [k, pl]

    denom = sigmay[:, None] * sigmax[None, :]
    denom = np.where(denom == 0, 1e-12, denom)
    dist = 2 * (w - (prods - w * meany[:, None] * meanx[None, :]) / denom)

    low_x = sigmax < 1e-10
    dist[:, low_x] = w
    low_y = sigmay < 1e-10
    dist[np.ix_(low_y, low_x)] = 0
    return np.real(np.sqrt(dist.astype(complex)))


def calculate_mpdist(profile, threshold: float, data_length: int) -> float:
    """Order statistic of a pooled profile (reference mpdist.py:109-142) —
    note the un-decremented index, a deliberate parity quirk vs ``mpdist``.

    np.partition selects the same dist_loc-th smallest as the reference's
    full sort in O(R) instead of O(R log R) — this sits in
    ``mpdist_vector``'s per-offset loop, the snippets hot path.  The
    bounds check is strict (``>``): the reference indexes clean[dist_loc]
    under a ``>=`` guard and crashes with IndexError on exact equality
    (e.g. w close to len(ts_b)); equality falls through to max(clean),
    the same value the k-past-the-end order statistic degenerates to."""
    dist_loc = int(np.ceil(threshold * data_length))
    profile = np.asarray(profile, dtype="d")
    clean = profile[np.isfinite(profile)]
    if clean.size < 1:
        return np.inf
    if clean.size > dist_loc:
        return float(np.partition(clean, dist_loc)[dist_loc])
    return float(np.max(clean))


def mpdist_vector(ts, ts_b, w: int) -> np.ndarray:
    """Sliding MPDist of ts_b against every offset of ts
    (reference mpdist.py:145-184)."""
    matrix = mass_distance_matrix(ts, ts_b, w)
    rows, _ = matrix.shape

    all_right_hist = matrix.min(axis=0)
    # one vectorized sliding-min over axis 1 == stacking moving_min(row,
    # rows) per row, without the per-row Python loop of window allocations
    from numpy.lib.stride_tricks import sliding_window_view

    mass_minimums = sliding_window_view(matrix, rows, axis=1).min(axis=-1)

    mpdist_length = len(ts) - len(ts_b) + 1
    right_hist_length = len(ts_b) - w + 1
    out = np.empty(mpdist_length)
    for i in range(mpdist_length):
        profile = np.concatenate(
            (mass_minimums[:, i], all_right_hist[i : right_hist_length + i])
        )
        out[i] = calculate_mpdist(profile, 0.05, 2 * len(ts_b))
    return out


def pairwise_dist(X, window_size: int, threshold: float = 0.05,
                  n_jobs: int = 1) -> np.ndarray:
    """Condensed all-pairs MPDist matrix (reference pairwise_dist.py:36-101).
    Serial kernel; see stages/pairs.py for the pairs-table fan-out.
    ``n_jobs`` accepted for reference-signature compatibility, ignored."""
    del n_jobs
    if not isinstance(X, (list, tuple, np.ndarray)):
        raise ValueError("X must be array_like!")
    if not isinstance(threshold, float) or not (0 < threshold < 1):
        raise ValueError("threshold must be a float greater than 0 and less"
                         " than 1")
    m = len(X)
    dm = np.empty((m * (m - 1)) // 2, dtype="d")
    k = 0
    for i in range(m - 1):
        for j in range(i + 1, m):
            dm[k] = mpdist(X[i], X[j], window_size, threshold=threshold)
            k += 1
    return dm
