"""SKIMP (Pan-MatrixProfile), maximum_subsequence, and PMP utilities.

Semantics follow reference matrixprofile/algorithms/skimp.py:45-93
(``binary_split`` BFS window ordering), skimp.py:96-242 (``skimp``),
skimp.py:245-381 (``maximum_subsequence``) and matrixprofile/utils.py:15-100
(``empty_mp`` / ``pick_mp``).  The reference's int-NaN initialization quirk
for ``pmpi`` (np.full(nan, dtype=int) -> INT_MIN, skimp.py:178) is
reproduced deliberately.

In the engine, the shuffle-friendly PMP layout is one row per
(doc_id, window) — see stages/profile.py; this module keeps the reference's
dense 2-D layout for conformance and for small driver-side use.
"""

from __future__ import annotations

import math
import warnings

import numpy as np

from .mass import pearson_to_euclidean
from .mpx import mpx

_INT_NAN = np.iinfo(np.int64).min  # what np.full(nan).astype(int) yields — skimp.py:178 quirk


def binary_split(n: int):
    """Breadth-first ordering of 0..n-1 (reference skimp.py:45-93)."""
    if n < 2:
        return [0]
    index = [0]
    intervals = [(1, n - 1)]
    while intervals:
        lo, hi = intervals.pop(0)
        mid = (lo + hi) // 2
        index.append(mid)
        if lo == hi:
            continue
        if lo < mid:
            intervals.append((lo, mid - 1))
        if mid < hi:
            intervals.append((mid + 1, hi))
    return index


def skimp(ts, windows=None, show_progress: bool = False,
          cross_correlation: bool = False, pmp_obj=None,
          sample_pct: float = 0.1, n_jobs: int = 1):
    """Pan-MatrixProfile over a window list (reference skimp.py:96-242).
    ``show_progress`` and ``n_jobs`` are accepted in the reference's
    POSITIONAL slots for drop-in compatibility, ignored — dropping them
    would silently shift positional reference calls (e.g.
    ``skimp(ts, w, False, True)`` intending cross_correlation=True would
    bind pmp_obj instead)."""
    del show_progress, n_jobs
    ts = np.asarray(ts, dtype="d")
    n = len(ts)
    if windows is None:
        windows = range(8, int(math.floor(n / 2)) + 1)
    # sample_pct truncates the BFS sweep in all cases (reference
    # skimp.py:182-185 — callers that want every explicit window computed
    # pass sample_pct=1, as compute() does)

    if not isinstance(sample_pct, (int, float)) or not (0 <= sample_pct <= 1):
        raise ValueError("sample_pct must be a decimal between 0 and 1")

    split_index = binary_split(len(windows))
    pmp = np.full((len(split_index), n), np.inf)
    pmpi = np.full((len(split_index), n), _INT_NAN, dtype=np.int64)

    last_index = len(split_index)
    if sample_pct < 1:
        last_index = min(len(split_index), int(np.floor(len(split_index) * sample_pct)))

    windows = np.array(windows)
    for i in range(last_index):
        row = split_index[i]
        window_size = int(windows[row])

        if isinstance(pmp_obj, dict):
            cw = pmp_obj.get("windows", None)
            hit = np.argwhere(cw == window_size)
            if len(hit) == 1:
                j = hit[0][0]
                pmp[row, :] = pmp_obj["pmp"][j, :]
                # float NaN padding casts to INT64_MIN — the reference's own
                # int-NaN convention (skimp.py:178); silence the cast warning
                with np.errstate(invalid="ignore"):
                    pmpi[row, :] = np.asarray(pmp_obj["pmpi"][j, :]).astype(
                        np.int64)
                continue

        profile = mpx(ts, window_size, cross_correlation=cross_correlation)
        mp = profile["mp"]
        pi = profile["pi"]
        pmp[row, : len(mp)] = mp
        pmpi[row, : len(pi)] = pi

    return {
        "pmp": pmp,
        "pmpi": pmpi,
        "data": {"ts": ts},
        "windows": windows,
        "sample_pct": sample_pct,
        "metric": "pearson" if cross_correlation else "euclidean",
        "algorithm": "skimp",
        "class": "PMP",
    }


def maximum_subsequence(ts, threshold: float = 0.95,
                        refine_stepsize: float = 0.05, n_jobs: int = 1,
                        include_pmp: bool = False, lower_window: int = 8):
    """Upper window-size search: double from ``lower_window`` while the max
    Pearson correlation stays >= threshold, then refine in +X% steps
    (reference skimp.py:245-381).  ``n_jobs`` keeps the reference's
    POSITIONAL slot 4 (ignored) — without it a reference-positional call
    ``maximum_subsequence(ts, 0.98, 0.05, 1)`` would bind include_pmp=1
    and return a PMP dict where the caller expects an int window."""
    del n_jobs
    ts = np.asarray(ts, dtype="d")
    n = len(ts)
    windows = np.array([], dtype="int")
    pearson = np.array([], dtype="d")
    pmp_rows = []
    pmpi_rows = []

    def aligned(profile, window_size):
        mp = pearson_to_euclidean(profile["mp"], window_size)
        mp = np.concatenate((mp, np.full(n - mp.shape[0], np.inf)))
        pi = np.concatenate((profile["pi"].astype("d"),
                             np.full(n - profile["pi"].shape[0], np.nan)))
        return mp, pi

    window_size = lower_window
    max_window = int(np.floor(n / 2))
    while window_size <= max_window:
        profile = mpx(ts, window_size, cross_correlation=True)
        mask = ~np.isinf(profile["mp"])
        correlation_max = np.max(profile["mp"][mask])
        windows = np.append(windows, window_size)
        pearson = np.append(pearson, correlation_max)
        if include_pmp:
            mp, pi = aligned(profile, window_size)
            pmp_rows.append(mp)
            pmpi_rows.append(pi)
        if correlation_max < threshold:
            break
        window_size *= 2

    keep = pearson > threshold
    pearson = pearson[keep]
    windows = windows[keep]
    if len(windows) < 1:
        warnings.warn("No windows found with given threshold, try to"
                      " set a lower threshold", RuntimeWarning)
        return np.nan

    window_size = int(windows[-1])
    if include_pmp:
        pmp_arr = np.vstack(pmp_rows)[keep]
        pmpi_arr = np.vstack(pmpi_rows)[keep]

    test_windows = np.append(np.arange(refine_stepsize, 1, step=refine_stepsize) + 1, 2)
    test_windows = np.floor(test_windows * window_size).astype("int")
    odd = test_windows % 2 == 1
    test_windows[odd] += 1

    for window_size in test_windows:
        window_size = int(window_size)
        profile = mpx(ts, window_size, cross_correlation=True)
        mask = ~np.isinf(profile["mp"])
        correlation_max = np.max(profile["mp"][mask])
        windows = np.append(windows, window_size)
        pearson = np.append(pearson, correlation_max)
        if include_pmp:
            mp, pi = aligned(profile, window_size)
            pmp_arr = np.append(pmp_arr, [mp], axis=0)
            pmpi_arr = np.append(pmpi_arr, [pi], axis=0)
        if correlation_max < threshold:
            break

    if include_pmp:
        return {
            "upper_window": window_size,
            "windows": windows,
            "pmp": pmp_arr,
            "pmpi": pmpi_arr,
        }
    return window_size


def empty_mp():
    """Empty MatrixProfile template (reference utils.py:15-42)."""
    return {
        "mp": None, "pi": None, "rmp": None, "rpi": None, "lmp": None,
        "lpi": None, "metric": None, "w": None, "ez": None, "join": None,
        "data": {"ts": None, "query": None},
        "class": "MatrixProfile", "algorithm": None,
    }


def pick_mp(profile, window: int):
    """Extract one window's MP out of a PMP (reference utils.py:45-100)."""
    if not (isinstance(profile, dict) and profile.get("class") == "PMP"):
        raise ValueError("pick_mp expects profile as a PMP data structure!")
    if not isinstance(window, int):
        raise ValueError("pick_mp expects window to be an int!")

    windows = profile.get("windows")
    hit = np.argwhere(windows == window).flatten()
    if len(hit) < 1:
        raise RuntimeError(f"Unable to find window {window} in the provided PMP!")
    idx = hit[0]

    out = empty_mp()
    mp = profile["pmp"][idx]
    n = len(mp)
    out["mp"] = mp[: n - window + 1]
    out["pi"] = profile["pmpi"][idx][: n - window + 1]
    out["metric"] = profile["metric"]
    out["data"]["ts"] = profile["data"]["ts"]
    out["join"] = False
    out["w"] = int(window)
    out["ez"] = int(np.floor(windows[idx] / 4))
    out["algorithm"] = "mpx"
    return out
