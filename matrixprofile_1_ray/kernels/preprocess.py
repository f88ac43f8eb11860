"""Imputation / gap-fill and constant-window noise.

Semantics follow reference matrixprofile/preprocess.py:17-270.  Two engine
extensions mandated by the north rule: ``forward_fill`` and ``linear``
gap-fill modes, and a deterministic per-series seed for the constant-window
noise (the reference draws from the unseeded global RNG — preprocess.py:134 —
which is unusable for reproducible distributed runs; pass ``seed=None`` to
reproduce the reference's draw-from-current-state behavior).
"""

from __future__ import annotations

import numpy as np


def validate_preprocess_kwargs(preprocessing_kwargs):
    """Validate/normalize the preprocessing config
    (reference preprocess.py:17-88)."""
    if not preprocessing_kwargs:
        return None
    valid_keys = {"window", "impute_method", "impute_direction", "add_noise"}
    if not isinstance(preprocessing_kwargs, dict):
        raise ValueError("The parameter 'preprocessing_kwargs' is not dict like!")
    if not set(preprocessing_kwargs).issubset(valid_keys):
        raise ValueError(
            "invalid key(s) for preprocessing_kwargs! valid key(s) should "
            "include " + str(valid_keys)
        )
    out = {"window": 4, "impute_method": "mean",
           "impute_direction": "forward", "add_noise": True}
    methods = ["mean", "median", "min", "max"]
    directions = ["forward", "fwd", "f", "backward", "bwd", "b"]
    if "window" in preprocessing_kwargs:
        if not isinstance(preprocessing_kwargs["window"], int):
            raise ValueError("The value for preprocessing_kwargs['window'] is not an integer!")
        out["window"] = preprocessing_kwargs["window"]
    if "impute_method" in preprocessing_kwargs:
        if preprocessing_kwargs["impute_method"] not in methods:
            raise ValueError("invalid imputation method! valid include options: "
                             + ", ".join(methods))
        out["impute_method"] = preprocessing_kwargs["impute_method"]
    if "impute_direction" in preprocessing_kwargs:
        if preprocessing_kwargs["impute_direction"] not in directions:
            raise ValueError("invalid imputation direction! valid include options: "
                             + ", ".join(directions))
        out["impute_direction"] = preprocessing_kwargs["impute_direction"]
    if "add_noise" in preprocessing_kwargs:
        if not isinstance(preprocessing_kwargs["add_noise"], bool):
            raise ValueError("The value for preprocessing_kwargs['add_noise'] is not a boolean value!")
        out["add_noise"] = preprocessing_kwargs["add_noise"]
    return out


def to_np_array(a) -> np.ndarray:
    """Coerce array-likes to ndarray, rejecting scalars/strings/sets with
    the reference's error contract (reference core.py:79-105).  numpy
    scalars are rejected explicitly: they carry ``__array__`` but the
    reference (list/tuple/ndarray only) raises for them, and accepting a
    0-d wrapper here would surface as a different, later error."""
    if isinstance(a, np.ndarray):
        return a
    if isinstance(a, np.generic):
        raise ValueError("Unable to convert to np.ndarray!")
    if isinstance(a, (list, tuple, range)) or hasattr(a, "__array__"):
        return np.array(a)
    raise ValueError("Unable to convert to np.ndarray!")


def precheck_series_and_query_1d(ts, query):
    """Validate a (series, query) pair as 1-D numeric arrays
    (reference core.py:108-140)."""
    try:
        ts = to_np_array(ts).astype("d")
    except ValueError:
        raise ValueError("Invalid ts value given. Must be array_like!")
    try:
        query = to_np_array(query).astype("d")
    except ValueError:
        raise ValueError("Invalid query value given. Must be array_like!")
    if ts.ndim != 1:
        raise ValueError("ts must be one dimensional!")
    if query.ndim != 1:
        raise ValueError("query must be one dimensional!")
    return ts, query


def is_subsequence_constant(subsequence) -> bool:
    """All-equal test (reference preprocess.py:91-112)."""
    if not isinstance(subsequence, (list, tuple, range, np.ndarray)):
        raise ValueError("subsequence is not array like!")
    temp = np.asarray(subsequence)
    return bool(np.all(temp == temp[0]))


def add_noise_to_series(series, seed=None):
    """Uniform(0, 9e-7) noise (reference preprocess.py:115-137); ``seed``
    makes the draw deterministic — engine extension."""
    if not isinstance(series, (list, tuple, range, np.ndarray)):
        raise ValueError("series is not array like!")
    temp = np.array(series, dtype="d", copy=True)
    if seed is None:
        noise = np.random.uniform(0, 0.0000009, size=len(temp))
    else:
        noise = np.random.default_rng(seed).uniform(0, 0.0000009, size=len(temp))
    return temp + noise


def impute_missing(ts, window: int, method: str = "mean", direction: str = "forward"):
    """Sliding-window imputation of NaN/Inf (reference preprocess.py:140-222):
    endpoints patched from the first/last valid value, then each window with
    missing points filled with the window statistic over its valid points."""
    if not isinstance(ts, (list, tuple, range, np.ndarray)):
        raise ValueError("ts is not array like!")
    method_map = {"mean": np.mean, "median": np.median, "min": np.min, "max": np.max}
    directions = ["forward", "fwd", "f", "backward", "bwd", "b"]
    if method not in method_map:
        raise ValueError("invalid imputation method! valid include options: "
                         + ", ".join(method_map))
    if direction not in directions:
        raise ValueError("invalid imputation direction! valid include options: "
                         + ", ".join(directions))
    if not isinstance(window, int):
        raise ValueError("window is not an integer!")

    temp = np.array(ts, dtype="d", copy=True)
    func = method_map[method]
    bad = ~np.isfinite(temp)

    if bad[0]:
        temp[0] = temp[~bad][0]
        bad = ~np.isfinite(temp)
    if bad[-1]:
        temp[-1] = temp[~bad][-1]
        bad = ~np.isfinite(temp)

    if direction.startswith("f"):
        index_order = range(len(temp) - window + 1)
    else:
        index_order = range(len(temp) - window + 1, 0, -1)

    for start in index_order:
        end = start + window
        seg_bad = bad[start:end]
        if seg_bad.any():
            temp[start:end][seg_bad] = func(temp[start:end][~seg_bad])
            bad = ~np.isfinite(temp)
    return temp


def gapfill(ts, mode: str = "forward_fill"):
    """Engine gap-fill (north rule): ``forward_fill`` carries the last valid
    point forward (leading gaps backfilled from the first valid point);
    ``linear`` interpolates between valid neighbors.  Fully vectorized."""
    if mode not in ("forward_fill", "linear"):
        # validate BEFORE the gap-free early return: a typo'd mode must
        # fail on clean test data too, not only when a gap arrives
        raise ValueError(f"unknown gapfill mode: {mode}")
    temp = np.array(ts, dtype="d", copy=True)
    bad = ~np.isfinite(temp)
    if not bad.any():
        return temp
    if bad.all():
        raise ValueError("cannot gap-fill an all-missing series")
    idx = np.arange(len(temp))
    valid = idx[~bad]
    if mode == "forward_fill":
        # index of the most recent valid point at or before each position
        pos = np.maximum(np.searchsorted(valid, idx, side="right") - 1, 0)
        return temp[valid[pos]]
    temp[bad] = np.interp(idx[bad], valid, temp[valid])
    return temp


def preprocess(ts, window: int, impute_method: str = "mean",
               impute_direction: str = "forward", add_noise: bool = True,
               seed=None):
    """impute_missing + constant-window noise (reference preprocess.py:225-270).
    ``seed`` derives one deterministic stream for all noised windows."""
    if not isinstance(ts, (list, tuple, range, np.ndarray)):
        raise ValueError("ts is not array like!")
    temp = np.array(ts, dtype="d", copy=True)
    temp = impute_missing(temp, window, method=impute_method,
                          direction=impute_direction)
    if add_noise:
        rng = np.random.default_rng(seed) if seed is not None else None
        for start in range(len(temp) - window + 1):
            end = start + window
            if is_subsequence_constant(temp[start:end]):
                if rng is None:
                    temp[start:end] = add_noise_to_series(temp[start:end])
                else:
                    temp[start:end] = temp[start:end] + rng.uniform(
                        0, 0.0000009, size=window)
    return temp
