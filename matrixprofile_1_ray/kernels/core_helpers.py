"""Small structural helpers from the reference core API (reference
core.py:44-118, 121-133, 195-262, 625-716 and pairwise_dist.py:16-33),
re-expressed so code written against the reference keeps working verbatim.

These are pure predicates/utilities — no Ray, no kernels.  The profile
data structures they test are the same ``{'class': ...}`` dicts the
reference enforces (and this repo's ``api.compute``/``analyze`` emit).
"""

from __future__ import annotations

import numpy as np


def is_array_like(a) -> bool:
    """reference core.py:44-57 — list/tuple/ndarray test."""
    return isinstance(a, (list, tuple, np.ndarray))


def is_similarity_join(ts_a, ts_b) -> bool:
    """reference core.py:60-74 — both sides present => AB join."""
    return is_array_like(ts_a) and is_array_like(ts_b)


def is_one_dimensional(a) -> bool:
    """reference core.py:105-118."""
    return np.asarray(a).ndim == 1


def get_profile_length(ts_a, ts_b, m) -> int:
    """reference core.py:121-133 — profile rows for a query of length m.
    (The reference derives it from ts_a regardless of join mode.)"""
    return len(ts_a) - m + 1


def is_nan_inf(val) -> bool:
    """reference core.py:195-208."""
    return bool(np.isnan(val) or np.isinf(val))


def is_not_nan_inf(val) -> bool:
    """reference core.py:211-226."""
    return not is_nan_inf(val)


def nan_inf_indices(a) -> np.ndarray:
    """reference core.py:229-242 — boolean mask of nan/inf positions."""
    a = np.asarray(a)
    return np.isnan(a) | np.isinf(a)


def not_nan_inf_indices(a) -> np.ndarray:
    """reference core.py:245-258."""
    return ~nan_inf_indices(a)


def is_pearson_array(a) -> bool:
    """reference core.py:625-643 — finite values all within [0, 1]."""
    a = np.asarray(a, dtype="d")
    mask = not_nan_inf_indices(a)
    vals = a[mask]
    if vals.size == 0:
        return False
    return bool(vals.min() >= 0 and vals.max() <= 1)


def is_stats_obj(obj) -> bool:
    """reference core.py:646-661."""
    return isinstance(obj, dict) and obj.get("class") == "Statistics"


def is_mp_obj(obj) -> bool:
    """reference core.py:664-679."""
    return isinstance(obj, dict) and obj.get("class") == "MatrixProfile"


def is_pmp_obj(obj) -> bool:
    """reference core.py:682-697."""
    return isinstance(obj, dict) and obj.get("class") == "PMP"


def is_mp_or_pmp_obj(obj) -> bool:
    """reference core.py:700-716."""
    return is_pmp_obj(obj) or is_mp_obj(obj)


def compute_dist(args):
    """reference pairwise_dist.py:16-33 — worker-pool helper mapping
    ``(k, ts_a, ts_b, window_size, threshold)`` to ``(k, mpdist)``.  Kept
    for drop-in compatibility; the distributed path in stages/pairs.py
    fans the same computation out as Ray tasks instead."""
    from .mpdist import mpdist

    k = args[0]
    return (k, mpdist(args[1], args[2], args[3], threshold=args[4]))


def generate_batch_jobs(profile_length, n_jobs):
    """reference core.py:545-570 — yield (start, end) row ranges that
    split a profile across ``n_jobs`` workers.  Ranges never run past
    ``profile_length``; one short profile yields a single full range.
    The Ray engine splits work by Dataset blocks instead, but batch-range
    generation is part of the public core surface."""
    import math

    batch_size = int(math.ceil(profile_length / n_jobs))
    if batch_size == profile_length:
        yield (0, profile_length)
        return
    for i in range(n_jobs):
        start = i * batch_size
        end = min((i + 1) * batch_size, profile_length)
        if start < profile_length:
            yield (start, end)
