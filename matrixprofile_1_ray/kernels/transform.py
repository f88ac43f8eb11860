"""Annotation vectors and corrected matrix profile.

Semantics follow reference matrixprofile/transform.py:15-285; the scalar
per-window loops are replaced with vectorized sliding-window reductions.
"""

from __future__ import annotations

import numpy as np

from .moving_stats import moving_std, rolling_window


def make_default_av(ts, window: int):
    """All-ones AV (reference transform.py:90-128)."""
    ts = np.asarray(ts)
    _check(ts, window)
    return np.ones(len(ts) - window + 1)


def make_complexity_av(ts, window: int):
    """Complexity estimate sqrt(sum(diff^2)) per window, min-max rescaled
    (reference transform.py:131-179 — note the reference divides by the
    unshifted max, preserved here)."""
    ts = np.asarray(ts, dtype="d")
    _check(ts, window)
    d2 = np.diff(ts) ** 2
    cs = np.concatenate(([0.0], np.cumsum(d2)))
    av = np.sqrt(cs[window - 1 :] - cs[: len(ts) - window + 1])
    max_val, min_val = np.max(av), np.min(av)
    if max_val == 0:
        return np.zeros(len(av))
    return (av - min_val) / max_val


def make_meanstd_av(ts, window: int):
    """1 where the window std is below the mean std (transform.py:182-227)."""
    ts = np.asarray(ts, dtype="d")
    _check(ts, window)
    std = moving_std(ts, window)
    return (std < np.mean(std)).astype("d")


def make_clipping_av(ts, window: int):
    """Fewer max/min-valued (clipped) points -> more importance
    (transform.py:230-285)."""
    ts = np.asarray(ts, dtype="d")
    _check(ts, window)
    clipped = ((ts == np.max(ts)) | (ts == np.min(ts))).astype("d")
    av = np.sum(rolling_window(clipped, window), axis=-1)
    av -= np.min(av)
    max_val = np.max(av)
    if max_val == 0:
        return np.zeros(len(av))
    return 1 - av / max_val


def apply_av(profile, av: str = "default", custom_av=None):
    """Attach av/cmp to a profile: cmp = mp + (1-av)*max(mp)
    (reference transform.py:15-87)."""
    from .core_helpers import is_mp_obj

    if not is_mp_obj(profile):
        raise ValueError("apply_av expects profile as an MP data structure")

    makers = {
        "default": make_default_av,
        "complexity": make_complexity_av,
        "meanstd": make_meanstd_av,
        "clipping": make_clipping_av,
    }
    if av in makers:
        temp_av = makers[av](profile["data"]["ts"], profile["w"])
    elif av == "custom":
        temp_av = np.asarray(custom_av, dtype="d")
        if temp_av.ndim == 0:
            raise ValueError("apply_av expects custom_av to be array-like")
    else:
        raise ValueError("av parameter is invalid")

    if len(temp_av) != len(profile["mp"]):
        raise ValueError("Lengths of annotation vector and mp are different")
    if (temp_av < 0.0).any() or (temp_av > 1.0).any():
        raise ValueError("Annotation vector values must be between 0 and 1")

    max_val = np.max(profile["mp"])
    profile["cmp"] = profile["mp"] + (1 - temp_av) * max_val
    profile["av"] = temp_av
    profile["av_type"] = av
    return profile


def _check(ts, window):
    if ts.ndim != 1:
        raise ValueError("expects ts to be one-dimensional")
    if not isinstance(window, int):
        raise ValueError("expects window to be an integer")
