"""Global + moving statistics (reference algorithms/statistics.py:15-90)."""

from __future__ import annotations

import numpy as np

from .moving_stats import moving_avg_std, rolling_window


def statistics(ts, window_size: int):
    """Statistics dict for one series; the engine's rollup tiers flatten
    these into Arrow columns (stages/rollup.py)."""
    ts = np.asarray(ts)
    if ts.ndim != 1:
        raise ValueError("The time series must be 1D")
    if not isinstance(window_size, int):
        raise ValueError("Expecting int for window_size")
    if window_size > len(ts):
        raise ValueError("Window size cannot be greater than len(ts)")
    if window_size < 3:
        raise ValueError("Window size cannot be less than 3")

    moving_mu, moving_sigma = moving_avg_std(ts.astype("d"), window_size)
    rolled = rolling_window(ts, window_size)

    return {
        "ts": ts,
        "min": np.min(ts),
        "max": np.max(ts),
        "mean": np.mean(ts),
        "std": np.std(ts),
        "median": np.median(ts),
        "moving_min": np.min(rolled, axis=1),
        "moving_max": np.max(rolled, axis=1),
        "moving_mean": moving_mu,
        "moving_std": moving_sigma,
        "moving_median": np.median(rolled, axis=1),
        "window_size": window_size,
        "class": "Statistics",
    }
