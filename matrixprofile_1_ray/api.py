"""Drop-in single-series entry points mirroring the reference's
``matrixprofile.compute`` / ``matrixprofile.analyze`` call shapes
(reference compute.py:29-145, analyze.py:173-272), so a user of the
reference can switch imports and keep their driver code.  ``n_jobs`` is
accepted for signature compatibility; per-series kernels here are the
optimized serial ones (the distributed axes live in the Dataset pipelines
and state/chunked.py).

``analyze`` returns ``(profile, figures)`` where figures are the
plot-data dicts of :mod:`matrixprofile_1_ray.visualize` (matplotlib is not
present in this runtime).
"""

from __future__ import annotations

import numpy as np

from .kernels.mpx import mpx
from .kernels.preprocess import preprocess as _preprocess
from .kernels.preprocess import validate_preprocess_kwargs
from .kernels.scrimp import scrimp_plus_plus
from .kernels.skimp import maximum_subsequence, skimp
from .kernels.discover import top_k_discords, top_k_motifs


def compute(ts, windows=None, query=None, sample_pct: float = 1,
            threshold: float = 0.98, n_jobs: int = 1,
            preprocessing_kwargs=None):
    """Reference compute.py:29-145 dispatch on a single series."""
    ts = np.asarray(ts, dtype="d")
    # normalize every iterable (list/tuple/range/ndarray) to a plain list
    # so the dispatch below never crashes on e.g. a single-element range
    if windows is not None and not isinstance(windows, (int, np.integer)):
        windows = [int(w) for w in windows]
    if windows == []:
        # the reference errors on an empty window list (inside mpx for
        # compute, RuntimeError for analyze) — silently taking the
        # threshold-PMP path would mask the caller's bug at full PMP cost
        raise ValueError("windows must be a non-empty iterable, an int, "
                         "or None (threshold dispatch)")
    multiple_windows = isinstance(windows, list) and len(windows) > 1
    no_windows = windows is None

    if no_windows and threshold is None:
        raise ValueError("compute requires a threshold or window(s) to be set!")
    if ((isinstance(windows, (int, np.integer)) and windows < 4)
            or (isinstance(windows, list) and any(w < 4 for w in windows))):
        raise ValueError("Compute requires all window sizes to be greater than 3!")
    if isinstance(windows, list) and len(windows) == 1:
        windows = windows[0]

    kwargs = validate_preprocess_kwargs(preprocessing_kwargs)
    if kwargs:
        ts = _preprocess(ts, window=kwargs["window"],
                         impute_method=kwargs["impute_method"],
                         impute_direction=kwargs["impute_direction"],
                         add_noise=kwargs["add_noise"])

    if no_windows and threshold is not None:
        partial = maximum_subsequence(ts, threshold, include_pmp=True)
        _require_upper_window(partial, threshold)
        windows = range(8, partial["upper_window"] + 1)
        return skimp(ts, windows=windows, sample_pct=sample_pct,
                     pmp_obj=partial)
    if multiple_windows:
        return skimp(ts, windows=windows, sample_pct=1)
    if sample_pct >= 1:
        return mpx(ts, int(windows), query=query)
    return scrimp_plus_plus(ts, int(windows), query=query,
                            sample_pct=sample_pct)


def _require_upper_window(partial, threshold) -> None:
    """maximum_subsequence returns np.nan (with a warning) when no window
    clears the correlation threshold — e.g. white noise.  The reference
    then crashes with an opaque ``TypeError: 'float' object is not
    subscriptable``; raise the actionable error instead."""
    if not isinstance(partial, dict):
        raise ValueError(
            f"no window size reaches correlation threshold {threshold}: "
            f"the series has no repeated structure to profile — lower the "
            f"threshold or pass explicit windows=")


def analyze(ts, query=None, windows=None, sample_pct: float = 1.0,
            threshold: float = 0.98, n_jobs: int = 1,
            preprocessing_kwargs=None):
    """Reference analyze.py:173-272: compute + motifs + discords +
    figure data."""
    kwargs = validate_preprocess_kwargs(preprocessing_kwargs)
    ts = np.asarray(ts, dtype="d")
    if kwargs:
        ts = _preprocess(ts, window=kwargs["window"],
                         impute_method=kwargs["impute_method"],
                         impute_direction=kwargs["impute_direction"],
                         add_noise=kwargs["add_noise"])

    # keep compute()'s window validation (reference compute.py:100-101)
    # but dispatch like reference analyze.py:257-270: the PMP path must
    # honor sample_pct (compute()'s multi-window branch pins it to 1) and
    # a None threshold defaults to 0.98 inside analyze_pmp rather than
    # raising
    if windows is not None and not isinstance(windows, (int, np.integer)):
        windows = [int(w) for w in windows]
    if ((isinstance(windows, (int, np.integer)) and windows < 4)
            or (isinstance(windows, list) and any(w < 4 for w in windows))):
        raise ValueError("Compute requires all window sizes to be greater than 3!")

    if windows == []:
        # reference analyze.py:271 raises on this param combination
        raise ValueError("windows must be a non-empty iterable, an int, "
                         "or None (threshold dispatch)")
    no_window = windows is None
    many_windows = isinstance(windows, list) and len(windows) > 1
    if isinstance(windows, list) and len(windows) == 1:
        windows = windows[0]

    if no_window or many_windows:
        return analyze_pmp(ts, query, sample_pct, threshold,
                           windows=None if no_window else windows)
    if sample_pct >= 1:
        return analyze_mp_exact(ts, query, windows)
    if sample_pct > 0:
        return analyze_mp_approximate(ts, query, windows, sample_pct)
    # reference analyze.py:270: a single window with sample_pct <= 0 is
    # neither exact nor approximate — running scrimp++ with 0 samples
    # would return a meaningless profile instead of this contract error
    raise RuntimeError("Param combination resulted in an uknown operation")


def _discover_and_figures(profile):
    """Motifs + discords, then the figure list: one entry per figure the
    reference's ``visualize()`` would draw, in the same order and count
    (reference visualize.py:62-116 — MP: profile/[cmp]/[av]/motifs x2/
    discords = 4 by default; PMP: pmp/motifs x2/discords-per-discord = 6
    with the default k=3).  Each entry is a panel-composition dict
    (visualize.figure_specs); ``plot_data(profile)`` remains available for
    the flat arrays."""
    profile = top_k_motifs(profile)
    profile = top_k_discords(profile)
    from .visualize import figure_specs

    return profile, [{"name": name, **spec}
                     for name, spec in figure_specs(profile).items()]


def analyze_mp_exact(ts, query, window, n_jobs: int = 1):
    """Reference analyze.py:87-126: exact MP + top motifs/discords +
    figures for one window."""
    ts = np.asarray(ts, dtype="d")
    return _discover_and_figures(mpx(ts, int(window), query=query))


def analyze_mp_approximate(ts, query, window, sample_pct, n_jobs: int = 1):
    """Reference analyze.py:128-170: SCRIMP++ sampled MP + discovery +
    figures."""
    ts = np.asarray(ts, dtype="d")
    return _discover_and_figures(
        scrimp_plus_plus(ts, int(window), query=query,
                         sample_pct=sample_pct))


def analyze_pmp(ts, query, sample_pct, threshold, windows=None,
                n_jobs: int = 1):
    """Reference analyze.py:25-84: PMP over given windows, or windows
    derived from the maximum_subsequence upper window when None."""
    ts = np.asarray(ts, dtype="d")
    threshold = 0.98 if threshold is None else threshold
    partial = None
    if windows is None:
        partial = maximum_subsequence(ts, threshold, include_pmp=True)
        _require_upper_window(partial, threshold)
        windows = range(8, partial["upper_window"] + 1)
    return _discover_and_figures(
        skimp(ts, windows=windows, sample_pct=sample_pct, pmp_obj=partial))
