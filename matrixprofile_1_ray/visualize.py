"""Visualization layer: plot-data extraction (+ optional matplotlib render).

The reference dispatches on profile structure to a set of matplotlib
figures (reference visualize.py:62-116: series plot, mp/pmp plot, discord
markers, motif overlays, CAC curve, snippet highlights).  This runtime has
no matplotlib, so the engine's equivalent is split: ``plot_data`` computes
exactly the arrays those figures draw (the useful, testable part), and
``render`` turns them into figures when matplotlib is importable.
"""

from __future__ import annotations

import numpy as np


def _is(profile, cls):
    return isinstance(profile, dict) and profile.get("class") == cls


def plot_data(profile) -> dict:
    """-> {name: {x, y, kind, marks?}} for every figure the reference
    would draw for this structure."""
    out = {}
    if _is(profile, "MatrixProfile"):
        mp = np.asarray(profile["mp"], dtype="d")
        out["matrix_profile"] = {
            "x": np.arange(mp.shape[0]), "y": mp, "kind": "line"}
        ts = (profile.get("data") or {}).get("ts")
        if ts is not None:
            ts = np.asarray(ts, dtype="d")
            out["series"] = {"x": np.arange(ts.shape[0]), "y": ts,
                             "kind": "line"}
        if profile.get("cmp") is not None:
            cmp_ = np.asarray(profile["cmp"], dtype="d")
            out["corrected_profile"] = {
                "x": np.arange(cmp_.shape[0]), "y": cmp_, "kind": "line"}
        if profile.get("cac") is not None:
            cac = np.asarray(profile["cac"], dtype="d")
            out["corrected_arc_curve"] = {
                "x": np.arange(cac.shape[0]), "y": cac, "kind": "line",
                "marks": np.asarray(profile.get("regimes", []), dtype=int)}
        if profile.get("discords") is not None:
            idx = np.asarray(profile["discords"], dtype=int)
            out["discords"] = {"x": idx, "y": mp[idx], "kind": "scatter"}
        if profile.get("motifs"):
            w = profile["w"]
            starts = np.array([m["motifs"][0] for m in profile["motifs"]])
            out["motifs"] = {"x": starts, "y": mp[starts], "kind": "scatter",
                             "marks": np.array([w] * len(starts))}
    elif _is(profile, "PMP"):
        out["pan_matrix_profile"] = {
            "x": np.asarray(profile["windows"]),
            "y": np.asarray(profile["pmp"], dtype="d"),
            "kind": "heatmap"}
    elif _is(profile, "Statistics"):
        for key in ("moving_min", "moving_max", "moving_mean", "moving_std",
                    "moving_median"):
            arr = np.asarray(profile[key], dtype="d")
            out[key] = {"x": np.arange(arr.shape[0]), "y": arr, "kind": "line"}
    elif isinstance(profile, list) and profile and "snippet" in profile[0]:
        for rank, snip in enumerate(profile):
            y = np.asarray(snip["snippet"], dtype="d")
            out[f"snippet_{rank}"] = {
                "x": np.arange(y.shape[0]) + snip["index"], "y": y,
                "kind": "line",
                "marks": np.asarray(snip.get("neighbors", []), dtype=int)}
    else:
        raise ValueError("unsupported structure for plot_data")
    return out


def render(profile):
    """matplotlib figures when available (never in this runtime — the data
    path above is the tested surface)."""
    try:
        from matplotlib import pyplot as plt
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError(
            "matplotlib is not available in this runtime; use plot_data() "
            "and render externally") from exc
    figures = []
    for name, spec in plot_data(profile).items():  # pragma: no cover
        fig, ax = plt.subplots()
        if spec["kind"] == "line":
            ax.plot(spec["x"], spec["y"])
        elif spec["kind"] == "scatter":
            ax.scatter(spec["x"], spec["y"])
        else:
            ax.imshow(spec["y"], aspect="auto")
        ax.set_title(name)
        figures.append(fig)
    return figures
