"""Visualization layer: plot-data extraction + renderers.

The reference dispatches on profile structure to a set of matplotlib
figures (reference visualize.py:62-116: series plot, mp/pmp plot, discord
markers, motif overlays, CAC curve, snippet highlights).  This runtime has
no matplotlib, so the engine's equivalent is split: ``plot_data`` computes
exactly the arrays those figures draw (the useful, testable part);
``render`` turns them into matplotlib figures when that is importable; and
``render_svg`` produces standalone SVG documents with no dependency at
all, so every figure the reference draws is viewable in this runtime too.
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


def _svg_scale(v: np.ndarray, lo: float, hi: float, out_lo: float,
               out_hi: float) -> np.ndarray:
    span = hi - lo if hi > lo else 1.0
    return out_lo + (np.asarray(v, dtype="d") - lo) / span * (out_hi - out_lo)


def _svg_doc(body: str, width: int, height: int, title: str) -> str:
    return (
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height}" viewBox="0 0 {width} {height}">'
        f'<rect width="{width}" height="{height}" fill="white"/>'
        f'<text x="8" y="16" font-family="sans-serif" font-size="13">'
        f"{title}</text>{body}</svg>")


def render_svg(profile, width: int = 640, height: int = 240) -> dict:
    """-> {figure_name: svg_string} for every figure ``plot_data`` yields.

    A dependency-free renderer: line figures become polylines, scatter
    figures circles, heatmaps (PMP) a grayscale cell grid; ``marks``
    (regimes / motif windows / snippet neighbors) draw as vertical rules.
    SVG is plain XML, so this closes the render gap without matplotlib."""
    pad, top = 34.0, 26.0
    figures = {}
    for name, spec in plot_data(profile).items():
        body = []
        if spec["kind"] == "heatmap":
            grid = np.asarray(spec["y"], dtype="d")
            finite = np.isfinite(grid)
            lo = float(grid[finite].min()) if finite.any() else 0.0
            hi = float(grid[finite].max()) if finite.any() else 1.0
            rows, cols = grid.shape
            cw = (width - 2 * pad) / max(cols, 1)
            ch = (height - top - pad) / max(rows, 1)
            # subsample columns so the SVG stays bounded for long profiles
            step = max(1, cols // 512)
            for r in range(rows):
                for c in range(0, cols, step):
                    v = grid[r, c]
                    if not np.isfinite(v):
                        continue
                    shade = int(255 * (1 - (v - lo) / (hi - lo or 1.0)))
                    body.append(
                        f'<rect x="{pad + c * cw:.1f}" '
                        f'y="{top + r * ch:.1f}" width="{cw * step:.2f}" '
                        f'height="{ch:.2f}" '
                        f'fill="rgb({shade},{shade},{shade})"/>')
        else:
            x = np.asarray(spec["x"], dtype="d")
            y = np.asarray(spec["y"], dtype="d")
            keep = np.isfinite(y)
            x, y = x[keep], y[keep]
            if x.size == 0:
                figures[name] = _svg_doc("", width, height, name)
                continue
            x_lo, x_hi = float(x.min()), float(x.max())
            y_lo, y_hi = float(y.min()), float(y.max())
            px = _svg_scale(x, x_lo, x_hi, pad, width - pad)
            # SVG y grows downward
            py = _svg_scale(y, y_lo, y_hi, height - pad, top)
            for m in np.asarray(spec.get("marks", []), dtype="d").ravel():
                if x_lo <= m <= x_hi:
                    mx = _svg_scale(np.array([m]), x_lo, x_hi, pad,
                                    width - pad)[0]
                    body.append(
                        f'<line x1="{mx:.1f}" y1="{top}" x2="{mx:.1f}" '
                        f'y2="{height - pad}" stroke="#c33" '
                        f'stroke-dasharray="4 3"/>')
            if spec["kind"] == "line":
                # cap point count so corpus-scale profiles render small
                step = max(1, x.size // 2048)
                pts = " ".join(f"{a:.1f},{b:.1f}"
                               for a, b in zip(px[::step], py[::step]))
                body.append(f'<polyline points="{pts}" fill="none" '
                            f'stroke="#1f77b4" stroke-width="1.2"/>')
            else:  # scatter
                body.extend(
                    f'<circle cx="{a:.1f}" cy="{b:.1f}" r="3.5" '
                    f'fill="#d62728"/>' for a, b in zip(px, py))
            body.append(
                f'<line x1="{pad}" y1="{height - pad}" x2="{width - pad}" '
                f'y2="{height - pad}" stroke="#888"/>')
            body.append(
                f'<line x1="{pad}" y1="{top}" x2="{pad}" '
                f'y2="{height - pad}" stroke="#888"/>')
            body.append(
                f'<text x="{pad}" y="{height - 8}" font-family="sans-serif" '
                f'font-size="10">{x_lo:.0f}</text>')
            body.append(
                f'<text x="{width - pad - 30}" y="{height - 8}" '
                f'font-family="sans-serif" font-size="10">{x_hi:.0f}</text>')
        figures[name] = _svg_doc("".join(body), width, height, name)
    return figures


def render_svg_to_dir(profile, out_dir: str, **kwargs) -> list:
    """Write each figure as ``<out_dir>/<name>.svg``; returns the paths."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for name, svg in render_svg(profile, **kwargs).items():
        path = os.path.join(out_dir, f"{name}.svg")
        with open(path, "w") as f:
            f.write(svg)
        paths.append(path)
    return paths


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
