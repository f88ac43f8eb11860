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
            starts = np.array([m["motifs"][0] for m in profile["motifs"]])
            # marks are x POSITIONS everywhere (render_svg draws vertical
            # rules at them) — both members of each motif pair, never the
            # window size (which is not a location)
            pair_starts = np.array(sorted({int(i) for m in profile["motifs"]
                                           for i in m["motifs"]}), dtype=int)
            out["motifs"] = {"x": starts, "y": mp[starts], "kind": "scatter",
                             "marks": pair_starts}
    elif _is(profile, "PMP"):
        out["pan_matrix_profile"] = {
            "x": np.asarray(profile["windows"]),
            "y": np.asarray(profile["pmp"], dtype="d"),
            "kind": "heatmap"}
    elif _is(profile, "Statistics"):
        # the reference stats figure draws the raw series panel first
        # (reference visualize.py:119-145); omitting it here left render/
        # render_svg without the black time-series panel figure_specs has
        if profile.get("ts") is not None:
            ts = np.asarray(profile["ts"], dtype="d")
            out["time_series"] = {"x": np.arange(ts.shape[0]), "y": ts,
                                  "kind": "line"}
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
            marks_arr = np.asarray(spec.get("marks", []), dtype="d").ravel()
            marks_arr = marks_arr[np.isfinite(marks_arr)]
            if marks_arr.size:
                # the x domain must COVER the marks: a motif-pair scatter's
                # own x-extent collapses to its points, and clipping rules
                # to that extent silently dropped the pair's other member
                x_lo = min(x_lo, float(marks_arr.min()))
                x_hi = max(x_hi, float(marks_arr.max()))
            y_lo, y_hi = float(y.min()), float(y.max())
            px = _svg_scale(x, x_lo, x_hi, pad, width - pad)
            # SVG y grows downward
            py = _svg_scale(y, y_lo, y_hi, height - pad, top)
            for m in marks_arr:
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


def _runs_to_intervals(indices) -> list:
    """Merge consecutive index runs into [start, end] intervals (the
    reference's neighbor-highlight grouping, visualize.py:600-667)."""
    idx = np.asarray(sorted(set(int(i) for i in np.asarray(indices).ravel())))
    if idx.size == 0:
        return []
    breaks = np.flatnonzero(np.diff(idx) != 1)
    starts = np.concatenate(([0], breaks + 1))
    ends = np.concatenate((breaks, [idx.size - 1]))
    return [[int(idx[s]), int(idx[e])] for s, e in zip(starts, ends)]


def _nanpad(arr, total: int) -> np.ndarray:
    arr = np.asarray(arr, dtype="d")
    if arr.shape[0] >= total:
        return arr
    return np.concatenate([arr, np.full(total - arr.shape[0], np.nan)])


def _line(y, color="#1f77b4", x=None, kind="line"):
    y = np.asarray(y, dtype="d")
    return {"x": np.arange(y.shape[0]) if x is None else np.asarray(x),
            "y": y, "color": color, "kind": kind}


def figure_specs(profile, ts=None) -> dict:
    """Reference-parity figure compositions as data (no plotting library):
    one entry per figure the reference's ``visualize()`` dispatch would
    draw (reference visualize.py:62-116), each a grid of PANELS carrying
    the exact series/marker arrays of the corresponding reference figure —
    plot_mp's stacked Data/Query/MP/LMP/RMP axes, plot_discords_mp's
    Data / MP-heat-strip / starred-MP triplet (height ratios 25/5/25),
    plot_motifs_mp's per-pair subsequence grid AND whole-series overlay
    (red motifs, black neighbors), plot_cmp_mp / plot_av_mp, plot_pmp's
    depth-256 quantized heat image, plot_stats' two-panel layout, and
    plot_snippets' run-merged neighbor highlights.

    Shape: {figure_name: {"rows": [[panel, ...], ...]}} where panel =
    {"ylabel", "title", "height", "series": [{x, y, color, kind}]};
    series kinds: line, scatter, strip (1-row heat), image (2-D heat)."""
    figs = {}
    if _is(profile, "MatrixProfile"):
        data = profile.get("data") or {}
        ts = np.asarray(data["ts"], dtype="d") if data.get("ts") is not None \
            else (np.asarray(ts, dtype="d") if ts is not None else None)
        query = data.get("query")
        mp = np.asarray(profile["mp"], dtype="d")
        w = int(profile["w"])
        n = (ts.shape[0] if ts is not None else mp.shape[0] + w - 1)

        stacked = []
        if ts is not None:
            stacked.append({"ylabel": "Data", "title": None, "height": 1.0,
                            "series": [_line(ts)]})
        if query is not None:
            stacked.append({"ylabel": "Query", "title": None, "height": 1.0,
                            "series": [_line(np.asarray(query, dtype="d"))]})
        for key, label in (("mp", "Matrix Profile"),
                           ("lmp", "Left Matrix Profile"),
                           ("rmp", "Right Matrix Profile")):
            if profile.get(key) is None:
                continue
            stacked.append({
                "ylabel": label, "title": f"Window Size {w}", "height": 1.0,
                "series": [_line(_nanpad(profile[key], n))]})
        figs["mp"] = {"rows": [[p] for p in stacked]}

        for key, label, name in (("cmp", "Corrected Matrix Profile", "cmp_mp"),
                                 ("av", "Annotation Vector", "av_mp")):
            if profile.get(key) is not None and len(profile[key]) > 0:
                figs[name] = {"rows": [[{
                    "ylabel": label, "title": f"Window Size {w}",
                    "height": 1.0,
                    "series": [_line(_nanpad(profile[key], n))]}]]}

        motifs = profile.get("motifs")
        motifs = [] if motifs is None else list(motifs)
        if motifs and ts is not None:
            pair_rows, overlay_rows = [], []
            for k, motif in enumerate(motifs):
                row = []
                for idx in motif.get("motifs", []):
                    idx = int(np.asarray(idx).ravel()[0])
                    row.append({
                        "ylabel": f"Motif {k + 1}",
                        "title": f"Index Start {idx}", "height": 1.0,
                        "series": [_line(ts[idx : idx + w])]})
                pair_rows.append(row)
                series = [_line(ts)]
                for idx in motif.get("motifs", []):
                    idx = int(np.asarray(idx).ravel()[0])
                    series.append(_line(ts[idx : idx + w], color="#d62728",
                                        x=np.arange(idx, idx + w)))
                for idx in motif.get("neighbors", []):
                    idx = int(np.asarray(idx).ravel()[0])
                    series.append(_line(ts[idx : idx + w], color="#000000",
                                        x=np.arange(idx, idx + w)))
                overlay_rows.append([{
                    "ylabel": f"Motif {k + 1}", "title": None,
                    "height": 1.0, "series": series}])
            figs["motifs_mp_pairs"] = {"rows": pair_rows}
            figs["motifs_mp_overlay"] = {"rows": overlay_rows}

        discords = profile.get("discords")
        if discords is not None and len(discords) > 0 and ts is not None:
            mp_adj = _nanpad(mp, mp.shape[0] + w + 1)
            idxs = np.asarray([int(np.asarray(d).ravel()[0])
                               for d in discords])
            figs["discords_mp"] = {"rows": [
                [{"ylabel": "Data", "title": None, "height": 25.0,
                  "series": [_line(ts)]}],
                [{"ylabel": "", "title": None, "height": 5.0,
                  "series": [{"x": np.arange(mp_adj.shape[0]),
                              "y": mp_adj, "color": "coolwarm",
                              "kind": "strip"}]}],
                [{"ylabel": "Matrix Profile",
                  "title": f"Window Size {w}", "height": 25.0,
                  "series": [_line(mp_adj),
                             {"x": idxs, "y": mp_adj[idxs],
                              "color": "#d62728", "kind": "scatter"}]}],
            ]}
    elif _is(profile, "PMP"):
        pmp = np.asarray(profile["pmp"], dtype="d")
        quant = np.ceil(pmp * 256) / 256
        quant = np.minimum(quant, 1.0)
        figs["pmp"] = {"rows": [[{
            "ylabel": "Window Size", "title": "Pan-MatrixProfile",
            "height": 1.0,
            "series": [{"x": np.asarray(profile["windows"]), "y": quant,
                        "color": "viridis", "kind": "image",
                        "invert_y": True}]}]]}
        data = profile.get("data") or {}
        pts = (np.asarray(data["ts"], dtype="d")
               if data.get("ts") is not None else None)
        windows = np.asarray(profile["windows"])

        # motifs: exactly TWO figures — per-pair subsequence grid + whole-
        # series overlay (reference visualize.py:517-597 appends twice),
        # matching the MP layout above but with per-location window sizes.
        motifs = profile.get("motifs")
        motifs = [] if motifs is None else list(motifs)
        if motifs and pts is not None:
            pair_rows, overlay_rows = [], []
            for k, motif in enumerate(motifs):
                row = []
                for loc in motif.get("motifs", []):
                    loc = np.asarray(loc).ravel()
                    w, idx = int(windows[int(loc[0])]), int(loc[1])
                    row.append({
                        "ylabel": f"Motif {k + 1}",
                        "title": f"Index Start {idx}, Window Size {w}",
                        "height": 1.0, "series": [_line(pts[idx : idx + w])]})
                pair_rows.append(row)
                series = [_line(pts)]
                for loc in motif.get("motifs", []):
                    loc = np.asarray(loc).ravel()
                    w, idx = int(windows[int(loc[0])]), int(loc[1])
                    series.append(_line(pts[idx : idx + w], color="#d62728",
                                        x=np.arange(idx, idx + w)))
                for loc in motif.get("neighbors", []):
                    loc = np.asarray(loc).ravel()
                    w, idx = int(windows[int(loc[0])]), int(loc[1])
                    series.append(_line(pts[idx : idx + w], color="#000000",
                                        x=np.arange(idx, idx + w)))
                overlay_rows.append([{
                    "ylabel": f"Motif {k + 1}", "title": None,
                    "height": 1.0, "series": series}])
            figs["motifs_pmp_pairs"] = {"rows": pair_rows}
            figs["motifs_pmp_overlay"] = {"rows": overlay_rows}

        # discords: one figure per discord (reference visualize.py:380-437)
        items = profile.get("discords")
        items = [] if items is None else list(items)
        for k, item in enumerate(items):
            loc = np.asarray(item).ravel()
            row_i, idx = int(loc[0]), int(loc[1])
            mp_row = pmp[row_i]
            w = int(windows[row_i])
            rows = []
            if pts is not None:
                rows.append([{"ylabel": "Data", "title": None,
                              "height": 25.0, "series": [_line(pts)]}])
            rows.append([{"ylabel": "", "title": None, "height": 5.0,
                          "series": [{"x": np.arange(mp_row.shape[0]),
                                      "y": mp_row, "color": "coolwarm",
                                      "kind": "strip"}]}])
            rows.append([{"ylabel": "Matrix Profile",
                          "title": f"Window Size = {w}", "height": 25.0,
                          "series": [_line(mp_row),
                                     {"x": np.array([idx]),
                                      "y": mp_row[[idx]],
                                      "color": "#d62728",
                                      "kind": "scatter"}]}])
            figs[f"discords_pmp_{k}"] = {"rows": rows}
    elif _is(profile, "Statistics"):
        movers = [{"label": k, "y": np.asarray(v, dtype="d")}
                  for k, v in profile.items() if k.startswith("moving")]
        rows = [[{"ylabel": "Time Series", "title": None, "height": 1.0,
                  "series": [_line(np.asarray(profile.get("ts"), dtype="d"),
                                   color="#000000")]}],
                [{"ylabel": "Moving Statistics", "title": None,
                  "height": 1.0,
                  "series": [_line(m["y"]) for m in movers]}]]
        palette = ["#1f77b4", "#ff7f0e", "#2ca02c", "#d62728", "#9467bd"]
        for i, s in enumerate(rows[1][0]["series"]):
            s["color"] = palette[i % len(palette)]
        figs["stats"] = {"rows": rows}
    elif isinstance(profile, list) and profile and "snippet" in profile[0]:
        if ts is None:
            raise ValueError("plot_snippets composition needs the series")
        ts = np.asarray(ts, dtype="d")
        for i, snip in enumerate(profile):
            start = int(snip["index"])
            y = np.asarray(snip["snippet"], dtype="d")
            series = [_line(ts)]
            for a, b in _runs_to_intervals(snip.get("neighbors", [])):
                series.append(_line(ts[a : b + 1], color="#ff7f0e",
                                    x=np.arange(a, b + 1)))
            series.append(_line(y, color="#d62728",
                                x=np.arange(start, start + y.shape[0])))
            figs[f"snippet_{i}"] = {"rows": [[{
                "ylabel": "Data", "title": f"Snippet-{i + 1}",
                "height": 1.0, "series": series}]]}
    else:
        raise ValueError("unsupported structure for figure_specs")
    return figs


def _strip_color(frac: float) -> str:
    """coolwarm-ish blue->white->red ramp for heat strips."""
    frac = min(max(frac, 0.0), 1.0)
    if frac < 0.5:
        t = frac * 2
        r, g, b = int(59 + t * 196), int(76 + t * 179), 255
    else:
        t = (frac - 0.5) * 2
        r, g, b = 255, int(255 - t * 179), int(255 - t * 195)
    return f"rgb({r},{g},{b})"


def render_svg_figures(profile, ts=None, width: int = 720,
                       panel_height: int = 110) -> dict:
    """Render every :func:`figure_specs` composition to one standalone SVG
    per figure — stacked/gridded panels, shared horizontal scale per
    column, heat strips and quantized PMP images included."""
    figures = {}
    for name, fig in figure_specs(profile, ts=ts).items():
        rows = fig["rows"]
        heights = [max(p["height"] for p in row) for row in rows]
        total_h = sum(heights) or 1.0
        canvas_h = panel_height * max(len(rows), 1)
        body = []
        y_cursor = 24.0
        usable_h = canvas_h - 24 - 8
        for row, h in zip(rows, heights):
            band_h = usable_h * (h / total_h)
            ncols = len(row)
            for ci, panel in enumerate(row):
                x0 = 40 + ci * ((width - 48) / ncols)
                x1 = 40 + (ci + 1) * ((width - 48) / ncols) - 8
                y0, y1 = y_cursor, y_cursor + band_h - 18
                body.append(
                    f'<line x1="{x0}" y1="{y1:.1f}" x2="{x1:.1f}" '
                    f'y2="{y1:.1f}" stroke="#888"/>')
                if panel.get("title"):
                    body.append(
                        f'<text x="{x0}" y="{y0 - 4:.1f}" '
                        f'font-family="sans-serif" font-size="10">'
                        f'{panel["title"]}</text>')
                if panel.get("ylabel"):
                    body.append(
                        f'<text x="4" y="{(y0 + y1) / 2:.1f}" '
                        f'font-family="sans-serif" font-size="9">'
                        f'{panel["ylabel"][:18]}</text>')
                finite_x = [np.asarray(s["x"], dtype="d")
                            for s in panel["series"]
                            if np.asarray(s["x"]).size]
                if not finite_x:
                    continue
                gx_lo = min(float(np.nanmin(a)) for a in finite_x)
                gx_hi = max(float(np.nanmax(a)) for a in finite_x)
                ys = [np.asarray(s["y"], dtype="d") for s in panel["series"]
                      if s["kind"] in ("line", "scatter")]
                yvals = (np.concatenate([y[np.isfinite(y)] for y in ys])
                         if ys else np.array([0.0, 1.0]))
                if yvals.size == 0:
                    yvals = np.array([0.0, 1.0])
                gy_lo, gy_hi = float(yvals.min()), float(yvals.max())
                for s in panel["series"]:
                    sx = np.asarray(s["x"], dtype="d")
                    sy = np.asarray(s["y"], dtype="d")
                    if s["kind"] == "strip":
                        keep = np.isfinite(sy)
                        if not keep.any():
                            continue
                        lo, hi = sy[keep].min(), sy[keep].max()
                        step = max(1, sx.size // 512)
                        cw = (x1 - x0) / max(sx.size, 1) * step
                        for c in range(0, sx.size, step):
                            if not np.isfinite(sy[c]):
                                continue
                            frac = (sy[c] - lo) / ((hi - lo) or 1.0)
                            body.append(
                                f'<rect x="{x0 + c / max(sx.size, 1) * (x1 - x0):.1f}" '
                                f'y="{y0:.1f}" width="{cw:.2f}" '
                                f'height="{y1 - y0:.1f}" '
                                f'fill="{_strip_color(float(frac))}"/>')
                    elif s["kind"] == "image":
                        grid = sy
                        finite = np.isfinite(grid)
                        lo = float(grid[finite].min()) if finite.any() else 0
                        hi = float(grid[finite].max()) if finite.any() else 1
                        nr, nc = grid.shape
                        step = max(1, nc // 512)
                        cw = (x1 - x0) / max(nc, 1)
                        ch = (y1 - y0) / max(nr, 1)
                        for r in range(nr):
                            # invert_y: row 0 (smallest window) at bottom
                            ry = (y1 - (r + 1) * ch) if s.get("invert_y") \
                                else (y0 + r * ch)
                            for c in range(0, nc, step):
                                v = grid[r, c]
                                if not np.isfinite(v):
                                    continue
                                shade = int(255 * (1 - (v - lo)
                                                   / ((hi - lo) or 1.0)))
                                body.append(
                                    f'<rect x="{x0 + c * cw:.1f}" '
                                    f'y="{ry:.1f}" width="{cw * step:.2f}" '
                                    f'height="{ch:.2f}" fill="rgb({shade},'
                                    f'{shade},{shade})"/>')
                    else:
                        keep = np.isfinite(sy)
                        sx, sy = sx[keep], sy[keep]
                        if sx.size == 0:
                            continue
                        px = _svg_scale(sx, gx_lo, gx_hi, x0, x1)
                        py = _svg_scale(sy, gy_lo, gy_hi, y1, y0)
                        if s["kind"] == "line":
                            step = max(1, sx.size // 2048)
                            pts = " ".join(
                                f"{a:.1f},{b:.1f}"
                                for a, b in zip(px[::step], py[::step]))
                            body.append(
                                f'<polyline points="{pts}" fill="none" '
                                f'stroke="{s["color"]}" stroke-width="1.1"/>')
                        else:
                            body.extend(
                                f'<circle cx="{a:.1f}" cy="{b:.1f}" r="3.5" '
                                f'fill="{s["color"]}"/>'
                                for a, b in zip(px, py))
            y_cursor += band_h
        figures[name] = _svg_doc("".join(body), width, canvas_h, name)
    return figures


# --- named per-figure entry points (reference visualize.py:119-667) ------
# The reference exposes one public function per figure; each returns a
# matplotlib Figure there.  Here each returns the same composition as a
# panel-spec dict (single figure) or {name: spec} (figure families) —
# feed them to render_svg_figures-style renderers or external plotting.


def _named_figs(profile, prefix: str, ts=None) -> dict:
    specs = figure_specs(profile, ts=ts)
    return {k: v for k, v in specs.items()
            if k == prefix or k.startswith(prefix + "_")}


def plot_mp(profile):
    """reference visualize.py:181-264 — stacked Data/Query/MP/LMP/RMP."""
    return figure_specs(profile)["mp"]


def plot_cmp_mp(profile):
    """reference visualize.py:267-294."""
    return figure_specs(profile)["cmp_mp"]


def plot_av_mp(profile):
    """reference visualize.py:297-324."""
    return figure_specs(profile)["av_mp"]


def plot_discords_mp(profile):
    """reference visualize.py:327-377 — Data / heat-strip / starred MP."""
    return figure_specs(profile)["discords_mp"]


def plot_motifs_mp(profile):
    """reference visualize.py:440-514 — per-pair grid + series overlay
    ({name: spec}; the reference returns the same two figure kinds)."""
    return _named_figs(profile, "motifs_mp")


def plot_pmp(profile):
    """reference visualize.py:148-178 — depth-256 quantized PMP image."""
    return figure_specs(profile)["pmp"]


def plot_discords_pmp(profile):
    """reference visualize.py:380-437 — one figure per discord."""
    return _named_figs(profile, "discords_pmp")


def plot_motifs_pmp(profile):
    """reference visualize.py:517-597 — exactly TWO figures regardless of
    motif count (per-pair subsequence grid + whole-series overlay)."""
    return _named_figs(profile, "motifs_pmp")


def plot_stats(profile):
    """reference visualize.py:119-145 — series + moving-stats panels."""
    return figure_specs(profile)["stats"]


def plot_snippets(snippets, ts):
    """reference visualize.py:600-667 — one figure per snippet with
    run-merged neighbor highlights over the series."""
    return _named_figs(list(snippets), "snippet", ts=ts)


def is_visualizable(obj) -> bool:
    """reference visualize.py:43-59 — MP, PMP or Statistics structure."""
    return (_is(obj, "MatrixProfile") or _is(obj, "PMP")
            or _is(obj, "Statistics"))


def visualize(profile) -> list:
    """Drop-in analog of reference visualize.py:62-116: dispatch on the
    profile structure and return the full list of figures (matrix profile,
    discords, motifs, CAC, snippets, stats — whichever the structure
    carries).  The reference returns matplotlib Figure objects; this
    runtime has no matplotlib, so each figure is a standalone SVG document
    string from the same panel compositions (``render`` yields actual
    matplotlib figures when it is importable)."""
    if not is_visualizable(profile):
        raise ValueError("MatrixProfile, Pan-MatrixProfile or Statistics "
                         "data structure expected!")
    return list(render_svg_figures(profile).values())


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
