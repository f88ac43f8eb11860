"""Reference-parity figure compositions (figure_specs) and their SVG
rendering — the reference's visualize() dispatch, panel by panel."""

import numpy as np
import pytest

import matrixprofile_1_ray.kernels as K
from matrixprofile_1_ray.visualize import (
    _runs_to_intervals,
    figure_specs,
    render_svg_figures,
)


@pytest.fixture(scope="module")
def mp_profile(sampledata):
    prof = K.top_k_motifs(K.top_k_discords(K.mpx(sampledata, 32)))
    prof = K.apply_av(prof, "complexity")
    return prof


def test_runs_to_intervals():
    assert _runs_to_intervals([5, 6, 7, 12, 13, 20]) == [[5, 7], [12, 13],
                                                         [20, 20]]
    assert _runs_to_intervals([]) == []


def test_mp_figure_composition(mp_profile):
    figs = figure_specs(mp_profile)
    # plot_mp: stacked shared-x panels: Data + Matrix Profile (nan-padded)
    mp_fig = figs["mp"]
    labels = [row[0]["ylabel"] for row in mp_fig["rows"]]
    assert labels[0] == "Data" and "Matrix Profile" in labels
    n = len(mp_profile["data"]["ts"])
    mp_panel = mp_fig["rows"][labels.index("Matrix Profile")][0]
    assert len(mp_panel["series"][0]["y"]) == n          # nan-padded to n
    assert np.isnan(mp_panel["series"][0]["y"][-1])
    # cmp/av single-panel figures exist after apply_av
    assert "cmp_mp" in figs and "av_mp" in figs
    # discords figure: 25/5/25 triplet with heat strip + starred profile
    d = figs["discords_mp"]["rows"]
    assert [r[0]["height"] for r in d] == [25.0, 5.0, 25.0]
    assert d[1][0]["series"][0]["kind"] == "strip"
    kinds = [s["kind"] for s in d[2][0]["series"]]
    assert kinds == ["line", "scatter"]
    # motifs: per-pair subsequence grid (2 cols) + whole-series overlay
    pair_rows = figs["motifs_mp_pairs"]["rows"]
    assert all(len(r) == 2 for r in pair_rows if r)
    for r in pair_rows:
        for p in r:
            assert len(p["series"][0]["y"]) == mp_profile["w"]
    overlay = figs["motifs_mp_overlay"]["rows"][0][0]["series"]
    colors = {s["color"] for s in overlay}
    assert "#d62728" in colors                           # red motif overlay


def test_pmp_and_stats_and_snippets_compositions(sampledata):
    pmp = {
        "class": "PMP",
        "pmp": np.abs(np.random.default_rng(0).normal(size=(3, 100))),
        "pmpi": np.zeros((3, 100), dtype=int),
        "windows": np.array([8, 16, 32]),
        "discords": [(1, 40)],
        "data": {"ts": np.arange(131, dtype="d")},
    }
    figs = figure_specs(pmp)
    assert figs["pmp"]["rows"][0][0]["series"][0]["kind"] == "image"
    assert (figs["pmp"]["rows"][0][0]["series"][0]["y"] <= 1.0).all()
    assert "discords_pmp_0" in figs

    stats = K.statistics(sampledata, 16)
    sfigs = figure_specs(stats)
    assert len(sfigs["stats"]["rows"]) == 2
    assert len(sfigs["stats"]["rows"][1][0]["series"]) >= 4

    snips = [{"snippet": sampledata[:64], "index": 0,
              "neighbors": [100, 101, 102, 200]}]
    snfigs = figure_specs(snips, ts=sampledata)
    series = snfigs["snippet_0"]["rows"][0][0]["series"]
    # base + 2 merged neighbor intervals + red snippet
    assert len(series) == 4
    assert series[-1]["color"] == "#d62728"


def test_render_svg_figures(mp_profile, sampledata):
    svgs = render_svg_figures(mp_profile)
    assert {"mp", "discords_mp", "motifs_mp_overlay"} <= set(svgs)
    for name, svg in svgs.items():
        assert svg.startswith("<svg") and svg.endswith("</svg>"), name
    assert "<rect" in svgs["discords_mp"]               # heat strip cells
    assert "<circle" in svgs["discords_mp"]             # discord markers
    stats_svg = render_svg_figures(K.statistics(sampledata, 16))["stats"]
    assert stats_svg.count("<polyline") >= 5


def test_visualize_dispatch(mp_profile):
    """Drop-in visualize(): reference visualize.py:62-116 dispatch — list of
    figures for MP/PMP/Statistics structures, ValueError otherwise."""
    from matrixprofile_1_ray import is_visualizable, visualize

    assert is_visualizable(mp_profile)
    figs = visualize(mp_profile)
    assert isinstance(figs, list) and len(figs) >= 1
    assert all(f.lstrip().startswith("<svg") for f in figs)

    with pytest.raises(ValueError):
        visualize({"class": "Nope"})
    assert not is_visualizable([1, 2, 3])


def test_named_plot_functions(sampledata):
    """Each public reference plot_* name returns its composition."""
    import importlib

    # the package attribute `visualize` is the FUNCTION (as in the
    # reference __init__), so fetch the module via importlib
    V = importlib.import_module("matrixprofile_1_ray.visualize")
    from matrixprofile_1_ray import kernels as K

    ts = sampledata[:400]
    prof = K.extract_regimes(K.top_k_motifs(K.top_k_discords(
        K.mpx(ts, 32))))
    assert V.plot_mp(prof)["rows"]
    assert V.plot_discords_mp(prof)["rows"]
    motif_figs = V.plot_motifs_mp(prof)
    assert {"motifs_mp_pairs", "motifs_mp_overlay"} <= set(motif_figs)

    from matrixprofile_1_ray.kernels.transform import apply_av

    cav = apply_av(dict(prof), "complexity")
    assert V.plot_cmp_mp(cav)["rows"] and V.plot_av_mp(cav)["rows"]

    pmp = {
        "class": "PMP",
        "pmp": np.abs(np.random.default_rng(0).normal(size=(2, 100))),
        "pmpi": np.zeros((2, 100), dtype=int),
        "windows": np.array([16, 32]),
        "discords": [(1, 40)],
        "motifs": [{"motifs": [(0, 10)], "neighbors": []}],
        "data": {"ts": np.arange(131, dtype="d")},
    }
    assert V.plot_pmp(pmp)["rows"]
    assert set(V.plot_discords_pmp(pmp)) == {"discords_pmp_0"}
    assert set(V.plot_motifs_pmp(pmp)) == {"motifs_pmp_pairs",
                                           "motifs_pmp_overlay"}

    stats = K.statistics(ts, 16)
    assert V.plot_stats(stats)["rows"]

    snips = K.snippets(ts, 64)
    figs = V.plot_snippets(snips, ts)
    assert len(figs) == len(snips)


def test_motif_rules_cover_both_pair_members(mp_profile):
    """The motif scatter's own x-extent collapses to its points; the SVG
    mark rules must still cover BOTH members of every motif pair (the
    x domain expands to the marks instead of clipping to the scatter)."""
    from matrixprofile_1_ray.visualize import plot_data, render_svg

    data = plot_data(mp_profile)
    assert "motifs" in data and len(data["motifs"]["marks"]) >= 2
    svg = render_svg(mp_profile)["motifs"]
    assert svg.count("stroke-dasharray") == len(data["motifs"]["marks"])


def test_stats_plot_data_includes_time_series_panel(sampledata):
    from matrixprofile_1_ray.visualize import plot_data

    import matrixprofile_1_ray.kernels as K

    data = plot_data(K.statistics(sampledata, 16))
    assert "time_series" in data
    assert len(data["time_series"]["y"]) == len(sampledata)
