"""compute/analyze dispatch, JSON IO, catalog, CLI job resume,
per-source aggregate parity."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from matrixprofile_1_ray.io.json_io import from_disk, from_json, to_disk, to_json
from matrixprofile_1_ray.sources import synthetic_sequences_table
from matrixprofile_1_ray.sources.catalog import fetch_available, load

SF = "/root/testdata/sf0.001"


def test_json_roundtrip(sampledata):
    from matrixprofile_1_ray.kernels import mpx

    profile = mpx(sampledata, 32)
    back = from_json(to_json(profile))
    np.testing.assert_array_equal(back["mp"], profile["mp"])
    np.testing.assert_array_equal(back["pi"], profile["pi"])
    assert back["class"] == "MatrixProfile"


def test_json_roundtrip_analyzed_profile(sampledata):
    """Full analyzed profile (motifs/discords/cmp/av attached — the field
    set the reference's MPF format persists, proto_messages.proto:69-111)
    survives the JSON round trip."""
    from matrixprofile_1_ray import analyze
    from matrixprofile_1_ray.kernels import apply_av

    profile, _figs = analyze(sampledata, windows=32)
    profile = apply_av(profile, "complexity")
    back = from_json(to_json(profile))
    np.testing.assert_array_equal(back["mp"], profile["mp"])
    np.testing.assert_array_equal(back["cmp"], profile["cmp"])
    np.testing.assert_array_equal(back["av"], profile["av"])
    assert back["av_type"] == "complexity"
    assert [m["motifs"] for m in back["motifs"]] == \
        [list(m["motifs"]) for m in profile["motifs"]]
    np.testing.assert_array_equal(back["discords"], profile["discords"])


def test_json_disk_extension_inference(tmp_path, sampledata):
    from matrixprofile_1_ray.kernels import mpx

    profile = mpx(sampledata[:100], 16)
    path = to_disk(profile, str(tmp_path / "prof"))
    assert path.endswith(".json")
    back = from_disk(str(tmp_path / "prof"))
    np.testing.assert_array_equal(back["mp"], profile["mp"])

    # binary mpf via the same entry points (reference io/__io.py:177-245
    # format dispatch), extension inferred on read
    from matrixprofile_1_ray.io.json_io import infer_file_format

    mpath = to_disk(profile, str(tmp_path / "prof_bin"), format="mpf")
    assert mpath.endswith(".mpf") and infer_file_format(mpath) == "mpf"
    mback = from_disk(mpath)
    np.testing.assert_allclose(mback["mp"], profile["mp"], atol=1e-6)
    with pytest.raises(RuntimeError):
        infer_file_format("profile.csv")


def test_catalog():
    out = fetch_available(SF)
    names = {e["name"] for e in out}
    assert {"documents", "lineitem", "embeddings"} <= names
    with pytest.raises(ValueError):
        load(SF, "nope")


def test_get_csv_indices_and_load_csv(ray_session, tmp_path):
    """Header sniff matches reference semantics (last date/time label
    wins, others real-valued) and the Ray CSV path applies the roles."""
    import gzip

    from matrixprofile_1_ray.sources.catalog import get_csv_indices, load_csv

    csv = tmp_path / "series.csv"
    csv.write_text("value_a,Timestamp,value_b\n1.5,2020-01-01,2.5\n"
                   "3.0,2020-01-02,4.0\n")
    dt, real = get_csv_indices(str(csv))
    assert dt == 1 and real == [0, 2]

    gz = tmp_path / "series.csv.gz"
    with gzip.open(gz, "wt") as fh:
        fh.write("date,v\n2020-01-01,7\n")
    assert get_csv_indices(str(gz), is_gzip=True) == (0, [1])

    df = load_csv(str(csv)).to_pandas().sort_values("datetime")
    assert list(df.columns) == ["datetime", "value_a", "value_b"]
    assert df.value_b.tolist() == [2.5, 4.0]

    headerless_roles = load_csv(str(gz)).to_pandas()
    assert list(headerless_roles.columns) == ["datetime", "v"]

    # a quoted label containing a comma is ONE column — the sniff must
    # agree with Arrow's parsed schema or every role misaligns
    quoted = tmp_path / "quoted.csv"
    quoted.write_text('"a,b",date,v\n1.0,2020-01-01,9.0\n')
    assert get_csv_indices(str(quoted)) == (1, [0, 2])
    qdf = load_csv(str(quoted)).to_pandas()
    assert list(qdf.columns) == ["datetime", "a,b", "v"]
    assert qdf.v.tolist() == [9.0]


def test_compute_dispatch(ray_session):
    import ray.data

    from matrixprofile_1_ray.pipelines.analyze import analyze, compute

    ds = ray.data.from_arrow(synthetic_sequences_table(4, seed=30))

    single = compute(ds, windows=32).to_pandas()
    assert set(single.algorithm) == {"mpx"}
    approx = compute(ds, windows=32, sample_pct=0.5).to_pandas()
    assert set(approx.algorithm) == {"scrimp++"}
    multi = compute(ds, windows=[16, 32]).to_pandas()
    assert set(multi.w) == {16, 32}
    # no-windows dispatch returns PMP rows over 8..upper_window per doc
    # (reference compute.py:116-127), not the bare upper-window table
    pmp = compute(ds, threshold=0.95).to_pandas()
    assert {"w", "mp", "pi"} <= set(pmp.columns)
    assert (pmp.groupby("doc_id").w.min() == 8).all()
    # single-element iterables collapse to the scalar dispatch
    one = compute(ds, windows=range(32, 33)).to_pandas()
    assert set(one.algorithm) == {"mpx"}

    profiles, discords, motifs, regimes = analyze(
        ray.data.from_arrow(synthetic_sequences_table(3, seed=31)), window=32)
    assert profiles.count() == 3
    assert discords.count() > 0


def test_cli_rollup_resume(ray_session, tmp_path):
    """Job entry: run, then resume (skips), then verify row parity."""
    from matrixprofile_1_ray.cli import main

    in_dir = str(tmp_path / "seqs")
    os.makedirs(in_dir)
    import pyarrow.parquet as pq

    for i in range(3):
        pq.write_table(synthetic_sequences_table(5, seed=40 + i, start=i * 5),
                       os.path.join(in_dir, f"shard{i}.parquet"))

    out_dir = str(tmp_path / "out")
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        main(["rollup", "--input", in_dir, "--output", out_dir,
              "--num-cpus", "4"])
    result = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert result["done"] == 3 and result["skipped"] == 0

    buf = io.StringIO()
    with redirect_stdout(buf):
        main(["rollup", "--input", in_dir, "--output", out_dir,
              "--num-cpus", "4"])
    result = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert result["done"] == 0 and result["skipped"] == 3

    # outputs contain both token and mp rollup rows
    import pyarrow.dataset as pads

    table = pads.dataset(os.path.join(out_dir, "part-00000")).to_table()
    cols = set(table.column_names)
    assert {"tier", "bucket", "t_min", "mp_min"} <= cols

    # manifest entries carry per-partition metrics (rows/bytes/wall_s)
    with open(os.path.join(out_dir, "_manifest.jsonl")) as fh:
        entries = [json.loads(line) for line in fh]
    assert all(e["rows"] > 0 and e["bytes"] > 0 and e["wall_s"] > 0
               for e in entries)

    # wrong-schema input (not pre-tokenized sequences) fails fast with a
    # readable error, not a KeyError deep inside a Ray task
    bad_dir = str(tmp_path / "bad")
    os.makedirs(bad_dir)
    import pyarrow as pa

    pq.write_table(pa.table({"c_custkey": [1]}),
                   os.path.join(bad_dir, "customer.parquet"))
    with pytest.raises(SystemExit, match="pre-tokenized"):
        main(["rollup", "--input", bad_dir, "--output",
              str(tmp_path / "bad_out"), "--num-cpus", "4"])


def test_cli_dedup_and_ann(ray_session, tmp_path, capsys):
    """End-to-end CLI jobs: near-dup (LSH -> verify -> groups) and the
    persisted-IVF build/query pair."""
    import json

    from matrixprofile_1_ray.cli import main

    sf = "/root/testdata/sf0.001"
    main(["dedup", "--input", sf, "--output", str(tmp_path / "dup"),
          "--num-cpus", "4"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["candidates"] > 0
    assert out["components"] <= out["grouped_docs"]
    assert os.path.isdir(tmp_path / "dup")

    idx = str(tmp_path / "ivf")
    main(["ann", "--input", sf, "--index-dir", idx, "--build",
          "--queries", "4", "--k", "5", "--num-cpus", "4"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] == 20
    # second run reuses the index (no --build)
    main(["ann", "--input", sf, "--index-dir", idx,
          "--queries", "4", "--k", "5", "--num-cpus", "4"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] == 20


def test_plot_data_surfaces(sampledata):
    from matrixprofile_1_ray.kernels import (
        extract_regimes,
        mpx,
        skimp,
        snippets,
        statistics,
        top_k_discords,
        top_k_motifs,
    )
    from matrixprofile_1_ray.visualize import plot_data, render

    prof = extract_regimes(top_k_motifs(top_k_discords(mpx(sampledata, 32))))
    out = plot_data(prof)
    assert {"matrix_profile", "series", "discords", "motifs",
            "corrected_arc_curve"} <= set(out)
    assert out["matrix_profile"]["y"].shape[0] == len(prof["mp"])
    np.testing.assert_array_equal(out["corrected_arc_curve"]["marks"],
                                  prof["regimes"])

    pmp = skimp(sampledata, windows=[16, 32], sample_pct=1)
    assert plot_data(pmp)["pan_matrix_profile"]["y"].shape == (2, len(sampledata))
    assert "moving_mean" in plot_data(statistics(sampledata, 32))
    snips = snippets(sampledata, 64, window_size=32)
    assert "snippet_0" in plot_data(snips)
    with pytest.raises(NotImplementedError):
        render(prof)  # no matplotlib in this runtime
    with pytest.raises(ValueError):
        plot_data({"class": "bogus"})


def test_render_svg(sampledata, tmp_path):
    """Dependency-free SVG render: one well-formed document per figure,
    with marks and geometry present."""
    import xml.etree.ElementTree as ET

    from matrixprofile_1_ray.kernels import (
        extract_regimes,
        mpx,
        skimp,
        top_k_discords,
        top_k_motifs,
    )
    from matrixprofile_1_ray.visualize import render_svg, render_svg_to_dir

    prof = extract_regimes(top_k_motifs(top_k_discords(mpx(sampledata, 32))))
    figs = render_svg(prof)
    assert {"matrix_profile", "series", "discords",
            "corrected_arc_curve"} <= set(figs)
    for name, svg in figs.items():
        root = ET.fromstring(svg)  # well-formed XML
        assert root.tag.endswith("svg"), name
    assert "polyline" in figs["matrix_profile"]
    assert "circle" in figs["discords"]
    # regimes draw as dashed rules on the CAC figure
    assert figs["corrected_arc_curve"].count("stroke-dasharray") == len(
        prof["regimes"])

    pmp = skimp(sampledata, windows=[16, 32], sample_pct=1)
    heat = render_svg(pmp)["pan_matrix_profile"]
    assert "<rect" in heat and ET.fromstring(heat) is not None

    paths = render_svg_to_dir(prof, str(tmp_path / "figs"))
    assert all(p.endswith(".svg") for p in paths) and len(paths) == len(figs)


def test_pmpi_int_nan_quirk(sampledata):
    """The reference's np.full(nan, dtype=int) padding becomes INT64_MIN
    (skimp.py:178) — preserved."""
    from matrixprofile_1_ray.kernels import skimp

    pmp = skimp(sampledata, windows=[400], sample_pct=1)  # padded tail
    assert pmp["pmpi"][0, -1] == np.iinfo(np.int64).min


def test_per_source_stats_parity(ray_session):
    import duckdb

    import __ray_entry__ as e

    out = e.queries()["per_source_stats"](SF).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')")
    oracle = con.execute(e.oracle_sql()["per_source_stats"]).df()
    cols = sorted(oracle.columns)
    a = out[cols].sort_values("source").reset_index(drop=True)
    b = oracle[cols].sort_values("source").reset_index(drop=True)
    for c in cols:
        np.testing.assert_array_equal(a[c].to_numpy(), b[c].to_numpy(), err_msg=c)


def test_catalog_finds_partitioned_datasets_and_relative_manifest(tmp_path):
    """Hive-partitioned datasets nest parquet under key=value dirs (one-
    level scans miss them); manifest paths resolve against the CATALOG
    dir, not the process CWD; the no-manifest branch honors category."""
    import json as _json

    import pyarrow as pa
    import pyarrow.parquet as _pq

    from matrixprofile_1_ray.sources.catalog import fetch_available, load

    root = tmp_path / "catalog"
    (root / "deep" / "bucket=0").mkdir(parents=True)
    _pq.write_table(pa.table({"x": [1, 2]}),
                    str(root / "deep" / "bucket=0" / "part.parquet"))
    found = {e["name"] for e in fetch_available(str(root))}
    assert "deep" in found
    # category filter in the fallback branch matches nothing (entries
    # carry category=None) instead of returning everything unfiltered
    assert fetch_available(str(root), category="ecg") == []

    # manifest with a path relative to the catalog dir
    _pq.write_table(pa.table({"x": [3]}), str(root / "flat.parquet"))
    (root / "listings.json").write_text(_json.dumps(
        [{"name": "flat", "path": "flat.parquet", "category": "ecg"}]))
    assert load(str(root), "flat").count() == 1
    import pytest as _pytest
    with _pytest.raises(ValueError, match="no 'path'"):
        (root / "listings.json").write_text(
            _json.dumps([{"name": "broken"}]))
        load(str(root), "broken")
