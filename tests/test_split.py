"""Deterministic keyed-hash dataset splits (stages/split.py)."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from matrixprofile_1_ray.stages.split import (
    DEFAULT_RATIOS,
    assign_split_batch,
    keyed_hash_fraction,
    split_sql,
    split_thresholds,
)

SF = "/root/testdata/sf0.001"


def test_thresholds_validate_and_cap():
    assert split_thresholds() == [("train", 0.98), ("val", 0.99),
                                  ("test", 1.0)]
    with pytest.raises(ValueError):
        split_thresholds((("a", 0.5), ("b", 0.2)))


def test_assignment_matches_duckdb_oracle():
    """Bit-identical to the SQL replay on the real documents table."""
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = con.execute(split_sql()).df().sort_values("doc_id") \
        .reset_index(drop=True)

    import pyarrow.parquet as pq

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])
    got = assign_split_batch(docs).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    assert list(got.doc_id) == list(want.doc_id)
    assert list(got.split) == list(want.split)
    # all three splits non-empty at 500 docs would be luck for 1% slices;
    # at least train must dominate
    assert (got.split == "train").mean() > 0.9


def test_assignment_deterministic_and_seed_sensitive():
    ids = pa.array([f"doc{i}" for i in range(2000)], pa.string())
    f1 = keyed_hash_fraction(ids, seed=1)
    f2 = keyed_hash_fraction(ids, seed=1)
    np.testing.assert_array_equal(f1, f2)
    f3 = keyed_hash_fraction(ids, seed=2)
    assert (f1 != f3).mean() > 0.99
    assert ((f1 >= 0) & (f1 < 1)).all()


def test_ratios_hold_in_expectation():
    ids = pa.array([f"u{i:06d}" for i in range(20000)], pa.string())
    tbl = pa.table({"doc_id": ids})
    out = assign_split_batch(tbl).to_pandas()
    frac = out.split.value_counts(normalize=True)
    assert abs(frac["train"] - 0.98) < 0.01
    assert abs(frac.get("val", 0.0) - 0.01) < 0.005
    assert abs(frac.get("test", 0.0) - 0.01) < 0.005


def test_custom_ratios_empty_and_null_keys_match_sql():
    """Empty and null keys hash identically in both engines (zero code
    points), at ratios where a divergence would flip the bucket."""
    tbl = pa.table({"doc_id": pa.array(["", "a", None, "b"], pa.string())})
    ratios = (("x", 0.5), ("y", 0.3), ("z", 0.2))
    got = assign_split_batch(tbl, ratios=ratios).to_pandas()
    con = duckdb.connect()
    con.register("docs", tbl)
    want = con.execute(split_sql(table="docs", ratios=ratios)).df()
    assert list(got.split) == list(want.split)
    assert got.split.iloc[0] == got.split.iloc[2]  # '' and NULL agree


def test_frac_exactly_one_clamps_to_last_bucket(monkeypatch):
    """float64 rounds the top ~127 hash values to exactly 1.0; the engine
    must clamp to the last bucket exactly as the SQL ELSE branch does."""
    import matrixprofile_1_ray.stages.split as sp

    monkeypatch.setattr(sp, "keyed_hash_fraction",
                        lambda keys, seed=1: np.array([1.0, 0.0]))
    out = sp.assign_split_batch(
        pa.table({"doc_id": pa.array(["hot", "cold"], pa.string())}))
    assert list(out["split"].to_pylist()) == ["test", "train"]


def test_split_stage_over_dataset(ray_session):
    import ray.data

    from matrixprofile_1_ray.stages.split import assign_split

    ds = ray.data.read_parquet(f"{SF}/documents.parquet")
    out = assign_split(ds.select_columns(["doc_id"])).to_pandas()
    assert len(out) == 500
    assert set(out.columns) == {"doc_id", "split"}


def test_gate_entry_matches_oracle(ray_session):
    """The queries()/oracle_sql() pair for dataset_split (parked past the
    driver window) hash-matches — same compare the gate would do."""
    import __ray_entry__ as e

    got = e.queries()["dataset_split"](SF).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = con.execute(e.oracle_sql()["dataset_split"]).df() \
        .sort_values("doc_id").reset_index(drop=True)
    assert got.equals(want)


def test_hash_sample_stable_and_nested(ray_session):
    """Sampling is deterministic and rate-nested: the 1% sample is a
    subset of the 10% sample at the same seed."""
    import ray.data

    from matrixprofile_1_ray.stages.split import hash_sample

    ds = ray.data.read_parquet(f"{SF}/documents.parquet") \
        .select_columns(["doc_id"])
    small = set(hash_sample(ds, 0.05).to_pandas().doc_id)
    big = set(hash_sample(ds, 0.5).to_pandas().doc_id)
    again = set(hash_sample(ds, 0.05).to_pandas().doc_id)
    assert small == again
    assert small <= big
    assert 0 < len(small) < len(big) < 500
    with pytest.raises(ValueError):
        hash_sample(ds, 1.5)


def test_hash_sample_rate_one_keeps_every_row(ray_session):
    """rate=1.0 must keep ALL rows — module convention says frac == 1.0
    (the top ~2^7 of 2^61 hash values rounding up in float64) lands in
    the kept bucket, so the mask short-circuits instead of comparing
    `frac < 1.0`."""
    import ray.data

    from matrixprofile_1_ray.stages.split import hash_sample

    ds = ray.data.read_parquet(f"{SF}/documents.parquet") \
        .select_columns(["doc_id"])
    n = ds.count()
    assert hash_sample(ds, 1.0).count() == n
