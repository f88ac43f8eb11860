"""JSONL corpus source: identical sequences to the Parquet path."""

import gzip
import json

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from matrixprofile_1_ray.sources.sequences import (
    sequences_from_jsonl,
    sequences_table_from_documents,
)

SF = "/root/testdata/sf0.001"


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values("doc_id").reset_index(drop=True)


def _write_jsonl(rows, path, compress=False):
    opener = gzip.open if compress else open
    with opener(path, "wt") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _assert_same_sequences(got: pd.DataFrame, want: pd.DataFrame):
    assert list(got.doc_id) == list(want.doc_id)
    assert list(got.n_tok) == list(want.n_tok)
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(t) for t in got.tokens]),
        np.concatenate([np.asarray(t) for t in want.tokens]))


def test_jsonl_matches_parquet_sequences(ray_session, tmp_path):
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text", "source"])
    rows = docs.to_pylist()[:64]
    path = str(tmp_path / "docs.jsonl")
    _write_jsonl(rows, path)

    got = _norm(sequences_from_jsonl(path).to_pandas())
    want = _norm(sequences_table_from_documents(SF).to_pandas()
                 .query("doc_id in @got.doc_id"))
    assert list(got.source) == list(want.source)
    _assert_same_sequences(got, want)


def test_jsonl_gzip_and_missing_source(ray_session, tmp_path):
    rows = [{"doc_id": f"d{i}", "text": "ab" * (i + 8)} for i in range(12)]
    path = str(tmp_path / "docs.jsonl.gz")
    _write_jsonl(rows, path, compress=True)

    got = _norm(sequences_from_jsonl(
        path, source_default="web",
        arrow_open_stream_args={"compression": "gzip"}).to_pandas())
    assert len(got) == 12
    assert (got.source == "web").all()
    assert sorted(got.n_tok) == sorted(2 * (i + 8) for i in range(12))


def test_jsonl_multi_shard_directory(ray_session, tmp_path):
    """A directory of shards reads as one corpus (the 100 TB layout)."""
    for s in range(3):
        _write_jsonl([{"doc_id": f"s{s}d{i}", "text": "xyz" * (i + 6),
                       "source": f"shard{s}"} for i in range(5)],
                     str(tmp_path / f"part-{s}.jsonl"))
    got = _norm(sequences_from_jsonl(str(tmp_path)).to_pandas())
    assert len(got) == 15
    assert got.source.nunique() == 3


def test_csv_matches_parquet_sequences(ray_session, tmp_path):
    """CSV documents corpus: identical sequences to the Parquet path."""
    import csv

    from matrixprofile_1_ray.sources.sequences import sequences_from_csv

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text", "source"])
    rows = docs.to_pylist()[:48]
    path = str(tmp_path / "docs.csv")
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["doc_id", "text", "source"])
        w.writeheader()
        w.writerows(rows)

    got = _norm(sequences_from_csv(path).to_pandas())
    want = _norm(sequences_table_from_documents(SF).to_pandas()
                 .query("doc_id in @got.doc_id"))
    assert list(got.source) == list(want.source)
    _assert_same_sequences(got, want)


def test_csv_numeric_looking_text_stays_string(ray_session, tmp_path):
    """CSV type inference must not turn numeric-looking text/doc_id into
    int64 — column types are pinned to string."""
    from matrixprofile_1_ray.sources.sequences import sequences_from_csv

    path = str(tmp_path / "nums.csv")
    with open(path, "w") as f:
        f.write("doc_id,text,source\n1,12345,web\n2,67890,web\n")
    got = _norm(sequences_from_csv(path).to_pandas())
    assert list(got.doc_id) == ["1", "2"]
    assert list(got.n_tok) == [5, 5]
    np.testing.assert_array_equal(np.asarray(got.tokens.iloc[0]),
                                  [ord(c) for c in "12345"])


def test_jsonl_per_row_missing_source_gets_default(ray_session, tmp_path):
    """A file where only SOME rows carry source: the null rows get
    source_default, not null."""
    path = str(tmp_path / "mixed.jsonl")
    _write_jsonl([{"doc_id": "a", "text": "hello", "source": "web"},
                  {"doc_id": "b", "text": "world"}], path)
    got = _norm(sequences_from_jsonl(path, source_default="dflt")
                .to_pandas())
    assert list(got.source) == ["web", "dflt"]
