"""read_parquet_clean: metadata-free blocks straight off the read."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from matrixprofile_1_ray.io.readers import clean_read_schema, read_parquet_clean


@pytest.fixture(scope="module")
def pandas_parquet(tmp_path_factory):
    """A pandas-written file: its schema carries the b'pandas' JSON blob
    that makes hash(pa.Schema) raise 'unhashable type: dict'."""
    path = str(tmp_path_factory.mktemp("rd") / "t.parquet")
    pd.DataFrame({
        "a": np.arange(100, dtype=np.int64),
        "b": np.linspace(0.0, 1.0, 100),
        "c": [f"s{i}" for i in range(100)],
    }).to_parquet(path)
    return path


def test_source_schema_is_actually_unhashable(pandas_parquet):
    s = pq.read_schema(pandas_parquet)
    assert b"pandas" in (s.metadata or {})
    with pytest.raises(TypeError):
        hash(s)


def test_clean_read_schema_strips_and_projects(pandas_parquet):
    s = clean_read_schema(pandas_parquet)
    assert s.metadata is None
    hash(s)  # must not raise
    proj = clean_read_schema(pandas_parquet, ["c", "a"])
    assert proj.names == ["c", "a"]  # read_parquet wants projection order
    assert proj.field("a").type == pa.int64()


def test_read_parquet_clean_blocks_are_hashable(ray_session, pandas_parquet):
    ds = read_parquet_clean(pandas_parquet, columns=["a", "b"])
    batch = ds.take_batch(10, batch_format="pyarrow")
    assert batch.schema.metadata is None
    hash(batch.schema)
    assert batch.column_names == ["a", "b"]
    assert ds.count() == 100


def test_read_parquet_clean_values_match_plain_read(ray_session,
                                                    pandas_parquet):
    import ray.data

    clean = read_parquet_clean(pandas_parquet).to_pandas()
    plain = ray.data.read_parquet(pandas_parquet).to_pandas()
    pd.testing.assert_frame_equal(
        clean.sort_values("a").reset_index(drop=True),
        plain.sort_values("a").reset_index(drop=True))


def test_read_parquet_clean_directory(ray_session, tmp_path, pandas_parquet):
    # un-partitioned directory: schema resolved from the first member file
    d = tmp_path / "ds"
    d.mkdir()
    pd.DataFrame({"a": [1, 2]}).to_parquet(d / "p0.parquet")
    pd.DataFrame({"a": [3]}).to_parquet(d / "p1.parquet")
    ds = read_parquet_clean(str(d))
    assert sorted(ds.to_pandas()["a"]) == [1, 2, 3]
    assert ds.take_batch(1, batch_format="pyarrow").schema.metadata is None
