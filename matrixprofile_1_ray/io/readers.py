"""Metadata-clean Parquet reads.

Pandas-written Parquet carries a ``pandas`` schema-metadata blob whose
value is a JSON dict; ``hash(pa.Schema)`` raises ``unhashable type:
'dict'`` on such schemas.  Ray Data hashes block schemas to deduplicate
them before unifying (ray.data._internal.arrow_ops.transform_pyarrow.
unify_schemas), so every map worker downstream of a plain
``read_parquet`` over a pandas-written file logs ``Failed to hash the
schemas (for deduplication)`` once per batch concat and pays the full
unify walk instead of the early exit.  Stripping inside a later
``map_batches`` is too late — the warning fires when INPUT blocks are
sliced into batches — so the strip must happen at the read: pass
``read_parquet`` an explicit metadata-free ``schema`` and the read tasks
emit clean blocks from the start.
"""

from __future__ import annotations


def clean_read_schema(path: str, columns: list[str] | None = None):
    """The file's schema, metadata-stripped and projected to ``columns``
    (``read_parquet`` requires the passed schema to match the projected
    column set, in projection order)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.isdir(path):
        # un-partitioned dataset directory: any member file carries the
        # full schema (hive-partitioned trees don't — keep plain
        # read_parquet for those, see read_parquet_clean docstring)
        member = next((os.path.join(path, f)
                       for f in sorted(os.listdir(path))
                       if f.endswith(".parquet")), None)
        if member is None:
            raise ValueError(
                f"{path!r} contains no top-level .parquet file to read a "
                f"schema from (hive-partitioned trees need plain "
                f"read_parquet)")
        path = member
    schema = pq.read_schema(path).remove_metadata()
    if columns is not None:
        schema = pa.schema([schema.field(c) for c in columns])
    return schema


def read_parquet_clean(path: str, *, columns: list[str] | None = None,
                       **kwargs):
    """``ray.data.read_parquet`` over a single Parquet FILE with the
    schema metadata stripped at the read (see module docstring).  For
    hive-partitioned DIRECTORY reads keep plain ``read_parquet`` — the
    file-level schema lacks the partition columns, and our own writers
    emit metadata-free schemas anyway."""
    import ray.data

    return ray.data.read_parquet(
        path, columns=columns,
        schema=clean_read_schema(path, columns), **kwargs)
