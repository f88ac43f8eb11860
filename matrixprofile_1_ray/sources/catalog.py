"""Dataset catalog: the engine analog of the reference's remote dataset
fetcher (reference datasets/datasets.py:48-219 ``fetch_available``/``load``)
— no network in this runtime, so the catalog is a directory of Parquet
datasets with an optional ``listings.json`` manifest."""

from __future__ import annotations

import json
import os


def fetch_available(root: str, category: str | None = None) -> list[dict]:
    """List datasets under ``root``: manifest entries when listings.json
    exists, else one entry per parquet file/dataset directory."""
    manifest = os.path.join(root, "listings.json")
    if os.path.exists(manifest):
        with open(manifest) as fh:
            listings = json.load(fh)
        if category:
            # `or ""`: a manifest (or our own fallback below) may carry
            # category: null, which .get's default would pass through
            listings = [l for l in listings
                        if (l.get("category") or "").lower() == category.lower()]
        return listings
    out = []
    for name in sorted(os.listdir(root)):
        path = os.path.join(root, name)
        if name.endswith(".parquet") or (
                os.path.isdir(path) and _has_parquet(path)):
            out.append({"name": name.removesuffix(".parquet"),
                        "category": None, "path": path})
    if category:
        # the manifest branch filters; the fallback must agree (directory
        # entries carry category=None, so a category filter matches none)
        out = [e for e in out
               if (e.get("category") or "").lower() == category.lower()]
    return out


def _has_parquet(path: str, max_depth: int = 3) -> bool:
    """True if any .parquet file exists under ``path`` within a few
    levels — hive-partitioned datasets (write_profiles with
    partition_cols) nest files under key=value directories, so a
    one-level listdir scan would miss them entirely."""
    if max_depth < 0:
        return False
    try:
        entries = sorted(os.listdir(path))
    except NotADirectoryError:
        return False
    for name in entries:
        sub = os.path.join(path, name)
        if name.endswith(".parquet"):
            return True
        if os.path.isdir(sub) and _has_parquet(sub, max_depth - 1):
            return True
    return False


def load(root: str, name: str):
    """-> lazy Ray Dataset for a catalog entry."""
    import ray.data

    for entry in fetch_available(root):
        if entry.get("name") == name:
            path = entry.get("path")
            if not path:
                raise ValueError(
                    f"catalog entry {name!r} in listings.json has no "
                    f"'path' key")
            # manifest paths may be authored relative to the CATALOG
            # directory; resolving them against the process CWD instead
            # would read a different (or missing) file
            if not os.path.isabs(path) and "://" not in path:
                path = os.path.join(root, path)
            from ..io.readers import read_parquet_clean
            return read_parquet_clean(path)
    raise ValueError(f"dataset {name!r} not found under {root}")


def get_csv_indices(fp: str, is_gzip: bool = False):
    """Header sniff for series CSVs (reference datasets/datasets.py:95-129
    semantics): -> (dt_index, real_indices) where the datetime column is
    the LAST header label containing 'date' or 'time' (case-insensitive)
    and every other column is treated as real-valued.

    The header is parsed with the csv module (not a raw split) so a
    quoted label containing a comma stays one column — load_csv applies
    these indices to Arrow's properly-parsed schema, and the two must
    agree on column positions."""
    import csv
    import gzip

    opener = (lambda p: gzip.open(p, "rt")) if is_gzip else open
    with opener(fp) as fh:
        labels = next(csv.reader(fh), [])
    dt_index, real_indices = None, []
    for index, label in enumerate(labels):
        if "date" in label.lower() or "time" in label.lower():
            dt_index = index
        else:
            real_indices.append(index)
    return dt_index, real_indices


def load_csv(fp: str, is_gzip: bool | None = None):
    """CSV/CSV.gz -> lazy Ray Dataset with the datetime column (when the
    header declares one) renamed to ``datetime`` and every real-valued
    column kept — the streaming engine analog of the reference's
    eager csv-to-numpy loader.  Column roles come from
    :func:`get_csv_indices`; Arrow infers the value types."""
    import ray.data

    if is_gzip is None:
        is_gzip = fp.endswith(".gz")
    dt_index, real_indices = get_csv_indices(fp, is_gzip=is_gzip)
    ds = ray.data.read_csv(fp)
    cols = ds.schema().names
    keep = [cols[i] for i in real_indices if i < len(cols)]
    if dt_index is not None and dt_index < len(cols):
        dt_col = cols[dt_index]
        ds = ds.select_columns([dt_col] + keep)
        if dt_col != "datetime":
            ds = ds.rename_columns({dt_col: "datetime"})
        return ds
    return ds.select_columns(keep)
