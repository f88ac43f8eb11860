"""Profile-table persistence.

The reference persists single profiles as JSON or protobuf ``.mpf`` files
(reference io/__io.py:177-245, io/protobuf/proto_messages.proto:69-111);
the engine's at-rest format is partitioned Parquet of the profiles table —
same field set (mp, pi, w, ez, metric, algorithm, sample_pct, join) keyed
by doc_id instead of embedding the series.  ``profile_row_to_dict``
reconstructs a reference-shaped MatrixProfile dict from one row for interop
with the kernel-level discover ops.
"""

from __future__ import annotations

import numpy as np


def write_profiles(profiles_ds, path: str, partition_cols=None):
    """Partitioned Parquet sink (one directory per partition when
    ``partition_cols`` given — resumable layout)."""
    if partition_cols:
        profiles_ds.write_parquet(path, partition_cols=partition_cols)
    else:
        profiles_ds.write_parquet(path)
    return path


def read_profiles(path: str):
    import ray.data

    return ray.data.read_parquet(path)


def profile_row_to_dict(row, ts=None) -> dict:
    """One profiles-table row -> reference-shaped MatrixProfile dict
    (reference mpx.py:82-100 field set)."""
    w = int(row["w"])
    out = {
        "mp": np.asarray(row["mp"], dtype="d"),
        "pi": np.asarray(row["pi"], dtype=np.int64),
        "rmp": None, "rpi": None, "lmp": None, "lpi": None,
        "metric": row.get("metric", "euclidean"),
        "w": w,
        "ez": int(np.ceil(w / 2.0)),
        "join": False,
        "sample_pct": 1,
        "data": {"ts": np.asarray(ts, dtype="d") if ts is not None
                 else (np.asarray(row["tokens"], dtype="d")
                       if "tokens" in row else None),
                 "query": None},
        "class": "MatrixProfile",
        "algorithm": row.get("algorithm", "mpx"),
    }
    return out
