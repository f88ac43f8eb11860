"""Local simulation of the driver's correctness gate.

Runs every ``queries()`` entry at the given sf dir; where ``oracle_sql()``
has a matching key, runs the SQL in DuckDB (tables pre-registered as views,
as the driver does) and compares row count, schema (column-name set) and a
value hash computed over name-sorted columns and fully sorted rows.

Usage: python tools/gate_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import json
import sys
import time

import duckdb
import numpy as np
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_df(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        # Ray 2.49's to_pandas on an empty Dataset is COLUMN-LESS; recover
        # the typed schema so a legitimately-empty result still compares.
        # schema() only in that branch — calling it up front would execute
        # the whole un-materialized plan once for the schema and then
        # AGAIN for to_pandas, doubling every gate query's compute
        df = res.to_pandas()
        if df.empty and not len(df.columns):
            schema = res.schema()
            if schema is not None:
                df = pa.schema(list(zip(
                    schema.names, schema.types))).empty_table().to_pandas()
        res = df
    elif isinstance(res, pa.Table):
        res = res.to_pandas()
    return res


def norm(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    df = df[cols]
    if len(df):
        df = df.sort_values(cols, kind="mergesort").reset_index(drop=True)
    return df


def value_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha1()
    for c in df.columns:
        s = df[c]
        if np.issubdtype(s.dtype, np.floating):
            rep = s.map(lambda v: repr(float(v)) if pd.notna(v) else "nan")
        else:
            rep = s.astype(str)
        # length-prefix every field so no byte realignment across the
        # column-name / value boundaries can collide
        h.update(f"col:{len(c)}:".encode() + c.encode())
        for v in rep.tolist():
            b = v.encode()
            h.update(f"{len(b)}:".encode() + b)
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 ignore_reinit_error=True,
                 logging_level="ERROR")

    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __ray_entry__ as m

    qs = m.queries()
    oracles = m.oracle_sql()

    unknown = only - set(qs)
    if unknown:
        # fail LOUDLY: a typo'd query name would otherwise filter the run
        # down to nothing and report "0 failures / 0 queries" vacuously
        print(f"unknown query name(s): {sorted(unknown)}", file=sys.stderr)
        return 2

    con = duckdb.connect()
    for t in TABLES:
        # DuckDB binds read_parquet eagerly at CREATE VIEW: skip missing
        # fixture files so a filtered run on a partial sf dir still works
        if os.path.exists(f"{sf_dir}/{t}.parquet"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")

    out = {}
    fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        row = {}
        try:
            eng = to_df(fn(sf_dir))
            row["engine_rows"] = len(eng)
            if name in oracles:
                eng = norm(eng)
                ora = norm(con.execute(oracles[name]).df())
                row["oracle_rows"] = len(ora)
                row["rows_match"] = len(eng) == len(ora)
                row["schema_match"] = list(eng.columns) == list(ora.columns)
                row["hash_match"] = (row["rows_match"] and row["schema_match"]
                                     and value_hash(eng) == value_hash(ora))
                if not row["hash_match"]:
                    fail += 1
            else:
                row["oracle"] = "none (rows-only)"
        except Exception as e:  # noqa: BLE001
            row["err"] = f"{type(e).__name__}: {e}"
            fail += 1
        row["sec"] = round(time.time() - t0, 2)
        out[name] = row
        status = ("OK " if row.get("hash_match")
                  else ("--- " if "oracle" in row else "FAIL"))
        print(f"{status} {name}: {json.dumps(row)}", flush=True)

    print(f"\n{fail} failures / {len(out)} queries")
    return 1 if fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
