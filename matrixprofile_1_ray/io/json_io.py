"""NumPy-aware JSON round-trip for single profiles.

Analog of reference io/__io.py:57-126 (``to_json``/``from_json``) and
io/__io.py:177-245 (``to_disk``/``from_disk`` with format inference) for
driver-side interchange of individual MatrixProfile/PMP dicts; corpus-scale
persistence is Parquet (io/profiles.py)."""

from __future__ import annotations

import json
import os

import numpy as np


class _NumpyEncoder(json.JSONEncoder):
    def default(self, obj):
        if isinstance(obj, np.ndarray):
            return {"__ndarray__": obj.tolist(), "dtype": str(obj.dtype)}
        if isinstance(obj, np.generic):
            return obj.item()
        return super().default(obj)


def _decode(obj):
    if isinstance(obj, dict):
        if "__ndarray__" in obj:
            return np.array(obj["__ndarray__"], dtype=obj["dtype"])
        return {k: _decode(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_decode(v) for v in obj]
    return obj


def to_json(profile: dict) -> str:
    return json.dumps(profile, cls=_NumpyEncoder)


def from_json(payload: str) -> dict:
    return _decode(json.loads(payload))


def to_disk(profile: dict, file_path: str, fmt: str = "json"):
    """Extension inference like the reference: '.json' appended when
    missing (parquet-backed formats go through io/profiles.py)."""
    if fmt != "json":
        raise ValueError("only the json format is supported here; use "
                         "io.profiles for the Parquet table format")
    if not file_path.endswith(".json"):
        file_path += ".json"
    with open(file_path, "w") as fh:
        fh.write(to_json(profile))
    return file_path


def from_disk(file_path: str) -> dict:
    if not os.path.exists(file_path) and os.path.exists(file_path + ".json"):
        file_path += ".json"
    with open(file_path) as fh:
        return from_json(fh.read())
