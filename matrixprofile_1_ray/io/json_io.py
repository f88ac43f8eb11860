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


SUPPORTED_EXTS = {"json", "mpf"}


def infer_file_format(file_path: str) -> str:
    """reference io/__io.py:153-174 — last dot-suffix, lowercased; raises
    on anything outside the supported set."""
    extension = file_path.split(".")[-1].lower()
    if extension not in SUPPORTED_EXTS:
        raise RuntimeError(
            f"Unsupported file type with extension {extension}")
    return extension


def to_disk(profile: dict, file_path: str, format: str = "json"):
    """Write json (text) or mpf (binary protobuf archive, io/mpf.py);
    the matching extension is appended when missing — reference
    io/__io.py:177-213 keyword name ``format`` (parquet-backed corpus
    formats go through io/profiles.py)."""
    fmt = format
    if fmt not in SUPPORTED_EXTS:
        raise ValueError(f"format must be one of {sorted(SUPPORTED_EXTS)}; "
                         f"use io.profiles for the Parquet table format")
    if not file_path.endswith(f".{fmt}"):
        file_path += f".{fmt}"
    if fmt == "mpf":
        from .mpf import to_disk_mpf

        to_disk_mpf(profile, file_path)
        return file_path
    with open(file_path, "w") as fh:
        fh.write(to_json(profile))
    return file_path


def from_disk(file_path: str, format: str = "infer") -> dict:
    """Read a profile back; ``format='infer'`` dispatches on the extension
    like the reference (io/__io.py:216-245).  A bare path written by
    to_disk is symmetric for BOTH formats: the extension fallback tries
    .json and .mpf, not just .json."""
    if not os.path.exists(file_path):
        for ext in sorted(SUPPORTED_EXTS):
            if os.path.exists(f"{file_path}.{ext}"):
                file_path += f".{ext}"
                break
    if format == "infer":
        fmt = infer_file_format(file_path)
    elif format in SUPPORTED_EXTS:
        fmt = format
    else:
        # validate like to_disk does: an unknown format silently falling
        # through to the JSON branch surfaces as a confusing decode error
        raise ValueError(f"format must be 'infer' or one of "
                         f"{sorted(SUPPORTED_EXTS)}")
    if fmt == "mpf":
        from .mpf import from_disk_mpf

        return from_disk_mpf(file_path)
    with open(file_path) as fh:
        return from_json(fh.read())
