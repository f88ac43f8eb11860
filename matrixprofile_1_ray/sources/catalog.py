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
            listings = [l for l in listings
                        if l.get("category", "").lower() == category.lower()]
        return listings
    out = []
    for name in sorted(os.listdir(root)):
        path = os.path.join(root, name)
        if name.endswith(".parquet") or (
                os.path.isdir(path)
                and any(f.endswith(".parquet") for f in os.listdir(path))):
            out.append({"name": name.removesuffix(".parquet"),
                        "category": None, "path": path})
    return out


def load(root: str, name: str):
    """-> lazy Ray Dataset for a catalog entry."""
    import ray.data

    for entry in fetch_available(root):
        if entry["name"] == name:
            return ray.data.read_parquet(entry["path"])
    raise ValueError(f"dataset {name!r} not found under {root}")
