"""Reference-layout ``datasets.datasets`` module (reference
datasets/datasets.py:48-219).  The reference fetches CSVs over the network;
this runtime has no network, so the same API is served from a local catalog
directory — point ``MP1RAY_DATASETS_ROOT`` (or pass ``root=``) at a
directory of Parquet datasets / ``listings.json`` manifest.  CSV ingestion
(``get_csv_indices`` header sniffing, gzip autodetect) is in
sources/catalog.py and works on local files."""

from __future__ import annotations

import os

from ..sources import catalog as _catalog
from ..sources.catalog import get_csv_indices, load_csv  # noqa: F401

_ROOT_ENV = "MP1RAY_DATASETS_ROOT"


def _root(root: str | None) -> str:
    root = root or os.environ.get(_ROOT_ENV)
    if not root:
        raise RuntimeError(
            "no dataset catalog configured: the reference downloads datasets "
            f"over the network, which this runtime does not have. Set "
            f"{_ROOT_ENV} (or pass root=) to a local catalog directory.")
    return root


def fetch_available(category: str | None = None, root: str | None = None):
    """reference datasets/datasets.py:48-92 — list available datasets."""
    return _catalog.fetch_available(_root(root), category=category)


def load(name: str, root: str | None = None):
    """reference datasets/datasets.py:132-219 — load a dataset by name."""
    return _catalog.load(_root(root), name)
