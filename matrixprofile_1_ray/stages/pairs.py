"""Pair operators: distributed MPDist pairs table, all-pairs condensed
matrix, hierarchical clustering.

Scale design (vs the reference's corpus-in-memory pairwise_dist.py:36-101):
each series is its own object-store entry (``ray.put`` per doc, once), so a
pair task fetches exactly the two series it needs — no whole-corpus
broadcast; the i<j pair table is GENERATED INSIDE tasks from the id list
(never enumerated on the driver), or supplied as a Dataset (e.g. LSH
candidates from stages/dedup.py) when all-pairs is too many."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.tokenize import list_column_to_numpy
from ..kernels.hierarchical import hierarchical_clusters
from ..kernels.mpdist import mpdist
from .ann import auto_concurrency


def _series_refs(sequences: pa.Table) -> dict:
    """One object-store entry PER SERIES (not one corpus dict): a pair task
    fetches only its two operands, and the object store spills what no task
    currently needs."""
    import ray

    values, offsets = list_column_to_numpy(sequences["tokens"])
    ids = sequences["doc_id"].to_pylist()
    return {d: ray.put(np.ascontiguousarray(
        values[offsets[i] : offsets[i + 1]], dtype="d"))
        for i, d in enumerate(ids)}


def all_pairs_dataset(ids, rows_per_task: int = 128):
    """(doc_a, doc_b) for all i<j as a Dataset whose rows are GENERATED
    inside tasks — the driver ships only the id list (M strings), never the
    O(M^2) pair list."""
    import ray
    import ray.data

    ids_arr = np.asarray(list(ids))
    n = len(ids_arr)
    ids_ref = ray.put(ids_arr)
    starts = pa.table({"start": pa.array(
        list(range(0, max(n - 1, 0), rows_per_task)), pa.int64())})

    def gen(batch: pa.Table) -> pa.Table:
        ids_l = ray.get(ids_ref)
        out_a, out_b = [], []
        for s in batch["start"].to_pylist():
            for i in range(s, min(s + rows_per_task, n - 1)):
                out_a.append(np.full(n - i - 1, i, dtype=np.int64))
                out_b.append(np.arange(i + 1, n, dtype=np.int64))
        if not out_a:
            return pa.table({"doc_a": pa.array([], pa.string()),
                             "doc_b": pa.array([], pa.string())})
        return pa.table({
            "doc_a": pa.array(ids_l[np.concatenate(out_a)]),
            "doc_b": pa.array(ids_l[np.concatenate(out_b)]),
        })

    return ray.data.from_arrow(starts).map_batches(
        gen, batch_format="pyarrow", batch_size=1)


def mpdist_pairs(sequences: pa.Table, w: int, threshold: float = 0.05,
                 pairs=None, batch_size: int = 64):
    """-> Dataset (doc_a, doc_b, mpdist).  ``pairs`` may be a Dataset of
    candidate pairs (the 100 TB path: LSH candidates, not all-pairs), an
    explicit small list, or None for task-generated all i<j pairs."""
    import ray
    import ray.data

    refs_ref = ray.put(_series_refs(sequences))

    if pairs is None:
        pairs_ds = all_pairs_dataset(sequences["doc_id"].to_pylist())
    elif hasattr(pairs, "map_batches"):
        pairs_ds = pairs
    else:
        pairs_ds = ray.data.from_arrow(pa.table({
            "doc_a": pa.array([p[0] for p in pairs], pa.string()),
            "doc_b": pa.array([p[1] for p in pairs], pa.string()),
        }))

    class PairDist:
        """Fetches per-pair series by ref with a bounded per-actor cache —
        repeated operands (each doc appears in M-1 pairs) hit the cache or
        the local object store, not the wire."""

        def __init__(self):
            from ..state.refcache import RefCache

            self.series = RefCache(ray.get(refs_ref), max_items=1024)

        def __call__(self, batch: pa.Table) -> pa.Table:
            dists = [
                mpdist(self.series.get(a), self.series.get(b), w,
                       threshold=threshold)
                for a, b in zip(batch["doc_a"].to_pylist(),
                                batch["doc_b"].to_pylist())
            ]
            return batch.append_column("mpdist",
                                       pa.array(dists, pa.float64()))

    return pairs_ds.map_batches(PairDist, batch_format="pyarrow",
                                batch_size=batch_size,
                                concurrency=auto_concurrency())


def pairwise_dist_distributed(sequences: pa.Table, w: int,
                              threshold: float = 0.05) -> np.ndarray:
    """Condensed distance matrix via the distributed pairs table — same
    layout as kernels.mpdist.pairwise_dist.  Condensed indices are computed
    with column arithmetic (no per-row Python)."""
    ids = sequences["doc_id"].to_pylist()
    index = {d: i for i, d in enumerate(ids)}
    m = len(ids)
    dm = np.empty((m * (m - 1)) // 2, dtype="d")
    out = mpdist_pairs(sequences, w, threshold=threshold).to_pandas()
    i = out["doc_a"].map(index).to_numpy(dtype=np.int64)
    j = out["doc_b"].map(index).to_numpy(dtype=np.int64)
    lo, hi = np.minimum(i, j), np.maximum(i, j)
    dm[m * lo + hi - ((lo + 2) * (lo + 1)) // 2] = out["mpdist"].to_numpy()
    return dm


def hierarchical_clusters_distributed(sequences: pa.Table, w: int, t,
                                      threshold: float = 0.05, **kwargs):
    """Distributed pairwise MPDist + driver-side linkage finish
    (the condensed matrix is tiny relative to the corpus)."""
    dm = pairwise_dist_distributed(sequences, w, threshold=threshold)
    return hierarchical_clusters(None, w, t, threshold=threshold,
                                 precomputed_distances=dm, **kwargs)


def ab_join_stage(ds, query: np.ndarray, w: int):
    """Similarity join of every row against one broadcast query series
    (reference cympx.pyx:122-284 semantics per row)."""
    import ray

    from ..kernels.mpx import mpx_ab

    query_ref = ray.put(np.asarray(query, dtype="d"))

    class ABJoin:
        def __init__(self):
            self.query = ray.get(query_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            values, offsets = list_column_to_numpy(batch["tokens"])
            out_mp, out_pi, keep = [], [], []
            for i in range(len(batch)):
                ts = values[offsets[i] : offsets[i + 1]].astype("d")
                if ts.shape[0] < w or self.query.shape[0] < w:
                    continue
                mp, mpi, _mpb, _mpib = mpx_ab(ts, self.query, w)
                out_mp.append(mp)
                out_pi.append(mpi)
                keep.append(i)
            take = pa.array(np.array(keep, dtype=np.int64), pa.int64())
            return pa.table({
                "doc_id": batch["doc_id"].take(take),
                "w": pa.array(np.full(len(keep), w, np.int32)),
                "mp": pa.array([m.tolist() for m in out_mp],
                               pa.list_(pa.float64())),
                "pi": pa.array([p.tolist() for p in out_pi],
                               pa.list_(pa.int64())),
            })

    return ds.map_batches(ABJoin, batch_format="pyarrow", concurrency=auto_concurrency())


def mass_search_stage(ds, query: np.ndarray, k: int = 3):
    """Find the k best matches of a query pattern in every document via
    MASS2 (reference mass2.py:14-96), exclusion-zone suppressed."""
    import ray

    from ..kernels.mass import apply_exclusion_zone, mass2

    w = len(query)
    query_ref = ray.put(np.asarray(query, dtype="d"))

    class MassSearch:
        def __init__(self):
            self.query = ray.get(query_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            values, offsets = list_column_to_numpy(batch["tokens"])
            doc_ids, ranks, idxs, dists = [], [], [], []
            for i in range(len(batch)):
                ts = values[offsets[i] : offsets[i + 1]].astype("d")
                if ts.shape[0] < w:
                    continue
                dp = np.real(mass2(ts, self.query))
                ez = int(np.ceil(w / 2.0))
                for rank in range(min(k, dp.shape[0])):
                    j = int(np.nanargmin(dp))
                    if not np.isfinite(dp[j]):
                        break
                    doc_ids.append(batch["doc_id"][i].as_py())
                    ranks.append(rank)
                    idxs.append(j)
                    dists.append(float(dp[j]))
                    apply_exclusion_zone(ez, False, w, ts.shape[0], j, dp)
            return pa.table({
                "doc_id": pa.array(doc_ids, pa.string()),
                "rank": pa.array(ranks, pa.int32()),
                "match_idx": pa.array(idxs, pa.int64()),
                "distance": pa.array(dists, pa.float64()),
            })

    return ds.map_batches(MassSearch, batch_format="pyarrow",
                          concurrency=auto_concurrency())
