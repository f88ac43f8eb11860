"""Pair operators: distributed MPDist pairs table, all-pairs condensed
matrix, hierarchical clustering.

The pairs table (i<j) is built driver-side from doc_ids only; series data is
broadcast ONCE via ``ray.put`` and fetched per task — the all-pairs product
is O(M^2) in compute but the corpus crosses the wire once (the reference's
pairwise_dist has the same corpus-in-memory assumption,
pairwise_dist.py:36-101; for corpora beyond one node's memory the
hash-bucketed pair-join in stages/dedup.py is the template)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.tokenize import list_column_to_numpy
from ..kernels.hierarchical import hierarchical_clusters
from ..kernels.mpdist import mpdist
from .ann import auto_concurrency


def _corpus_dict(sequences: pa.Table) -> dict[str, np.ndarray]:
    values, offsets = list_column_to_numpy(sequences["tokens"])
    ids = sequences["doc_id"].to_pylist()
    return {d: values[offsets[i] : offsets[i + 1]].astype("d")
            for i, d in enumerate(ids)}


def mpdist_pairs(sequences: pa.Table, w: int, threshold: float = 0.05,
                 pairs=None, batch_size: int = 64):
    """-> Dataset (doc_a, doc_b, mpdist) for all i<j pairs (or an explicit
    pair list)."""
    import ray
    import ray.data

    corpus_ref = ray.put(_corpus_dict(sequences))
    ids = sequences["doc_id"].to_pylist()
    if pairs is None:
        pairs = [(ids[i], ids[j]) for i in range(len(ids))
                 for j in range(i + 1, len(ids))]

    pairs_table = pa.table({
        "doc_a": pa.array([p[0] for p in pairs], pa.string()),
        "doc_b": pa.array([p[1] for p in pairs], pa.string()),
    })

    class PairDist:
        def __init__(self):
            self.corpus = ray.get(corpus_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            dists = [
                mpdist(self.corpus[a], self.corpus[b], w, threshold=threshold)
                for a, b in zip(batch["doc_a"].to_pylist(),
                                batch["doc_b"].to_pylist())
            ]
            return batch.append_column("mpdist",
                                       pa.array(dists, pa.float64()))

    n_blocks = max(1, len(pairs) // batch_size)
    return (ray.data.from_arrow(pairs_table)
            .repartition(n_blocks)
            .map_batches(PairDist, batch_format="pyarrow",
                         batch_size=batch_size, concurrency=auto_concurrency()))


def pairwise_dist_distributed(sequences: pa.Table, w: int,
                              threshold: float = 0.05) -> np.ndarray:
    """Condensed distance matrix via the distributed pairs table — same
    layout as kernels.mpdist.pairwise_dist."""
    ids = sequences["doc_id"].to_pylist()
    index = {d: i for i, d in enumerate(ids)}
    m = len(ids)
    dm = np.empty((m * (m - 1)) // 2, dtype="d")
    out = mpdist_pairs(sequences, w, threshold=threshold).to_pandas()
    for _, row in out.iterrows():
        i, j = index[row.doc_a], index[row.doc_b]
        if i > j:
            i, j = j, i
        dm[m * i + j - ((i + 2) * (i + 1)) // 2] = row.mpdist
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
