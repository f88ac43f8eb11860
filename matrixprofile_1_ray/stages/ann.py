"""Similarity search over the embeddings table.

Baseline: brute-force cosine top-k — the query matrix is broadcast once
(``ray.put`` on the driver, fetched in each actor's ``__init__``), each
batch is one BLAS matmul, per-batch top-k candidates flow into a tiny
``groupby(query_id)`` refine.  The shuffle carries k rows per query per
batch, never the embeddings.

Scale path: IVF — centroids fitted on a driver-side sample (k-means, a few
Lloyd iterations), every vector assigned to its centroid in ``map_batches``;
a query probes the closest ``nprobe`` centroids so only those partitions are
scanned.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.tokenize import list_column_to_numpy


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def _emb_matrix(batch: pa.Table) -> np.ndarray:
    emb, _ = list_column_to_numpy(batch["embedding"])
    return emb.astype("d").reshape(len(batch), -1)


class BruteForceTopK:
    """Actor-pool stage: holds the normalized query matrix (fetched once per
    actor from the broadcast ref) and emits per-batch top-k candidates."""

    def __init__(self, queries_ref, k: int = 10):
        import ray

        queries = ray.get(queries_ref) if not isinstance(queries_ref, np.ndarray) else queries_ref
        self.queries = _normalize(np.asarray(queries, dtype="d"))
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _normalize(_emb_matrix(batch))
        sims = self.queries @ mat.T                      # [n_q, n_batch]
        k = min(self.k, sims.shape[1])
        top = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        n_q = sims.shape[0]
        qid = np.repeat(np.arange(n_q), k)
        cand = top.reshape(-1)
        vec_ids = batch["vec_id"].to_numpy()
        return pa.table({
            "query_id": pa.array(qid, pa.int64()),
            "vec_id": pa.array(vec_ids[cand], pa.int64()),
            "score": pa.array(sims[qid, cand], pa.float64()),
        })


def brute_force_topk(ds, queries: np.ndarray, k: int = 10,
                     concurrency=(1, 4), batch_size: int = 4096):
    """-> (query_id, vec_id, score, rank) global top-k per query."""
    import ray

    queries_ref = ray.put(np.asarray(queries, dtype="d"))

    candidates = ds.map_batches(
        BruteForceTopK,
        fn_constructor_kwargs={"queries_ref": queries_ref, "k": k},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)

    def refine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(len(g), dtype=np.int64)
        return g

    return candidates.groupby("query_id").map_groups(refine,
                                                     batch_format="pandas")


def fit_centroids(sample: np.ndarray, n_centroids: int = 16,
                  iters: int = 10, seed: int = 13) -> np.ndarray:
    """Driver-side mini k-means on a corpus sample (spherical)."""
    rng = np.random.default_rng(seed)
    sample = _normalize(np.asarray(sample, dtype="d"))
    cent = sample[rng.choice(len(sample), size=n_centroids, replace=False)]
    for _ in range(iters):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(n_centroids):
            members = sample[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent)
    return cent


def ivf_topk(ds, queries: np.ndarray, k: int = 10, n_centroids: int = 16,
             nprobe: int = 4, sample_size: int = 2048, seed: int = 13):
    """IVF search: assign vectors to centroid lists, scan only the probed
    lists per query, exact cosine rerank inside them."""
    import ray

    sample_rows = ds.limit(sample_size).take_all()
    sample = np.stack([np.asarray(r["embedding"], dtype="d") for r in sample_rows])
    centroids = fit_centroids(sample, n_centroids=n_centroids, seed=seed)
    cent_ref = ray.put(centroids)

    queries = _normalize(np.asarray(queries, dtype="d"))
    probes = np.argsort(-(queries @ centroids.T), axis=1)[:, :nprobe]
    probe_sets = [set(row) for row in probes]
    queries_ref = ray.put(queries)
    probes_ref = ray.put(probe_sets)

    class ProbeScan:
        def __init__(self):
            self.centroids = ray.get(cent_ref)
            self.queries = ray.get(queries_ref)
            self.probe_sets = ray.get(probes_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            mat = _normalize(_emb_matrix(batch))
            assign = np.argmax(mat @ self.centroids.T, axis=1)
            vec_ids = batch["vec_id"].to_numpy()
            out_q, out_v, out_s = [], [], []
            for qi, probe in enumerate(self.probe_sets):
                mask = np.isin(assign, list(probe))
                if not mask.any():
                    continue
                sims = mat[mask] @ self.queries[qi]
                kk = min(k, sims.shape[0])
                top = np.argpartition(-sims, kk - 1)[:kk]
                out_q.append(np.full(kk, qi, dtype=np.int64))
                out_v.append(vec_ids[mask][top])
                out_s.append(sims[top])
            if not out_q:
                return pa.table({"query_id": pa.array([], pa.int64()),
                                 "vec_id": pa.array([], pa.int64()),
                                 "score": pa.array([], pa.float64())})
            return pa.table({
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
                "score": pa.array(np.concatenate(out_s), pa.float64()),
            })

    candidates = ds.map_batches(ProbeScan, batch_format="pyarrow",
                                batch_size=4096, concurrency=(1, 2))

    def refine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(len(g), dtype=np.int64)
        return g

    return candidates.groupby("query_id").map_groups(refine,
                                                     batch_format="pandas")
