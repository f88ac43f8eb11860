"""Distributed deduplication over the sequences table.

Exact dedup: content-hash per row in ``map_batches`` (vectorized), then one
``groupby(content_hash)`` keeping the lexicographically-first doc — the
hash-partition + per-group-first pattern.  At 100 TB the shuffle moves only
(hash, doc_id, source) triples, never the tokens.

MinHash-LSH near-dup: shingle -> minhash -> band keys per batch, explode to
(band, band_key, doc_id) rows, ``groupby`` the band buckets, emit candidate
pairs, then verify exact shingle Jaccard for candidate pairs only.

SimHash near-dup: one fingerprint per row; identical fingerprints bucket
together via the same groupby machinery.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.dedup import (
    band_keys,
    jaccard,
    minhash_signatures,
    shingle_hashes,
    simhash,
)
from ..functions.tokenize import list_column_to_numpy


def content_hash_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, source, content_hash) — sha1 of the raw token bytes."""
    values, offsets = list_column_to_numpy(batch["tokens"])
    values = np.ascontiguousarray(values, dtype=np.int32)
    hashes = [
        hashlib.sha1(values[offsets[i] : offsets[i + 1]].tobytes()).hexdigest()
        for i in range(len(batch))
    ]
    return pa.table({
        "doc_id": batch["doc_id"],
        "source": batch["source"],
        "content_hash": pa.array(hashes, pa.string()),
    })


def exact_dedup(ds, num_partitions: int = 16):
    """-> (rep_doc_id, dup_count) one row per distinct content.

    Explicit hash partitioning: every key maps to one of ``num_partitions``
    coarse parts, the shuffle groups on the part id, and the per-part UDF
    does a *vectorized* pandas groupby over all of its keys at once.
    (A bare ``groupby(content_hash).map_groups`` invokes the UDF once per
    key — at millions of tiny groups that Python dispatch dominates wall
    time; coarse parts cap UDF invocations at num_partitions.)"""
    hashed = ds.map_batches(content_hash_batch, batch_format="pyarrow")

    def add_part(batch: pa.Table) -> pa.Table:
        # first hex bytes of the content hash are uniform — cheap part id
        part = np.array([int(h[:8], 16) % num_partitions
                         for h in batch["content_hash"].to_pylist()],
                        dtype=np.int64)
        return batch.append_column("_part", pa.array(part, pa.int64()))

    def reduce_part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("content_hash", as_index=False).agg(
            rep_doc_id=("doc_id", "min"), dup_count=("doc_id", "size"))
        g["dup_count"] = g["dup_count"].astype(np.int64)
        return g[["rep_doc_id", "dup_count"]]

    return (hashed.map_batches(add_part, batch_format="pyarrow")
            .groupby("_part")
            .map_groups(reduce_part, batch_format="pandas"))


def minhash_band_batch(batch: pa.Table, k: int = 5, num_perm: int = 64,
                       bands: int = 16, seed: int = 7) -> pa.Table:
    """Explode each row to its LSH band rows: (band, band_key, doc_id)."""
    values, offsets = list_column_to_numpy(batch["tokens"])
    flat, sh_off = shingle_hashes(values, offsets, k=k)
    sig = minhash_signatures(flat, sh_off, num_perm=num_perm, seed=seed)
    keys = band_keys(sig, bands=bands)
    n_rows = len(batch)
    doc_rep = batch["doc_id"].take(
        pa.array(np.repeat(np.arange(n_rows), bands), pa.int64()))
    return pa.table({
        "band": pa.array(np.tile(np.arange(bands), n_rows), pa.int32()),
        "band_key": pa.array(keys.reshape(-1), pa.uint64()),
        "doc_id": doc_rep,
    })


def minhash_candidates(ds, k: int = 5, num_perm: int = 64, bands: int = 16,
                       seed: int = 7, num_partitions: int = 16):
    """-> candidate near-dup pairs (doc_a, doc_b) from shared LSH buckets.

    Two coarse hash-partitioned shuffles, both with vectorized per-part
    reductions: bucket rows by (band, band_key) -> emit pairs per multi-doc
    bucket; then bucket the pair rows -> drop duplicates (a pair can
    surface from several bands).  Shuffled payload is (band_key, doc_id)
    pairs only — tokens never move."""
    band_rows = ds.map_batches(
        lambda b: minhash_band_batch(b, k=k, num_perm=num_perm, bands=bands,
                                     seed=seed),
        batch_format="pyarrow")
    band_rows = band_rows.map_batches(
        lambda b: b.append_column(
            "_part", pa.array((b["band_key"].to_numpy()
                               % np.uint64(num_partitions)).astype(np.int64),
                              pa.int64())),
        batch_format="pyarrow")

    def pairs_block(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["band", "band_key", "doc_id"])
        sizes = df.groupby(["band", "band_key"])["doc_id"].transform("size")
        multi = df[sizes > 1]
        out_a, out_b = [], []
        for (_band, _key), g in multi.groupby(["band", "band_key"]):
            docs = g["doc_id"].to_numpy()
            ii, jj = np.triu_indices(len(docs), 1)
            out_a.append(docs[ii])
            out_b.append(docs[jj])
        if not out_a:
            return pd.DataFrame({"doc_a": pd.Series([], dtype=object),
                                 "doc_b": pd.Series([], dtype=object)})
        return pd.DataFrame({"doc_a": np.concatenate(out_a),
                             "doc_b": np.concatenate(out_b)})

    cand = band_rows.groupby("_part").map_groups(pairs_block,
                                                 batch_format="pandas")

    def add_pair_part(df: pd.DataFrame) -> pd.DataFrame:
        key = pd.util.hash_pandas_object(df["doc_a"] + "\x00" + df["doc_b"],
                                         index=False)
        df = df.copy()
        df["_part"] = (key % num_partitions).astype(np.int64)
        return df

    def uniq_block(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["doc_a", "doc_b"])[["doc_a", "doc_b"]]

    return (cand.map_batches(add_pair_part, batch_format="pandas")
            .groupby("_part")
            .map_groups(uniq_block, batch_format="pandas"))


def verify_jaccard_pairs(pairs_df: pd.DataFrame, sequences: pa.Table,
                         k: int = 5, threshold: float = 0.8) -> pd.DataFrame:
    """Exact n-gram Jaccard for candidate pairs (driver-side or per-bucket;
    the candidate set is orders of magnitude smaller than the corpus)."""
    values, offsets = list_column_to_numpy(sequences["tokens"])
    flat, sh_off = shingle_hashes(values, offsets, k=k)
    index = {d: i for i, d in enumerate(sequences["doc_id"].to_pylist())}

    def row_set(doc):
        i = index[doc]
        return flat[sh_off[i] : sh_off[i + 1]]

    sims = [jaccard(row_set(a), row_set(b))
            for a, b in zip(pairs_df["doc_a"], pairs_df["doc_b"])]
    out = pairs_df.copy()
    out["jaccard"] = sims
    return out[out["jaccard"] >= threshold].reset_index(drop=True)


def dedup_groups(pairs_ds, driver_threshold: int = 1_000_000):
    """Candidate pairs -> duplicate groups.

    Hybrid per the standard playbook: when the candidate set is provably
    small (it is orders of magnitude smaller than the corpus — count it
    first), a driver-side union-find labels everything in one pass; only
    a pathologically large candidate graph falls back to the distributed
    iterative min-label propagation (:func:`connected_components`)."""
    n_pairs = pairs_ds.count()
    if n_pairs <= driver_threshold:
        import pandas as pd_

        df = pairs_ds.to_pandas()
        parent: dict = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in zip(df["doc_a"], df["doc_b"]):
            ra, rb = find(a), find(b)
            if ra != rb:
                lo, hi = sorted((ra, rb))
                parent[hi] = lo
        nodes = sorted(parent)
        import ray.data

        return ray.data.from_pandas(pd_.DataFrame({
            "doc_id": nodes,
            "component": [find(n) for n in nodes],
        }))
    return connected_components(pairs_ds)


def connected_components(pairs_ds, max_iters: int = 6,
                         num_partitions: int = 16,
                         check_fixpoint: bool = False):
    """Duplicate GROUPS from candidate pairs via iterative min-label
    propagation: every node starts labeled with itself; each round pushes
    labels across edges and keeps the per-node minimum.  Rounds needed =
    graph diameter; LSH candidate clusters are clique-like, so 2-3 rounds
    suffice and ``max_iters`` is a safety bound.  By default the rounds
    chain LAZILY into one streaming DAG (one Ray execution total);
    ``check_fixpoint`` materializes each round and stops early on a
    label-sum fixpoint — use it when the diameter is unknown.
    Entirely groupby-based — the distributed-safe path when the candidate
    set exceeds driver memory (see :func:`dedup_groups`).

    -> Dataset (doc_id, component) with component = lexicographic-min
    member of the connected component."""
    import pyarrow as pa_

    def both_dirs(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "src": pd.concat([df["doc_a"], df["doc_b"]], ignore_index=True),
            "dst": pd.concat([df["doc_b"], df["doc_a"]], ignore_index=True),
        })

    edges = pairs_ds.map_batches(both_dirs, batch_format="pandas")

    def _part_of(series: pd.Series) -> pd.Series:
        return (pd.util.hash_pandas_object(series.astype(str), index=False)
                % num_partitions).astype("int64")

    def min_label_per_node(ds):
        """Coarse-part vectorized min-reduce: (node, label) -> one row per
        node (the per-key map_groups alternative is Python-per-node)."""
        def add_part(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["_p"] = _part_of(df["node"])
            return df

        def reduce_part(df: pd.DataFrame) -> pd.DataFrame:
            return (df.groupby("node", as_index=False)["label"].min())

        return (ds.map_batches(add_part, batch_format="pandas")
                .groupby("_p").map_groups(reduce_part, batch_format="pandas"))

    labels = min_label_per_node(edges.map_batches(
        lambda df: pd.DataFrame({"node": df["src"], "label": df["src"]}),
        batch_format="pandas"))

    prev_sig = None
    for _ in range(max_iters):
        from .join import hash_join

        msgs = hash_join(
            edges,
            labels.map_batches(lambda df: df.rename(columns={"node": "src"}),
                               batch_format="pandas"),
            "src", num_partitions=num_partitions)
        candidates = msgs.map_batches(
            lambda df: pd.DataFrame({"node": df["dst"], "label": df["label"]}),
            batch_format="pandas").union(labels)

        labels = min_label_per_node(candidates)
        if not check_fixpoint:
            continue
        labels = labels.materialize()
        sig = labels.map_batches(
            lambda df: pd.DataFrame({"h": [int(pd.util.hash_pandas_object(
                df["label"], index=False).sum() % (2**61))]}),
            batch_format="pandas").to_pandas()["h"].sum()
        if sig == prev_sig:
            break
        prev_sig = sig

    return labels.map_batches(
        lambda df: df.rename(columns={"label": "component"})[["node", "component"]]
        .rename(columns={"node": "doc_id"}),
        batch_format="pandas")


def simhash_batch(batch: pa.Table, k: int = 5) -> pa.Table:
    """(doc_id, simhash) fingerprints."""
    values, offsets = list_column_to_numpy(batch["tokens"])
    flat, sh_off = shingle_hashes(values, offsets, k=k)
    fp = simhash(flat, sh_off)
    return pa.table({
        "doc_id": batch["doc_id"],
        "fingerprint": pa.array(fp, pa.uint64()),
    })


def embedding_near_dup(ds, threshold: float = 0.95, planes: int = 16,
                       seed: int = 11, dim: int = 64):
    """Embedding-cosine near-dup: random-hyperplane LSH bucket per vector,
    exact cosine verification inside each bucket."""
    rng = np.random.default_rng(seed)
    hyper = rng.normal(size=(dim, planes))

    def bucket(batch: pa.Table) -> pa.Table:
        emb, offsets = list_column_to_numpy(batch["embedding"])
        mat = emb.astype("d").reshape(len(batch), -1)
        signs = (mat @ hyper) > 0
        key = (signs << np.arange(planes)).sum(axis=1).astype(np.int64)
        return pa.table({
            "vec_id": batch["vec_id"],
            "bucket": pa.array(key, pa.int64()),
            "embedding": batch["embedding"],
        })

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(g["embedding"].to_numpy()).astype("d")
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1
        sims = (mat / norms) @ (mat / norms).T
        ids = g["vec_id"].to_numpy()
        ii, jj = np.where(np.triu(sims, 1) >= threshold)
        return pd.DataFrame({
            "vec_a": ids[ii].astype(np.int64),
            "vec_b": ids[jj].astype(np.int64),
            "cosine": sims[ii, jj],
        })

    return (ds.map_batches(bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(verify, batch_format="pandas"))
