"""Discovery stages over the profiles table: per-row discords, motifs,
regimes, and corpus-level top-k.

Each per-row operator consumes the mp/pi list columns (plus tokens when the
operator re-queries the series, as motifs do — reference
top_k_motifs.py:249-251) and emits flat result rows.  Corpus-level top-k is
per-row top-k followed by a global ``sort().limit()`` — the only all-to-all
step, over k rows per doc, not the raw data.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.tokenize import list_column_to_numpy
from ..kernels.discover import (
    extract_regimes,
    fluss,
    mp_top_k_discords,
    mp_top_k_motifs,
)


def _iter_profiles(batch: pa.Table, need_ts: bool = False):
    mp_vals, mp_off = list_column_to_numpy(batch["mp"])
    pi_vals, pi_off = list_column_to_numpy(batch["pi"])
    if need_ts:
        ts_vals, ts_off = list_column_to_numpy(batch["tokens"])
    valid = batch["valid"].to_numpy(zero_copy_only=False)
    ws = batch["w"].to_numpy()
    if "metric" in batch.column_names and len(batch):
        # discord argmax / motif radius rules assume DISTANCES: a
        # cross-correlation profile (values in [-1,1], larger=closer)
        # processed as euclidean would return the most SIMILAR windows
        # as top discords — refuse rather than silently invert
        metrics = set(batch["metric"].to_pylist())
        bad = metrics - {"euclidean", None}
        if bad:
            raise ValueError(
                f"discover stages need euclidean profiles, got metric(s) "
                f"{sorted(bad)}; recompute without cross_correlation")
    for i in range(len(batch)):
        if not valid[i]:
            continue
        prof = {
            "mp": mp_vals[mp_off[i] : mp_off[i + 1]].astype("d"),
            "pi": pi_vals[pi_off[i] : pi_off[i + 1]],
            "w": int(ws[i]),
            "ez": int(np.ceil(ws[i] / 2.0)),
            "join": False,
            "metric": "euclidean",
            "class": "MatrixProfile",
        }
        if need_ts:
            prof["data"] = {"ts": ts_vals[ts_off[i] : ts_off[i + 1]].astype("d")}
        yield i, prof


def discords_batch(batch: pa.Table, k: int = 3, exclusion_zone=None) -> pa.Table:
    """Per-doc top-k discords -> (doc_id, source, rank, discord_idx, mp_value)."""
    doc_ids, sources, ranks, idxs, vals = [], [], [], [], []
    batch_docs = batch["doc_id"].to_pylist()
    batch_sources = batch["source"].to_pylist()
    for i, prof in _iter_profiles(batch):
        mp = prof["mp"].copy()
        out = mp_top_k_discords(dict(prof), exclusion_zone=exclusion_zone, k=k)
        for rank, idx in enumerate(out["discords"]):
            doc_ids.append(batch_docs[i])
            sources.append(batch_sources[i])
            ranks.append(rank)
            idxs.append(int(idx))
            vals.append(float(mp[idx]))
    return pa.table({
        "doc_id": pa.array(doc_ids, pa.string()),
        "source": pa.array(sources, pa.string()),
        "rank": pa.array(ranks, pa.int32()),
        "discord_idx": pa.array(idxs, pa.int64()),
        "mp_value": pa.array(vals, pa.float64()),
    })


def motifs_batch(batch: pa.Table, k: int = 3, max_neighbors: int = 10,
                 radius: int = 3) -> pa.Table:
    """Per-doc top-k motifs -> one row per motif with its neighbor list."""
    doc_ids, ranks, firsts, seconds, neighbors, dists = [], [], [], [], [], []
    batch_docs = batch["doc_id"].to_pylist()
    for i, prof in _iter_profiles(batch, need_ts=True):
        mp = prof["mp"].copy()
        out = mp_top_k_motifs(dict(prof), k=k, max_neighbors=max_neighbors,
                              radius=radius)
        for rank, motif in enumerate(out["motifs"]):
            doc_ids.append(batch_docs[i])
            ranks.append(rank)
            firsts.append(int(motif["motifs"][0]))
            seconds.append(int(motif["motifs"][1]))
            neighbors.append([int(x) for x in motif["neighbors"]])
            # the pair's distance is the kernel's min_dist = mp at the
            # argmin endpoint; mp[first] alone is wrong whenever the
            # SMALLER index is not the argmin (its own mp points at a
            # different, earlier-excluded neighbor).  min over the pair
            # recovers the argmin's value exactly (for the global-min
            # pair both endpoints agree, so rank 0 is unchanged).
            a, b = motif["motifs"][0], motif["motifs"][1]
            dists.append(float(min(mp[a], mp[b])))
    return pa.table({
        "doc_id": pa.array(doc_ids, pa.string()),
        "rank": pa.array(ranks, pa.int32()),
        "motif_first": pa.array(firsts, pa.int64()),
        "motif_second": pa.array(seconds, pa.int64()),
        "neighbors": pa.array(neighbors, pa.list_(pa.int64())),
        "motif_dist": pa.array(dists, pa.float64()),
    })


def regimes_batch(batch: pa.Table, num_regimes: int = 3) -> pa.Table:
    """Per-doc FLUSS regimes -> (doc_id, rank, regime_idx, cac_min)."""
    doc_ids, ranks, idxs, cmins = [], [], [], []
    batch_docs = batch["doc_id"].to_pylist()
    for i, prof in _iter_profiles(batch):
        if prof["mp"].shape[0] <= 2 * prof["w"]:
            # intentional: profiles too short for one full arc window
            # yield a degenerate all-ones CAC (no regime information);
            # emitting no row is this engine's contract, and the
            # regimes_small SQL oracle encodes the same drop
            continue
        cac = fluss(prof)
        prof["cac"] = cac
        out = extract_regimes(prof, num_regimes=num_regimes)
        for rank, idx in enumerate(out["regimes"]):
            doc_ids.append(batch_docs[i])
            ranks.append(rank)
            idxs.append(int(idx))
            cmins.append(float(cac[idx]))
    return pa.table({
        "doc_id": pa.array(doc_ids, pa.string()),
        "rank": pa.array(ranks, pa.int32()),
        "regime_idx": pa.array(idxs, pa.int64()),
        "cac_value": pa.array(cmins, pa.float64()),
    })


def _block_topk(batch: pa.Table, col: str, k: int, descending: bool) -> pa.Table:
    """Keep each block's k best rows by ``col`` — INCLUDING every row tied
    with the k-th value, so the prune is lossless w.r.t. the downstream
    global ``sort().limit(k)`` whatever its tie-break.  Shrinks the
    all-to-all sort input from rows∝docs to ≤(k+ties)·n_blocks."""
    if len(batch) <= k:
        return batch
    v = batch[col].to_numpy(zero_copy_only=False)
    nan = np.isnan(v)
    finite = v[~nan]
    # NaNs poison np.partition's threshold (NaN thresh drops EVERY row);
    # rank only the comparable values and pass NaN rows through untouched
    # so the prune stays a no-op w.r.t. the unpruned global sort
    if finite.shape[0] <= k:
        return batch
    if descending:
        thresh = np.partition(finite, len(finite) - k)[len(finite) - k]
        mask = v >= thresh
    else:
        thresh = np.partition(finite, k - 1)[k - 1]
        mask = v <= thresh
    return batch.filter(pa.array(mask | nan))


def corpus_top_discords(profiles_ds, k_per_doc: int = 3, k_global: int = 10):
    """Global top-k discords across the corpus: per-row top-k (cheap,
    distributed), a per-block lossless top-k prune, then one small
    sort+limit over ~k_global rows per block instead of k_per_doc per doc."""
    per_doc = profiles_ds.map_batches(
        lambda b: discords_batch(b, k=k_per_doc), batch_format="pyarrow")
    pruned = per_doc.map_batches(
        lambda b: _block_topk(b, "mp_value", k_global, descending=True),
        batch_format="pyarrow")
    return pruned.sort("mp_value", descending=True).limit(k_global)


def corpus_top_motifs(profiles_ds, k_per_doc: int = 2, k_global: int = 10):
    """Global top-k motifs (lowest matrix-profile distance) across the
    corpus — same per-row-then-sort shape as the discord variant; requires
    keep_tokens=True profiles (motifs re-query the series)."""
    per_doc = profiles_ds.map_batches(
        lambda b: motifs_batch(b, k=k_per_doc), batch_format="pyarrow")
    pruned = (per_doc.drop_columns(["neighbors"])
              .map_batches(
                  lambda b: _block_topk(b, "motif_dist", k_global,
                                        descending=False),
                  batch_format="pyarrow"))
    return pruned.sort("motif_dist", descending=False).limit(k_global)
