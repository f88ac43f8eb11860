"""Snippets, per-doc statistics, and annotation-vector stages."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.tokenize import list_column_to_numpy
from ..kernels.discover import snippets
from ..kernels.transform import (
    make_clipping_av,
    make_complexity_av,
    make_default_av,
    make_meanstd_av,
)

_AV_MAKERS = {
    "default": make_default_av,
    "complexity": make_complexity_av,
    "meanstd": make_meanstd_av,
    "clipping": make_clipping_av,
}


def snippets_small_batch(batch: pa.Table, snippet_size: int = 64,
                         num_snippets: int = 2,
                         sig2_floor: float = 1e-3,
                         margin_floor: float = 0.05005) -> pa.Table:
    """Oracle-able snippets slice: docs whose length is an exact multiple
    of ``snippet_size`` in [2*size, 4*size] (so the reference's zero-pad
    and its constant-window MASS conventions never trigger) and whose
    every w=size/2 window is non-constant.  Runs the REAL snippets kernel;
    emits the all-integer greedy picks (doc_id, rank, snippet_index) that
    the DuckDB oracle reproduces end-to-end (per-candidate sliding-MPDist
    matrix -> greedy coverage argmin with lowest-index tie-break).

    Margin guard (pins the argmin picks across engines): the engine and
    the SQL brute force compute the coverage sums in different IEEE op
    orders, so — like the motifs/regimes/maxsubseq oracles — docs where
    any of the ``num_snippets`` greedy picks is not decided by a healthy
    margin are dropped on BOTH sides.  The guard greedy runs on
    per-candidate MPDist vectors rounded to 4 dp (the oracle rounds
    identically, so its sums differ only by summation-order ulps) and
    requires a winner-vs-runner-up gap >= ``margin_floor`` at each step.
    Rounding shifts any coverage sum by at most N*5e-5 <= 194*5e-5 ~=
    0.0097, so the margin also pins the real kernel's unrounded argmin
    (shift < 2*0.0097 < margin_floor) — the emitted kernel picks provably
    equal the guard greedy's and the oracle's.  The default floor sits
    OFF the 1e-4 rounding lattice (0.05005): every attainable gap is a
    near-multiple of 1e-4 (within ~1e-13 summation noise), so the
    threshold comparison itself can never flip between engines — a gap
    of exactly 0.05 would be >= on one side and < on the other.

    The guard recomputes the distance matrix the kernel then rebuilds
    internally — deliberate: the gate's value is that the emitted picks
    come from the REAL unmodified kernel, and the bounded slice is tiny,
    so the doubled MASS work is noise."""
    from ..kernels.mpdist import mpdist_vector
    from .slice_rule import iter_slice_docs

    w = snippet_size // 2
    allowed = {2 * snippet_size, 3 * snippet_size, 4 * snippet_size}
    doc_ids, ranks, idxs = [], [], []
    for doc, ts, _mu, _sig2 in iter_slice_docs(
            batch, w, sig2_floor=sig2_floor,
            length_ok=lambda n: n in allowed):
        cands = np.arange(0, ts.shape[0] - snippet_size, snippet_size)
        if cands.shape[0] > 1:
            dmat = np.stack([
                np.round(mpdist_vector(ts, ts[c : c + snippet_size - 1], w), 4)
                for c in cands])
            minis = np.full(dmat.shape[1], np.inf)
            pinned = True
            for _ in range(num_snippets):
                sums = np.minimum(dmat, minis).sum(axis=1)
                order = np.sort(sums)
                if order[1] - order[0] < margin_floor:
                    pinned = False
                    break
                minis = np.minimum(dmat[int(np.argmin(sums))], minis)
            if not pinned:
                continue
        out = snippets(ts, snippet_size, num_snippets=num_snippets)
        for rank, snip in enumerate(out):
            doc_ids.append(doc)
            ranks.append(rank)
            idxs.append(int(snip["index"]))
    return pa.table({
        "doc_id": pa.array(doc_ids, pa.string()),
        "rank": pa.array(np.asarray(ranks, np.int64), pa.int64()),
        "snippet_index": pa.array(np.asarray(idxs, np.int64), pa.int64()),
    })


def snippets_batch(batch: pa.Table, snippet_size: int = 64,
                   num_snippets: int = 2, window_size=None) -> pa.Table:
    """Per-doc representative snippets (reference snippets.py:17-126)
    -> (doc_id, rank, index, fraction)."""
    doc_ids, ranks, idxs, fracs = [], [], [], []
    values, offsets = list_column_to_numpy(batch["tokens"])
    for i in range(len(batch)):
        ts = values[offsets[i] : offsets[i + 1]].astype("d")
        if ts.shape[0] < 2 * snippet_size:
            continue
        out = snippets(ts, snippet_size, num_snippets=num_snippets,
                       window_size=window_size)
        for rank, snip in enumerate(out):
            doc_ids.append(batch["doc_id"][i].as_py())
            ranks.append(rank)
            idxs.append(int(snip["index"]))
            fracs.append(float(snip["fraction"]))
    return pa.table({
        "doc_id": pa.array(doc_ids, pa.string()),
        "rank": pa.array(ranks, pa.int32()),
        "snippet_idx": pa.array(idxs, pa.int64()),
        "fraction": pa.array(fracs, pa.float64()),
    })


def corrected_profile_batch(batch: pa.Table, av: str = "complexity") -> pa.Table:
    """Attach av + corrected matrix profile columns to a profiles batch
    (cmp = mp + (1-av)*max(mp), reference transform.py:80-85).  Requires
    ``keep_tokens=True`` profiles."""
    maker = _AV_MAKERS[av]
    mp_vals, mp_off = list_column_to_numpy(batch["mp"])
    ts_vals, ts_off = list_column_to_numpy(batch["tokens"])
    ws = batch["w"].to_numpy()
    valid = batch["valid"].to_numpy(zero_copy_only=False)

    av_parts, cmp_parts = [], []
    for i in range(len(batch)):
        mp = mp_vals[mp_off[i] : mp_off[i + 1]].astype("d")
        if not valid[i] or mp.size == 0:
            av_parts.append(np.empty(0))
            cmp_parts.append(np.empty(0))
            continue
        ts = ts_vals[ts_off[i] : ts_off[i + 1]].astype("d")
        vec = maker(ts, int(ws[i]))
        av_parts.append(vec)
        cmp_parts.append(mp + (1 - vec) * np.max(mp))

    # shared builder (one concatenate + offsets, large_list fallback past
    # int32) instead of a hand-rolled copy with an unguarded int32 cast
    from ..functions.tokenize import list_column_from_parts

    batch = batch.append_column(
        "av", list_column_from_parts(av_parts, pa.float64()))
    batch = batch.append_column(
        "cmp", list_column_from_parts(cmp_parts, pa.float64()))
    return batch.append_column("av_type",
                               pa.array([av] * len(batch), pa.string()))
