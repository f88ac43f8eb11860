"""Pan-MatrixProfile (SKIMP) and related multi-window stages.

The shuffle-friendly PMP layout is one row per (doc_id, window) — windows
become rows, never a ragged 2-D cell (SURVEY.md §1.3).  All windows of one
document are computed in a single pass over its series (no token
duplication across window tasks); parallelism comes from the document axis,
which dominates at corpus scale.  ``pick_mp`` is a filter on the window
column (reference utils.py:45-100 analog)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.tokenize import (
    list_column_from_parts,
    list_column_to_numpy,
)
from ..kernels.mpx import mpx_self
from ..kernels.skimp import binary_split, maximum_subsequence


def _pmp_rows(batch: pa.Table, select_windows) -> pa.Table:
    """Shared (doc, window) row emitter: ``select_windows(ts)`` picks each
    doc's window list, one series pass computes every admissible window."""
    values, offsets = list_column_to_numpy(batch["tokens"])
    doc_rows, out_w, out_mp, out_pi = [], [], [], []
    for i in range(len(batch)):
        ts = values[offsets[i] : offsets[i + 1]].astype("d")
        for w in select_windows(ts):
            if ts.shape[0] < 2 * w:
                continue
            mp, pi = mpx_self(ts, int(w))
            doc_rows.append(i)
            out_w.append(int(w))
            out_mp.append(mp)
            out_pi.append(pi)
    take = pa.array(np.array(doc_rows, dtype=np.int64), pa.int64())
    return pa.table({
        "doc_id": batch["doc_id"].take(take),
        "source": batch["source"].take(take),
        "w": pa.array(out_w, pa.int32()),
        "mp": list_column_from_parts(out_mp, pa.float64()),
        "pi": list_column_from_parts(out_pi, pa.int64()),
    })


def pmp_batch(batch: pa.Table, windows=None, sample_pct: float = 0.1) -> pa.Table:
    """sequences batch -> one profile row per (doc, window).

    ``windows=None`` sweeps each doc's own default range 8..n/2 in BFS
    order truncated by ``sample_pct`` (the reference's anytime behavior,
    skimp.py:161-185); an explicit list computes exactly those windows."""
    fixed = list(windows) if windows is not None else None

    def select(ts):
        if fixed is not None:
            return fixed
        return (skimp_windows(ts.shape[0], sample_pct=sample_pct)
                if ts.shape[0] >= 16 else [])

    return _pmp_rows(batch, select)


def threshold_pmp_batch(batch: pa.Table, threshold: float = 0.98,
                        sample_pct: float = 1.0) -> pa.Table:
    """The reference's no-windows compute() dispatch (compute.py:116-127):
    per doc, ``maximum_subsequence`` finds the upper window, then the PMP
    covers ``range(8, upper + 1)`` in BFS order truncated by
    ``sample_pct`` (exactly skimp's anytime truncation, skimp.py:161-185
    — the reference passes sample_pct through to the PMP sweep); docs
    with no admissible upper window emit no rows.  Same output schema as
    :func:`pmp_batch`."""
    import warnings

    def select(ts):
        if ts.shape[0] < 16:
            return []
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            upper = maximum_subsequence(ts, threshold=threshold)
        if upper is None or (isinstance(upper, float) and np.isnan(upper)) \
                or int(upper) < 8:
            return []
        wins = list(range(8, int(upper) + 1))
        if sample_pct < 1:
            order = binary_split(len(wins))
            # floor but never to zero: the reference with last_index == 0
            # still returns a PMP object for the doc (all-inf rows,
            # skimp.py:181-185); a row-based stage that emitted nothing
            # would silently drop the doc from the output instead, so keep
            # at least the BFS-first window
            last = min(len(order),
                       max(1, int(np.floor(len(order) * sample_pct))))
            return [wins[j] for j in order[:last]]
        return wins

    return _pmp_rows(batch, select)


def pmp_stage(ds, windows=None, sample_pct: float = 0.1, batch_size: int = 128):
    return ds.map_batches(
        lambda b: pmp_batch(b, windows, sample_pct=sample_pct),
        batch_format="pyarrow", batch_size=batch_size)


def pick_mp_stage(pmp_ds, window: int):
    """Select one window's profiles out of the PMP table."""
    import pyarrow.compute as pc

    return pmp_ds.map_batches(
        lambda b: b.filter(pc.equal(b["w"], window)),
        batch_format="pyarrow")


def assemble_pmp(pmp_table: pa.Table, doc_id: str, windows) -> dict:
    """Reference-shaped dense PMP dict for one document (row-padded with
    inf, reference skimp.py:177-213) — driver-side convenience for parity
    checks and the discover ops that consume 2-D PMPs."""
    import pyarrow.compute as pc

    sub = pmp_table.filter(pc.equal(pmp_table["doc_id"], doc_id)).to_pydict()
    order = {int(w): k for k, w in enumerate(sub["w"])}
    windows = [int(w) for w in windows]
    # series length from the STORED rows only (profile_len + w - 1); seeding
    # with a requested window would inflate the width when windows[0]
    # exceeds the first stored row's w
    n = 0
    for k, w in enumerate(sub["w"]):
        n = max(n, len(sub["mp"][k]) + int(w) - 1)
    pmp = np.full((len(windows), n), np.inf)
    pmpi = np.full((len(windows), n), np.iinfo(np.int64).min, dtype=np.int64)
    for r, w in enumerate(windows):
        if w not in order:
            continue
        k = order[w]
        mp = np.asarray(sub["mp"][k])
        pi = np.asarray(sub["pi"][k])
        pmp[r, : mp.shape[0]] = mp
        pmpi[r, : pi.shape[0]] = pi
    return {
        "pmp": pmp, "pmpi": pmpi, "windows": np.array(windows),
        "sample_pct": 1, "metric": "euclidean", "algorithm": "skimp",
        "class": "PMP", "data": {"ts": None},
    }


def skimp_windows(n: int, sample_pct: float = 1.0, lower: int = 8):
    """The reference's default window sweep 8..n/2 in BFS order, truncated
    by sample_pct (reference skimp.py:161-185)."""
    windows = list(range(lower, n // 2 + 1))
    order = binary_split(len(windows))
    last = len(order)
    if sample_pct < 1:
        last = min(last, int(np.floor(len(order) * sample_pct)))
    return [windows[order[i]] for i in range(last)]


def maximum_subsequence_batch(batch: pa.Table, threshold: float = 0.95) -> pa.Table:
    """Per-doc upper-window search (reference skimp.py:245-381)."""
    values, offsets = list_column_to_numpy(batch["tokens"])
    doc_ids, uppers = [], []
    for i in range(len(batch)):
        ts = values[offsets[i] : offsets[i + 1]].astype("d")
        if ts.shape[0] < 16:
            continue
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            upper = maximum_subsequence(ts, threshold=threshold)
        doc_ids.append(batch["doc_id"][i].as_py())
        uppers.append(-1 if upper is np.nan or
                      (isinstance(upper, float) and np.isnan(upper))
                      else int(upper))
    return pa.table({
        "doc_id": pa.array(doc_ids, pa.string()),
        "upper_window": pa.array(uppers, pa.int64()),
    })


def maxsubseq_small_batch(batch: pa.Table, threshold: float = 0.985,
                          max_n: int = 256, sig2_floor: float = 1e-3,
                          margin: float = 1e-6) -> pa.Table:
    """Bounded-slice ``maximum_subsequence`` through the REAL kernel,
    guarded so the adaptive doubling+refine walk is SQL-reproducible.

    In the SQL-identical exact-integer corr arithmetic
    (:func:`~matrixprofile_1_ray.stages.profile._banded_corr`), keep only
    docs where corr_max(8) > threshold, corr_max(16) < threshold, and
    every probe window's corr_max clears threshold by > ``margin`` (the
    kernel's ~1e-12 float drift cannot flip a branch).  The doubling then
    always stops at u=8 (visits 8 then fails at 16) and the refine grid
    is the fixed evened set {10,12,14,16}, so
    ``upper_window = min w in {10,12,14,16} with corr_max(w) < threshold``
    — which DuckDB computes from five brute-force probes.  Output
    (doc_id, upper_window) is all-integer, so no rounding is needed."""
    import warnings

    from .slice_rule import banded_corr, doc_window_stats, iter_slice_docs

    probes = (8, 10, 12, 14, 16)
    doc_ids, uppers = [], []
    # multi-probe sig2 rule: the shared iterator applies the length bounds
    # only (w=None); each probe window runs its own guard below
    for doc, ts, _mu, _sig2 in iter_slice_docs(batch, None, min_n=32,
                                               max_n=max_n):
        cms, ok = {}, True
        for w in probes:
            mu, sig2 = doc_window_stats(ts, w)
            if sig2.min() < sig2_floor:
                ok = False
                break
            minlag = -(-w // 4)
            cb = banded_corr(ts, w, mu, np.sqrt(np.maximum(sig2, 0)),
                             minlag + 1)
            cms[w] = float(np.max(cb))
        if not ok or any(abs(cms[w] - threshold) <= margin for w in probes):
            continue
        if not (cms[8] > threshold and cms[16] < threshold):
            continue
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            upper = maximum_subsequence(ts, threshold=threshold)
        doc_ids.append(doc)
        uppers.append(int(upper))
    return pa.table({
        "doc_id": pa.array(doc_ids, pa.string()),
        "upper_window": pa.array(uppers, pa.int64()),
    })
