"""Dataset-level equivalents of the reference entry points.

Reference ``compute()`` (compute.py:29-145) and ``analyze()``
(analyze.py:173-272) dispatch per-series on (windows, sample_pct,
threshold); here the same dispatch selects the per-row pipeline applied to
every sequence of a Dataset:

  no windows + threshold  -> maximum_subsequence upper-window sweep + PMP
  window list             -> PMP over those windows (one row per doc,window)
  single window, pct>=1   -> exact MPX profile
  single window, pct<1    -> SCRIMP++ approximate profile

``analyze`` additionally attaches discords, motifs and regimes rows —
the discover chain of analyze.py:76-79 — as separate result tables
(visualization is out of scope in a headless engine; the reference's
matplotlib layer has no distributed analog).
"""

from __future__ import annotations

import numpy as np

from ..stages.discover_stage import discords_batch, motifs_batch, regimes_batch
from ..stages.pmp import pmp_batch, threshold_pmp_batch
from ..stages.profile import compute_profiles_batch


def compute(ds, windows=None, sample_pct: float = 1.0,
            threshold: float = 0.98, preprocessing=None):
    """Dispatch like reference compute.py:116-143; returns a Dataset of
    profile rows (single window) or PMP rows (multi-window)."""
    if preprocessing:
        from ..stages.gapfill import gapfill_batch

        mode = preprocessing.get("impute_method", "forward_fill")
        ds = ds.map_batches(lambda b: gapfill_batch(b, mode=mode),
                            batch_format="pyarrow")

    if windows is None:
        # upper-window search per doc, then PMP rows over 8..upper — the
        # reference's no-windows dispatch (compute.py:116-127), with
        # sample_pct passed through to the anytime PMP truncation
        return ds.map_batches(
            lambda b: threshold_pmp_batch(b, threshold=threshold,
                                          sample_pct=sample_pct),
            batch_format="pyarrow")
    # normalize any iterable (list/tuple/range/ndarray); a single-element
    # sequence collapses to the scalar dispatch like the reference
    # (compute.py:103-104)
    if not np.isscalar(windows):
        windows = [int(w) for w in np.asarray(windows).reshape(-1)]
        if not windows:
            raise ValueError("windows must be a non-empty iterable, an "
                             "int, or None (threshold dispatch)")
        if any(w < 4 for w in windows):
            raise ValueError(
                "Compute requires all window sizes to be greater than 3!")
        if len(windows) > 1:
            return ds.map_batches(lambda b: pmp_batch(b, windows),
                                  batch_format="pyarrow")
        windows = windows[0]
    w = int(windows)
    if w < 4:
        # same contract as api.compute / the reference: w<4 produces
        # degenerate (all-zero) profiles, not an approximation
        raise ValueError(
            "Compute requires all window sizes to be greater than 3!")
    algorithm = "mpx" if sample_pct >= 1 else "scrimp++"
    return ds.map_batches(
        lambda b: compute_profiles_batch(b, w=w, algorithm=algorithm,
                                         sample_pct=sample_pct),
        batch_format="pyarrow", batch_size=256)


def analyze(ds, window: int, sample_pct: float = 1.0):
    """Profile + discover chain (reference analyze.py:87-125): returns
    (profiles, discords, motifs, regimes) Datasets sharing one profile
    stage.  The profile stage MATERIALIZES: four lazy consumers off one
    un-materialized stage would each re-execute the whole MPX compute
    (verified 4x re-runs) — the same reason flagship.py materializes."""
    profiles = ds.map_batches(
        lambda b: compute_profiles_batch(
            b, w=window,
            algorithm="mpx" if sample_pct >= 1 else "scrimp++",
            sample_pct=sample_pct, keep_tokens=True),
        batch_format="pyarrow", batch_size=256).materialize()
    discords = profiles.map_batches(discords_batch, batch_format="pyarrow")
    motifs = profiles.map_batches(motifs_batch, batch_format="pyarrow")
    regimes = profiles.map_batches(regimes_batch, batch_format="pyarrow")
    return profiles, discords, motifs, regimes
