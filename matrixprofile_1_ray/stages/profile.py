"""Matrix-profile computation as a Ray Data batch transform.

One output row per input sequence: ``mp``/``pi`` list columns plus the
profile metadata scalars of the reference's MatrixProfile dict (reference
algorithms/mpx.py:82-100 defines the field set; the full series is NOT
embedded — results join back to the input on doc_id).

This is a *stateless* task stage on purpose: the kernels hold no model or
index, so an actor pool would only pin resources (see SURVEY.md §2.10 —
actor pools are reserved for the stages that do carry state: rolling tails
for chunked series, broadcast query matrices for ANN).
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from ..functions.tokenize import list_column_to_numpy
from ..kernels.mpx import mpx_self
from ..kernels.scrimp import scrimp_plus_plus
from ..kernels.stomp import stomp


def compute_profiles_batch(batch: pa.Table, w: int = 32,
                           algorithm: str = "mpx",
                           cross_correlation: bool = False,
                           sample_pct: float = 1.0,
                           keep_tokens: bool = False,
                           keep_lr: bool = False) -> pa.Table:
    """Compute per-row matrix profiles for a sequences batch.

    Rows shorter than ``2*w`` cannot support the window (reference
    stomp.py:261-263) and are emitted with empty profiles and
    ``valid=False`` rather than dropped, so row accounting is lossless.
    """
    if keep_lr and algorithm != "stomp":
        raise ValueError("left/right profiles require algorithm='stomp' "
                         "(reference stomp.py:90-94)")
    values, offsets = list_column_to_numpy(batch["tokens"])
    n_rows = len(batch)

    mp_parts: list[np.ndarray] = []
    pi_parts: list[np.ndarray] = []
    lr_parts: dict[str, list[np.ndarray]] = {k: [] for k in
                                             ("lmp", "lpi", "rmp", "rpi")}
    out_offsets = np.zeros(n_rows + 1, dtype=np.int64)
    valid = np.zeros(n_rows, dtype=bool)

    for i in range(n_rows):
        ts = values[offsets[i] : offsets[i + 1]].astype("d")
        if ts.shape[0] >= 2 * w:
            if algorithm == "mpx":
                mp, pi = mpx_self(ts, w, cross_correlation)
            elif algorithm == "stomp":
                prof = stomp(ts, w)
                mp, pi = prof["mp"], prof["pi"]
                if keep_lr:
                    for key in lr_parts:
                        lr_parts[key].append(prof[key])
            elif algorithm == "scrimp++":
                # deterministic per-doc seed (process-salted hash() is not)
                seed = zlib.crc32(batch["doc_id"][i].as_py().encode()) & 0x7FFFFFFF
                prof = scrimp_plus_plus(ts, w, sample_pct=sample_pct,
                                        random_state=seed)
                mp, pi = prof["mp"], prof["pi"]
            else:
                raise ValueError(f"unknown algorithm: {algorithm}")
            mp_parts.append(mp)
            pi_parts.append(pi)
            valid[i] = True
            out_offsets[i + 1] = out_offsets[i] + mp.shape[0]
        else:
            out_offsets[i + 1] = out_offsets[i]

    flat_mp = np.concatenate(mp_parts) if mp_parts else np.empty(0, "d")
    flat_pi = np.concatenate(pi_parts) if pi_parts else np.empty(0, np.int64)
    off32 = pa.array(out_offsets.astype(np.int32), type=pa.int32())
    cols = {
        "doc_id": batch["doc_id"],
        "source": batch["source"],
        "n_tok": batch["n_tok"],
        "w": pa.array(np.full(n_rows, w, dtype=np.int32)),
        "valid": pa.array(valid),
        "mp": pa.ListArray.from_arrays(off32, pa.array(flat_mp, pa.float64())),
        "pi": pa.ListArray.from_arrays(off32, pa.array(flat_pi, pa.int64())),
        "algorithm": pa.array([algorithm] * n_rows, pa.string()),
        "metric": pa.array(["cross_correlation" if cross_correlation else "euclidean"] * n_rows),
    }
    if keep_tokens:
        cols["tokens"] = batch["tokens"]
    if keep_lr:
        for key, parts in lr_parts.items():
            flat = np.concatenate(parts) if parts else np.empty(
                0, np.int64 if key.endswith("pi") else "d")
            typ = pa.int64() if key.endswith("pi") else pa.float64()
            cols[key] = pa.ListArray.from_arrays(off32, pa.array(flat, typ))
    return pa.table(cols)


def profile_stage(ds, w: int = 32, algorithm: str = "mpx",
                  batch_size: int = 256, **kwargs):
    """Attach the profile computation to a sequences Dataset."""
    return ds.map_batches(
        lambda b: compute_profiles_batch(b, w=w, algorithm=algorithm, **kwargs),
        batch_format="pyarrow", batch_size=batch_size,
    )
