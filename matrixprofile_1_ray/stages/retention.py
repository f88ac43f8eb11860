"""Retention + downsampled serving over the tiered rollup store.

The north rule asks for a rollup + **downsample + retention** engine, not
just continuous aggregates: old fine-grained data must expire without a
rewrite, and reads must transparently stitch each time range from the
finest tier still retained (the TimescaleDB / M3DB continuous-aggregate
pattern).  The reference library has no storage layer at all — retention
semantics here are engine-original; only the per-bucket VALUES come from
the reference's moving-stats kernels (reference core.py:282-394 via
stages/rollup.py).

Time model (SURVEY.md §2.11): token index = seconds, so a tier bucket
``b`` spans ``[b*tier_sec, (b+1)*tier_sec)`` and "age" is measured from a
caller-supplied watermark ``now_sec`` (ingest time at 10^12-sequence
scale; the max series length in tests).

Scale design — why the store is partitioned by ``kind/tier/epoch``:

* **Expiry is file-level**: dropping an epoch directory deletes every
  bucket that ended before the horizon without reading, shuffling or
  rewriting a single row.  At 100 TB a rewrite-based TTL is a non-starter;
  directory deletion is O(files), metadata-only.
* **Reads prune before bytes move**: ``PathPartitionFilter`` keeps only
  the epochs intersecting the query range × tier horizon, so a "last 7
  days from 1m, older from 1h" query never opens a cold epoch file.
* **Epoch width is stored in the layout** (``_store_meta.json``), so a
  reader can never prune with a different epoch arithmetic than the
  writer used.
"""

from __future__ import annotations

import json
import math
import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from ..io.fsutil import guarded_clean_dir

TIER_SECONDS = {"1m": 60, "1h": 3600, "1d": 86400}
_META_NAME = "_store_meta.json"
_LOG_NAME = "_retention_log.jsonl"


@dataclass(frozen=True)
class RetentionPolicy:
    """Per-tier maximum age in seconds (``None`` = keep forever).

    Tiers absent from the mapping are treated as keep-forever.  The
    default mirrors the classic metrics-store ladder: fine tiers are
    short-lived, the daily tier is permanent.
    """

    max_age: dict = field(default_factory=lambda: {
        "1m": 7 * 86400, "1h": 90 * 86400, "1d": None})

    def horizon(self, tier: str, now_sec: float):
        """Oldest timestamp tier ``tier`` still retains (None = -inf)."""
        age = self.max_age.get(tier)
        return None if age is None else now_sec - age


def _fs_and_path(path: str):
    from pyarrow import fs as pafs

    if "://" not in path:
        path = os.path.abspath(path)
    return pafs.FileSystem.from_uri(path)


def _epoch_of(tier_names, buckets: np.ndarray, epoch_sec: int) -> np.ndarray:
    tier_sec = np.fromiter((TIER_SECONDS[t] for t in tier_names),
                           dtype=np.int64, count=len(buckets))
    return (buckets * tier_sec) // epoch_sec


def add_epoch_column(batch: pa.Table, epoch_sec: int) -> pa.Table:
    """Vectorized ``epoch = bucket_start // epoch_sec`` over a unified
    rollup batch (long format with ``tier`` + ``bucket`` columns)."""
    tiers = batch["tier"].to_pylist()
    buckets = batch["bucket"].to_numpy(zero_copy_only=False)
    return batch.append_column(
        "epoch", pa.array(_epoch_of(tiers, buckets, epoch_sec), pa.int64()))


def write_tiered_store(sf_dir: str, store_dir: str, w: int = 32,
                       tiers=None, epoch_sec: int = 86400,
                       **seq_kwargs) -> dict:
    """One corpus pass -> hive store ``kind=*/tier=*/epoch=*``.

    Reuses the fused flagship transform (token + matrix-profile rollups in
    a single streaming pass, pipelines/flagship.py:82) and only appends the
    epoch partition key.  Returns the store metadata that was persisted.
    """
    from ..pipelines.flagship import flagship_batch, sequences_pipeline

    guarded_clean_dir(
        store_dir,
        lambda names: all(n.startswith("kind=") or n.startswith("_")
                          for n in names),
        "a tiered rollup store (kind=* partitions + _store_meta.json)")

    ds = sequences_pipeline(sf_dir, **seq_kwargs)
    unified = ds.map_batches(
        lambda b: add_epoch_column(flagship_batch(b, w=w, tiers=tiers),
                                   epoch_sec),
        batch_format="pyarrow", batch_size=64)
    unified.write_parquet(store_dir, partition_cols=["kind", "tier", "epoch"])

    meta = {"epoch_sec": int(epoch_sec), "w": int(w),
            "tiers": sorted((tiers or TIER_SECONDS).keys() if tiers is None
                            else tiers)}
    filesystem, rel = _fs_and_path(store_dir)
    with filesystem.open_output_stream(f"{rel}/{_META_NAME}") as f:
        f.write(json.dumps(meta).encode())
    return meta


def store_meta(store_dir: str) -> dict:
    filesystem, rel = _fs_and_path(store_dir)
    with filesystem.open_input_stream(f"{rel}/{_META_NAME}") as f:
        return json.loads(f.read().decode())


def _list_epoch_dirs(store_dir: str):
    """Yield (kind, tier, epoch, relative_dir) for every leaf partition."""
    from pyarrow import fs as pafs

    filesystem, rel = _fs_and_path(store_dir)
    for kind_info in filesystem.get_file_info(pafs.FileSelector(rel)):
        kname = kind_info.base_name
        if kind_info.type != pafs.FileType.Directory or \
                not kname.startswith("kind="):
            continue
        for tier_info in filesystem.get_file_info(
                pafs.FileSelector(kind_info.path)):
            tname = tier_info.base_name
            if not tname.startswith("tier="):
                continue
            for ep_info in filesystem.get_file_info(
                    pafs.FileSelector(tier_info.path)):
                ename = ep_info.base_name
                if not ename.startswith("epoch="):
                    continue
                yield (kname.split("=", 1)[1], tname.split("=", 1)[1],
                       int(ename.split("=", 1)[1]), ep_info.path)


def apply_retention(store_dir: str, now_sec: float,
                    policy: RetentionPolicy = None) -> dict:
    """Expire epoch directories entirely older than each tier's horizon.

    An epoch is expired iff the latest data instant any of its buckets can
    reach is <= the tier's horizon.  Epochs are keyed by bucket START, so
    that end is ``ceil((epoch+1)*epoch_sec / tier_sec) * tier_sec`` — equal
    to ``(epoch+1)*epoch_sec`` when buckets align with epochs, and the
    single bucket's own end when ``tier_sec > epoch_sec``.  A
    partially-retained epoch is kept whole (retention never truncates
    inside a file; the read path applies the exact horizon).  Deletion is
    directory-level: no row is read or rewritten.
    Idempotent — a re-run after a crash deletes nothing new and appends a
    fresh log record, so the ``_retention_log.jsonl`` audit trail shows
    every pass.  Returns ``{"deleted": [...], "kept": n}``.
    """
    policy = policy or RetentionPolicy()
    epoch_sec = store_meta(store_dir)["epoch_sec"]
    filesystem, rel = _fs_and_path(store_dir)

    deleted, kept = [], 0
    for kind, tier, epoch, path in _list_epoch_dirs(store_dir):
        horizon = policy.horizon(tier, now_sec)
        tier_sec = TIER_SECONDS[tier]
        data_end = math.ceil((epoch + 1) * epoch_sec / tier_sec) * tier_sec
        if horizon is not None and data_end <= horizon:
            filesystem.delete_dir(path)
            deleted.append({"kind": kind, "tier": tier, "epoch": epoch})
        else:
            kept += 1

    record = {"now_sec": now_sec, "deleted": deleted, "kept": kept,
              "policy": {k: v for k, v in policy.max_age.items()}}
    # append-only audit log (read-modify-write; retention runs are serial
    # maintenance jobs, not concurrent stages)
    log_path = f"{rel}/{_LOG_NAME}"
    from pyarrow import fs as pafs

    prior = b""
    if filesystem.get_file_info(log_path).type != pafs.FileType.NotFound:
        with filesystem.open_input_stream(log_path) as f:
            prior = f.read()
    with filesystem.open_output_stream(log_path) as f:
        f.write(prior + json.dumps(record).encode() + b"\n")
    return record


def _read_tier_range(store_dir: str, kind: str, tier: str, lo: float,
                     hi: float, epoch_sec: int):
    """Pruned read of one tier restricted to bucket_start in [lo, hi)."""
    import pyarrow.compute as pc
    import ray.data
    from ray.data.datasource.partitioning import PathPartitionFilter

    tier_sec = TIER_SECONDS[tier]
    ep_lo = int(lo // epoch_sec)
    ep_hi = int(math.ceil(hi / epoch_sec))  # exclusive

    def keep(kv) -> bool:
        if kv.get("kind") != kind or kv.get("tier") != tier:
            return False
        ep = int(kv.get("epoch", "-1"))
        return ep_lo <= ep < ep_hi

    ds = ray.data.read_parquet(
        store_dir, partition_filter=PathPartitionFilter.of(keep,
                                                           style="hive"),
        file_extensions=["parquet"])

    def clip(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch
        start = pc.multiply(batch["bucket"], tier_sec)
        mask = pc.and_(pc.greater_equal(start, int(lo)),
                       pc.less(start, int(hi)))
        out = batch.filter(mask)
        # hive keys come back typed by directory inference; normalize
        cols = {c: out[c] for c in out.column_names
                if c not in ("kind", "tier", "epoch")}
        n = len(out)
        cols["tier"] = pa.array([tier] * n, pa.string())
        cols["bucket_start"] = pa.array(
            out["bucket"].to_numpy(zero_copy_only=False) * tier_sec,
            pa.int64())
        return pa.table(cols)

    return ds.map_batches(clip, batch_format="pyarrow")


def stitch_plan(policy: RetentionPolicy, now_sec: float, t_lo: float,
                t_hi: float, tier_order=("1m", "1h", "1d")) -> list:
    """Pure serving plan for :func:`tiered_read`: ``[(tier, lo, hi), ...]``
    walking fine -> coarse, each tier serving ``[max(t_lo, horizon),
    finer tier's horizon)``.  Intervals are disjoint, descend in time, and
    jointly cover everything of ``[t_lo, t_hi)`` the policy still retains
    (property-tested in tests/test_retention.py)."""
    plan = []
    upper = t_hi
    for tier in tier_order:
        if upper <= t_lo:
            break
        horizon = policy.horizon(tier, now_sec)
        lo = t_lo if horizon is None else max(t_lo, horizon)
        if lo < upper:
            cap = now_sec if math.isinf(upper) else upper
            if lo < cap:
                plan.append((tier, lo, cap))
            upper = lo
        if horizon is None:   # keep-forever tier serves everything left
            break
    return plan


def tiered_read(store_dir: str, kind: str, now_sec: float,
                policy: RetentionPolicy = None, t_lo: float = 0.0,
                t_hi: float = None, tier_order=("1m", "1h", "1d")):
    """Serve ``[t_lo, t_hi)`` stitching the FINEST retained tier per range.

    Walking tiers fine -> coarse, each tier serves ``[max(t_lo, horizon),
    upper)`` where ``upper`` is the previous (finer) tier's horizon — the
    standard continuous-aggregate read: recent data at 1m grain, older at
    1h, ancient at 1d.  Ranges never overlap and jointly cover everything
    the policy still retains.  Each per-tier read prunes epochs at file
    discovery, so the union's cost is proportional to the data actually
    served.  Returns one Dataset tagged by ``tier`` + ``bucket_start``.
    """
    policy = policy or RetentionPolicy()
    epoch_sec = store_meta(store_dir)["epoch_sec"]
    t_hi = float("inf") if t_hi is None else t_hi

    parts = [_read_tier_range(store_dir, kind, tier, lo, hi, epoch_sec)
             for tier, lo, hi in stitch_plan(policy, now_sec, t_lo, t_hi,
                                             tier_order)]
    if not parts:
        raise ValueError("requested range is entirely past every tier's "
                         "retention horizon")
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    return ds


def downsample_read(store_dir: str, kind: str, t_lo: float, t_hi: float,
                    max_points: int, tier_order=("1m", "1h", "1d")):
    """Grafana-style serving: the finest tier whose per-doc point count
    over ``[t_lo, t_hi)`` fits ``max_points`` (the coarsest tier if none
    does).  One pruned read, no stitching."""
    epoch_sec = store_meta(store_dir)["epoch_sec"]
    chosen = tier_order[-1]
    for tier in tier_order:
        if math.ceil((t_hi - t_lo) / TIER_SECONDS[tier]) <= max_points:
            chosen = tier
            break
    return _read_tier_range(store_dir, kind, chosen, t_lo, t_hi, epoch_sec)
