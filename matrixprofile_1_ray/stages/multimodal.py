"""Multimodal column stages: opaque binary payloads + typed metadata.

Image/audio/video travel as Arrow ``binary`` columns with sidecar metadata
(mime, width/height or sample rate, frame count).  Decode / feature-extract
/ resize / frame-sample run as actor-pool ``map_batches`` stages whose
Ray-side plumbing (schema, batch sizing for large payloads, actor
signature, output layout) is real and tested; the *codec* itself is
stubbed: the image/audio libraries are not in this container, so
``DecodeStub`` either raises ``NotImplementedError`` (strict mode) or
produces a deterministic fake decode keyed on the payload hash (test mode).
Swap ``_decode_payload`` for a real PIL/libav call on a cluster that has
the libraries — nothing else changes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.string()),
    ("mime", pa.string()),
    ("payload", pa.binary()),
    ("width", pa.int32()),
    ("height", pa.int32()),
])


def make_fake_media_table(n: int, seed: int = 0) -> pa.Table:
    """Deterministic fake media corpus for plumbing tests."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=int(rng.integers(512, 4096)),
                             dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table({
        "media_id": pa.array([f"m{i:06d}" for i in range(n)], pa.string()),
        "mime": pa.array(["image/png"] * n, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "width": pa.array(rng.integers(32, 256, n).astype(np.int32)),
        "height": pa.array(rng.integers(32, 256, n).astype(np.int32)),
    })


def media_from_documents(sf_dir: str, n: int = 64) -> pa.Table:
    """Media corpus derived from the documents table: payload = UTF-8 text
    bytes of the first ``n`` docs in lexicographic doc_id order (matching
    ``ORDER BY CAST(doc_id AS VARCHAR) LIMIT n`` so the DuckDB oracle sees
    the same payload set).  The payloads are *opaque bytes* to every stage
    downstream — exactly how real image/audio columns would flow."""
    from ..sources.sequences import iter_docs_lex

    head = next(iter_docs_lex(sf_dir, ("doc_id", "text"), chunk=n), None)
    if head is None:
        head = pa.table({"doc_id": pa.array([], pa.string()),
                         "text": pa.array([], pa.string())})
    return pa.table({
        "media_id": head["doc_id"],
        "mime": pa.array(["text/plain"] * len(head), pa.string()),
        "payload": pa.array([t.encode() for t in head["text"].to_pylist()],
                            pa.binary()),
        "width": pa.array(np.zeros(len(head), np.int32)),
        "height": pa.array(np.zeros(len(head), np.int32)),
    })


class DecodeStub:
    """Actor-pool decode stage.  strict=True raises (the honest stub);
    strict=False emits a deterministic fake feature vector per payload so
    downstream stages are testable end-to-end."""

    def __init__(self, feature_dim: int = 16, strict: bool = False):
        self.feature_dim = feature_dim
        self.strict = strict

    def _decode_payload(self, payload: bytes) -> np.ndarray:
        if self.strict:
            raise NotImplementedError(
                "image/audio codecs are not available in this container; "
                "plug a real decoder here (PIL.Image.open / av.open)")
        # feature d = first 32 bits of sha256(payload || str(d)), scaled to
        # [0, 1).  Division by 2^32 is exact in float64, so the fake decode
        # is bit-reproducible in ANY engine with sha256 — the gate's DuckDB
        # oracle recomputes these values in SQL.
        vals = [int(hashlib.sha256(payload + str(d).encode())
                    .hexdigest()[:8], 16) for d in range(self.feature_dim)]
        return np.asarray(vals, dtype=np.float64) / 4294967296.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            # np.stack([]) raises; empty blocks pass through typed-empty
            return pa.table({
                "media_id": batch["media_id"],
                "mime": batch["mime"],
                "features": pa.array([], pa.list_(pa.float64())),
            })
        feats = np.stack([self._decode_payload(p.as_py())
                          for p in batch["payload"].combine_chunks()])
        off = pa.array(np.arange(len(batch) + 1, dtype=np.int32)
                       * self.feature_dim, pa.int32())
        return pa.table({
            "media_id": batch["media_id"],
            "mime": batch["mime"],
            "features": pa.ListArray.from_arrays(
                off, pa.array(feats.reshape(-1), pa.float64())),
        })


def media_features_stage(ds, feature_dim: int = 16, strict: bool = False,
                         concurrency=(1, 4), batch_size: int = 32):
    """Binary payloads are large: small batches, actor pool, Arrow-only
    (binary columns do not survive pandas round-trips)."""
    return ds.map_batches(
        DecodeStub,
        fn_constructor_kwargs={"feature_dim": feature_dim, "strict": strict},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


class ResizeStub:
    """Resize plumbing as an actor-pool stage: clamps each image's
    declared dims to fit inside ``(max_w, max_h)`` preserving aspect ratio
    and rewrites the metadata; the payload passes through opaque.  In
    strict mode the pixel-level resample raises like ``DecodeStub`` (no
    image codec in this container) — swap ``_resize_payload`` for a real
    PIL ``Image.resize`` call on a cluster that has it."""

    def __init__(self, max_w: int = 224, max_h: int = 224,
                 strict: bool = False):
        self.max_w = int(max_w)
        self.max_h = int(max_h)
        self.strict = strict

    def _resize_payload(self, payload: bytes, w: int, h: int) -> bytes:
        if self.strict:
            raise NotImplementedError(
                "image codecs are not available in this container; plug a "
                "real resampler here (PIL.Image.open(...).resize(...))")
        return payload  # opaque pass-through in stub mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch
        w = batch["width"].to_numpy().astype(np.float64)
        h = batch["height"].to_numpy().astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            scale = np.minimum(1.0, np.minimum(
                np.where(w > 0, self.max_w / w, 1.0),
                np.where(h > 0, self.max_h / h, 1.0)))
        new_w = np.maximum(1, np.floor(w * scale)).astype(np.int32)
        new_h = np.maximum(1, np.floor(h * scale)).astype(np.int32)
        new_w[w == 0] = 0
        new_h[h == 0] = 0
        payloads = pa.array(
            [self._resize_payload(p.as_py(), int(nw), int(nh))
             for p, nw, nh in zip(batch["payload"].combine_chunks(),
                                  new_w, new_h)], pa.binary())
        out = batch.set_column(batch.schema.get_field_index("payload"),
                               "payload", payloads)
        out = out.set_column(out.schema.get_field_index("width"), "width",
                             pa.array(new_w, pa.int32()))
        return out.set_column(out.schema.get_field_index("height"), "height",
                              pa.array(new_h, pa.int32()))


def resize_stage(ds, max_w: int = 224, max_h: int = 224,
                 strict: bool = False, concurrency=(1, 4),
                 batch_size: int = 32):
    """Actor-pool resize over a media Dataset (small batches — payloads
    are large; same sizing rationale as :func:`media_features_stage`)."""
    return ds.map_batches(
        ResizeStub,
        fn_constructor_kwargs={"max_w": max_w, "max_h": max_h,
                               "strict": strict},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


def frame_sample_batch(batch: pa.Table, every: int = 10) -> pa.Table:
    """Frame-sampling plumbing for video rows: emits (media_id, frame_idx)
    rows for frames 0, every, 2*every, ... of a declared frame count."""
    counts = batch["frame_count"].to_numpy()
    media_rows = np.repeat(np.arange(len(batch)), (counts + every - 1) // every)
    firsts = np.concatenate(([0], np.cumsum((counts + every - 1) // every)))[:-1]
    frame_idx = (np.arange(len(media_rows)) - np.repeat(firsts, (counts + every - 1) // every)) * every
    return pa.table({
        "media_id": batch["media_id"].take(pa.array(media_rows, pa.int64())),
        "frame_idx": pa.array(frame_idx, pa.int64()),
    })
