"""Deterministic text -> token-array derivation.

The engine's sequences table (BASELINE.json input_hint: doc_id, tokens
list<int32>, n_tok, source) is derived from the testdata ``documents`` table
by mapping each character to its code point.  For ASCII corpora this is
zero-copy from the Arrow string buffers (utf8 bytes == code points); the
same derivation is expressible in the DuckDB oracle as
``list_transform(split(text, ''), x -> ascii(x))``, which is what makes the
tokenizer itself oracle-checkable.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def tokenize_text_column(texts: pa.ChunkedArray | pa.Array) -> pa.ListArray:
    """Map a utf8 string column to list<int32> code points.

    ASCII fast path: reinterpret the value buffer (zero copy from the object
    store) and reuse the string offsets for the list layout.  Non-ASCII rows
    fall back to a utf-32 reinterpretation per batch.
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if pa.types.is_large_string(texts.type):
        texts = texts.cast(pa.string())

    buffers = texts.buffers()
    offsets = np.frombuffer(buffers[1], dtype=np.int32)[
        texts.offset : texts.offset + len(texts) + 1
    ]
    data = np.frombuffer(buffers[2], dtype=np.uint8) if buffers[2] is not None else np.empty(0, np.uint8)
    values = data[offsets[0] : offsets[-1]]

    if values.size == 0 or values.max() < 0x80:
        tokens = values.astype(np.int32)
        rel_offsets = (offsets - offsets[0]).astype(np.int32)
    else:
        # rare path: real code points via utf-32 round-trip.  Null rows
        # become empty token lists, matching the ASCII path (their string
        # buffer contributes zero bytes there)
        pylist = texts.to_pylist()
        joined = "".join(t or "" for t in pylist)
        tokens = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32).astype(np.int32)
        lens = np.fromiter((len(t) if t else 0 for t in pylist),
                           count=len(pylist), dtype=np.int64)
        rel_offsets = np.concatenate(([0], np.cumsum(lens))).astype(np.int32)

    return pa.ListArray.from_arrays(pa.array(rel_offsets, type=pa.int32()),
                                    pa.array(tokens, type=pa.int32()))


def detokenize(tokens) -> str:
    """Inverse map for tests: code points -> text."""
    return "".join(chr(int(t)) for t in tokens)


def list_column_to_numpy(col: pa.ChunkedArray | pa.Array):
    """(values, offsets) view of a list<numeric> column — zero copy.

    Returns the flat values as one ndarray plus int64 row offsets; row i is
    ``values[offsets[i]:offsets[i+1]]``.  This is how every kernel stage
    reads the ragged tokens column without materializing Python lists.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, pa.LargeListArray):
        offsets = col.offsets.to_numpy()
    else:
        offsets = col.offsets.to_numpy().astype(np.int64)
    values = col.values.to_numpy(zero_copy_only=False)
    # account for a sliced / non-compacted array whose offsets do not start
    # at 0 or whose child buffer extends past the last row: rebase so values
    # spans exactly offsets[0]:offsets[-1].  Whole-array vectorized callers
    # (np.minimum.reduceat to the array end, arange-based dim indices) rely
    # on this; per-row slicing is unaffected.  Both ops are numpy views —
    # still zero copy.
    if len(offsets) and (offsets[0] != 0 or len(values) != offsets[-1]):
        values = values[offsets[0] : offsets[-1]]
        offsets = offsets - offsets[0]
    return values, offsets


_INT32_MAX = np.iinfo(np.int32).max


def numpy_to_list_column(values: np.ndarray, offsets: np.ndarray,
                         value_type=None, large: bool = False):
    """Build a list column back from flat values + offsets.

    ``large=True`` (or a flat length past int32) emits a LargeListArray —
    the read path accepts large_list (list_column_to_numpy handles both),
    so a round-trip like gapfill must be able to hand the same type back
    instead of silently flipping large_list -> list (schema mismatch at
    the next concat) or overflowing the int32 offset cast."""
    arr = pa.array(values, type=value_type) if value_type else pa.array(values)
    off = offsets - offsets[0]
    if large or (len(off) and off[-1] > _INT32_MAX):
        return pa.LargeListArray.from_arrays(
            pa.array(off, type=pa.int64()), arr)
    return pa.ListArray.from_arrays(pa.array(off, type=pa.int32()), arr)


def list_column_from_parts(parts: list, value_type):
    """List column from per-row numpy arrays WITHOUT per-element Python
    boxing: one concatenate + one offsets array, zero ``.tolist()``.
    Falls back to large_list offsets past int32 (see
    numpy_to_list_column)."""
    flat = (np.concatenate(parts) if parts
            else np.empty(0, pa.DataType.to_pandas_dtype(value_type)))
    offsets = np.zeros(len(parts) + 1, dtype=np.int64)
    if parts:
        np.cumsum([p.shape[0] for p in parts], out=offsets[1:])
    if offsets[-1] > _INT32_MAX:
        return pa.LargeListArray.from_arrays(
            pa.array(offsets, type=pa.int64()),
            pa.array(flat, type=value_type))
    return pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()), pa.array(flat, type=value_type))
