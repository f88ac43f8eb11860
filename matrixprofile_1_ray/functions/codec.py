"""Delta-of-delta and XOR compression codecs (Gorilla-style, split-stream).

The north rule requires the gap-filled token streams to be "delta-of-delta +
Gorilla XOR compressed into Arrow binary columns".  Canonical Gorilla
(Pelkonen et al., VLDB 2015) interleaves variable-length records in one bit
stream, which forces sequential decode; at 10^12-sequence scale both encode
and decode must be vectorizable, so this codec keeps Gorilla's bucketed
delta-of-delta widths and XOR residuals but splits storage into a
fixed-width control stream plus one fixed-width substream per width class —
every step is a NumPy array op, no per-element loop in either direction.

Layout (little-endian):
  int codec:   b'D', n:uint32, v0:int32, d0:int32, ctrl[3b/elem], then the
               packed substreams for widths (7, 9, 12, 36) in class order.
  float codec: b'X', n:uint32, u0:uint64, ctrl[2b/elem], substreams for XOR
               residual widths (16, 36, 64).

Invariant (tested property-style): decode(encode(x)) == x exactly — int
streams bit-exact, float streams bit-exact including NaN payloads.
"""

from __future__ import annotations

import numpy as np

_INT_WIDTHS = (7, 9, 12, 36)     # Gorilla dod buckets, widened for int32 range
_FLOAT_WIDTHS = (16, 36, 64)   # significand buckets after trailing-zero shift


def _pack_bits(values: np.ndarray, width: int) -> np.ndarray:
    """Pack each value's low ``width`` bits, big-endian within the value."""
    if len(values) == 0:
        return np.empty(0, dtype=np.uint8)
    shifts = np.arange(width - 1, -1, -1, dtype=np.uint64)
    bits = ((values[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.ravel())


def _unpack_bits(buf: np.ndarray, count: int, width: int) -> np.ndarray:
    if count == 0:
        return np.empty(0, dtype=np.uint64)
    nbits = count * width
    bits = np.unpackbits(buf, count=nbits).reshape(count, width).astype(np.uint64)
    shifts = np.arange(width - 1, -1, -1, dtype=np.uint64)
    return (bits << shifts).sum(axis=1, dtype=np.uint64)


def _zigzag(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.int64)
    return ((v << 1) ^ (v >> 63)).astype(np.uint64)


def _unzigzag(z: np.ndarray) -> np.ndarray:
    z = z.astype(np.uint64)
    return ((z >> np.uint64(1)).astype(np.int64)) ^ -(z & np.uint64(1)).astype(np.int64)


def encode_int_dod(values) -> bytes:
    """Encode an int32 sequence as delta-of-delta with bucketed widths.

    The contract is int32 input (zigzagged dod then fits 35 bits <= the
    widest 36-bit bucket); out-of-range input raises instead of silently
    wrapping ``v[0]`` / leaving a nonzero residual in the zero class."""
    v = np.ascontiguousarray(values, dtype=np.int64)
    n = v.shape[0]
    if n and (v.min() < np.iinfo(np.int32).min or v.max() > np.iinfo(np.int32).max):
        raise OverflowError("encode_int_dod: values exceed the int32 contract")
    head = [b"D", np.uint32(n).tobytes()]
    if n == 0:
        return b"".join(head)
    head.append(np.int32(v[0]).tobytes())
    if n == 1:
        return b"".join(head)
    deltas = np.diff(v)
    head.append(np.int32(deltas[0]).tobytes())
    if n == 2:
        return b"".join(head)

    z = _zigzag(np.diff(deltas))
    # class 0 = zero dod; classes 1.. use _INT_WIDTHS buckets
    classes = np.zeros(z.shape[0], dtype=np.uint8)
    nonzero = z != 0
    bl = np.zeros_like(z)
    bl[nonzero] = np.floor(np.log2(z[nonzero].astype("d"))).astype(np.uint64) + 1
    for ci, width in enumerate(_INT_WIDTHS, start=1):
        classes[nonzero & (classes == 0) & (bl <= width)] = ci
    if bool(np.any(nonzero & (classes == 0))):
        raise OverflowError("encode_int_dod: delta-of-delta exceeds widest bucket")

    out = head
    out.append(_pack_bits(classes.astype(np.uint64), 3).tobytes())
    for ci, width in enumerate(_INT_WIDTHS, start=1):
        out.append(_pack_bits(z[classes == ci], width).tobytes())
    return b"".join(out)


def decode_int_dod(buf: bytes) -> np.ndarray:
    """Exact inverse of :func:`encode_int_dod` -> int32 array."""
    if buf[:1] != b"D":
        # explicit raise, not assert: python -O strips asserts, and a
        # misrouted/corrupt blob would then be decoded as silent garbage
        raise ValueError("not an int-dod stream")
    n = int(np.frombuffer(buf, np.uint32, 1, 1)[0])
    if n == 0:
        return np.empty(0, dtype=np.int32)
    v0 = int(np.frombuffer(buf, np.int32, 1, 5)[0])
    if n == 1:
        return np.array([v0], dtype=np.int32)
    d0 = int(np.frombuffer(buf, np.int32, 1, 9)[0])
    pos = 13
    k = n - 2

    raw = np.frombuffer(buf, np.uint8)
    ctrl_bytes = (k * 3 + 7) // 8
    classes = _unpack_bits(raw[pos : pos + ctrl_bytes], k, 3).astype(np.uint8)
    pos += ctrl_bytes

    z = np.zeros(k, dtype=np.uint64)
    for ci, width in enumerate(_INT_WIDTHS, start=1):
        where = classes == ci
        cnt = int(where.sum())
        nbytes = (cnt * width + 7) // 8
        z[where] = _unpack_bits(raw[pos : pos + nbytes], cnt, width)
        pos += nbytes

    dod = _unzigzag(z)
    deltas = np.concatenate(([d0], d0 + np.cumsum(dod)))
    return (v0 + np.concatenate(([0], np.cumsum(deltas)))).astype(np.int32)


def encode_float_xor(values) -> bytes:
    """Encode a float64 sequence as XOR residuals with bucketed widths."""
    v = np.ascontiguousarray(values, dtype="d")
    u = v.view(np.uint64)
    n = u.shape[0]
    head = [b"X", np.uint32(n).tobytes()]
    if n == 0:
        return b"".join(head)
    head.append(u[0].tobytes())
    if n == 1:
        return b"".join(head)

    x = u[1:] ^ u[:-1]
    nonzero = x != 0
    # trailing-zero elimination (the Gorilla "meaningful bits" trick):
    # store tz (6 bits) per nonzero residual plus the shifted significand
    tz = np.zeros_like(x)
    tmp = x.copy()
    tmp[~nonzero] = 1  # avoid infinite loop on zeros; tz unused there
    for shift in (32, 16, 8, 4, 2, 1):
        low_clear = (tmp & ((np.uint64(1) << np.uint64(shift)) - np.uint64(1))) == 0
        tz[low_clear] += np.uint64(shift)
        tmp[low_clear] >>= np.uint64(shift)
    sig = x >> tz

    bl = _bit_length(sig)
    classes = np.zeros(x.shape[0], dtype=np.uint8)
    for ci, width in enumerate(_FLOAT_WIDTHS, start=1):
        classes[nonzero & (classes == 0) & (bl <= width)] = ci

    out = head
    out.append(_pack_bits(classes.astype(np.uint64), 2).tobytes())
    out.append(_pack_bits(tz[nonzero], 6).tobytes())
    for ci, width in enumerate(_FLOAT_WIDTHS, start=1):
        out.append(_pack_bits(sig[classes == ci], width).tobytes())
    return b"".join(out)


def _bit_length(x: np.ndarray) -> np.ndarray:
    """Vectorized bit length of uint64 values (float log2 is unsafe >2^53)."""
    bl = np.zeros_like(x)
    tmp = x.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        big = tmp >= (np.uint64(1) << np.uint64(shift))
        bl[big] += np.uint64(shift)
        tmp[big] >>= np.uint64(shift)
    bl[x != 0] += 1
    return bl


def decode_float_xor(buf: bytes) -> np.ndarray:
    """Exact inverse of :func:`encode_float_xor` -> float64 array."""
    if buf[:1] != b"X":
        raise ValueError("not a float-xor stream")  # assert dies under -O
    n = int(np.frombuffer(buf, np.uint32, 1, 1)[0])
    if n == 0:
        return np.empty(0, dtype="d")
    u0 = np.frombuffer(buf, np.uint64, 1, 5)[0]
    if n == 1:
        return np.array([u0], dtype=np.uint64).view("d")
    pos = 13
    k = n - 1

    raw = np.frombuffer(buf, np.uint8)
    ctrl_bytes = (k * 2 + 7) // 8
    classes = _unpack_bits(raw[pos : pos + ctrl_bytes], k, 2).astype(np.uint8)
    pos += ctrl_bytes

    nonzero = classes != 0
    n_nz = int(nonzero.sum())
    tz_bytes = (n_nz * 6 + 7) // 8
    tz = _unpack_bits(raw[pos : pos + tz_bytes], n_nz, 6)
    pos += tz_bytes

    sig = np.zeros(k, dtype=np.uint64)
    for ci, width in enumerate(_FLOAT_WIDTHS, start=1):
        where = classes == ci
        cnt = int(where.sum())
        nbytes = (cnt * width + 7) // 8
        sig[where] = _unpack_bits(raw[pos : pos + nbytes], cnt, width)
        pos += nbytes

    x = sig
    x[nonzero] = sig[nonzero] << tz

    u = np.concatenate(([u0], x))
    return np.bitwise_xor.accumulate(u).view("d")
