"""Binary ``.mpf`` profile archives (MPFOutput protobuf wire format).

Reference users persist profiles with ``io.to_mpf`` / ``from_mpf``
(reference io/protobuf/protobuf_utils.py:299-316, 411-476; schema
io/protobuf/proto_messages.proto:69-111).  This module reads and writes
that exact wire format with a self-contained proto3 codec — varints, tags,
length-delimited submessages, packed repeated fields — so archives written
by the reference load here and vice versa, without a protobuf dependency
or generated code.  Packed double payloads encode/decode as one numpy
``tobytes``/``frombuffer`` (no per-element Python on the big arrays).

Field map (proto_messages.proto):
  MPFOutput: 1 klass, 2 algorithm, 3 metric, 4 sample_pct, 5 windows
  (packed uint64), 6 ts, 7 query (DoubleMatrix), 8 mp (MatrixProfile),
  9 pmp (PanMatrixProfile), 10 motifs (Motif), 11 discords (Location),
  12 cmp, 13 av (DoubleMatrix), 14 av_type.
  DoubleMatrix/IntMatrix: 1 rows, 2 cols, 3 data (packed).
  MatrixProfile: 1 mp, 2 pi, 3 lmp, 4 lpi, 5 rmp, 6 rpi, 9 ez, 10 join.
  PanMatrixProfile: 1 pmp, 2 pmpi.  Location: 1 row, 2 col.
  Motif: 1 motifs, 2 neighbors (Location).
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------- encoding


def _varint(v: int) -> bytes:
    v &= (1 << 64) - 1  # two's-complement for negative int64 (10-byte form)
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field: int, wire_type: int) -> bytes:
    return _varint((field << 3) | wire_type)


def _f_varint(field: int, v: int) -> bytes:
    return _tag(field, 0) + _varint(int(v)) if v else b""


def _f_bytes(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


def _f_string(field: int, s) -> bytes:
    return _f_bytes(field, s.encode()) if s else b""


def _f_double(field: int, v: float) -> bytes:
    if not v:
        return b""
    return _tag(field, 1) + np.float64(v).tobytes()


def _packed_doubles(field: int, arr: np.ndarray) -> bytes:
    if arr.size == 0:
        return b""
    return _f_bytes(field, np.ascontiguousarray(arr, dtype="<f8").tobytes())


def _packed_varints(field: int, values) -> bytes:
    if len(values) == 0:
        return b""
    return _f_bytes(field, b"".join(_varint(int(v)) for v in values))


def _matrix_attrs(matrix):
    """rows/cols/flat per the reference's layout convention: 1-D arrays
    store cols=0 and reshape only when cols > 0 on read."""
    a = np.asarray(matrix)
    if a.size < 1:
        return None
    rows = a.shape[0]
    cols = a.shape[1] if a.ndim > 1 else 0
    return rows, cols, a.reshape(-1)


def _double_matrix(field: int, matrix) -> bytes:
    attrs = _matrix_attrs(matrix) if matrix is not None else None
    if attrs is None:
        return b""
    rows, cols, flat = attrs
    payload = (_f_varint(1, rows) + _f_varint(2, cols)
               + _packed_doubles(3, flat.astype("d")))
    return _f_bytes(field, payload)


def _int_matrix(field: int, matrix) -> bytes:
    attrs = _matrix_attrs(matrix) if matrix is not None else None
    if attrs is None:
        return b""
    rows, cols, flat = attrs
    payload = (_f_varint(1, rows) + _f_varint(2, cols)
               + _packed_varints(3, flat.astype(np.int64)))
    return _f_bytes(field, payload)


def _location(field: int, loc) -> bytes:
    if np.ndim(loc) > 0:
        row, col = int(loc[0]), int(loc[1])
    else:
        row, col = int(loc), 0
    return _f_bytes(field, _f_varint(1, row) + _f_varint(2, col))


def _motif(field: int, motif: dict) -> bytes:
    payload = b"".join(_location(1, m) for m in motif.get("motifs", []))
    payload += b"".join(_location(2, m) for m in motif.get("neighbors", []))
    return _f_bytes(field, payload)


def to_mpf(profile: dict) -> bytes:
    """Profile dict (MatrixProfile or PMP) -> binary MPFOutput message.

    Deliberate superset of the reference writer: the reference's
    protobuf_utils guards matrix fields with ``if rows and cols`` and so
    silently DROPS 1-D arrays (query, lmp/lpi/rmp/rpi — their normal
    shape); this writer persists them (cols=0 convention, see
    :func:`_matrix_attrs`) so our own round-trip is lossless.  Archives
    are therefore not byte-identical to reference-written ones, but both
    writers' outputs decode correctly in both readers."""
    klass = profile.get("class")
    out = [
        _f_string(1, profile.get("class")),
        _f_string(2, profile.get("algorithm")),
        _f_string(3, profile.get("metric")),
        _f_double(4, profile.get("sample_pct") or 0.0),
    ]
    windows = ([profile.get("w")] if klass == "MatrixProfile"
               else list(profile.get("windows", [])))
    out.append(_packed_varints(5, windows))
    data = profile.get("data") or {}
    if data.get("ts") is not None:
        out.append(_double_matrix(6, data["ts"]))
    if data.get("query") is not None:
        out.append(_double_matrix(7, data["query"]))

    if klass == "MatrixProfile":
        mp_payload = (
            _double_matrix(1, profile.get("mp"))
            + _int_matrix(2, profile.get("pi"))
            + _double_matrix(3, profile.get("lmp"))
            + _int_matrix(4, profile.get("lpi"))
            + _double_matrix(5, profile.get("rmp"))
            + _int_matrix(6, profile.get("rpi"))
            + _f_varint(9, profile.get("ez") or 0)
            + _f_varint(10, 1 if profile.get("join") else 0))
        out.append(_f_bytes(8, mp_payload))
    elif klass == "PMP":
        pmp_payload = (_double_matrix(1, profile.get("pmp"))
                       + _int_matrix(2, profile.get("pmpi")))
        out.append(_f_bytes(9, pmp_payload))
    else:
        raise ValueError("Expecting Pan-MatrixProfile or MatrixProfile!")

    for motif in profile.get("motifs") or []:
        out.append(_motif(10, motif))
    for discord in profile.get("discords") if profile.get("discords") is not None else []:
        out.append(_location(11, discord))
    if profile.get("cmp") is not None:
        out.append(_double_matrix(12, profile["cmp"]))
    if profile.get("av") is not None:
        out.append(_double_matrix(13, profile["av"]))
    out.append(_f_string(14, profile.get("av_type") or ""))
    return b"".join(out)


# ---------------------------------------------------------------- decoding


def _read_varint(buf: bytes, pos: int):
    shift = 0
    v = 0
    while True:
        b = buf[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, pos
        shift += 7


def _iter_fields(buf: bytes):
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field, wt = tag >> 3, tag & 7
        if wt == 0:
            v, pos = _read_varint(buf, pos)
        elif wt == 1:
            v = buf[pos : pos + 8]
            pos += 8
        elif wt == 2:
            ln, pos = _read_varint(buf, pos)
            v = buf[pos : pos + ln]
            pos += ln
        elif wt == 5:
            v = buf[pos : pos + 4]
            pos += 4
        else:  # groups (3/4) never appear in proto3
            raise ValueError(f"unsupported wire type {wt}")
        yield field, wt, v


def _decode_packed_varints(payload: bytes, signed: bool) -> np.ndarray:
    vals = []
    pos = 0
    while pos < len(payload):
        v, pos = _read_varint(payload, pos)
        if signed and v >= 1 << 63:
            v -= 1 << 64
        vals.append(v)
    return np.array(vals, dtype=np.int64)


def _decode_matrix(payload: bytes, signed: bool):
    rows = cols = 0
    data = None
    for field, wt, v in _iter_fields(payload):
        if field == 1:
            rows = v
        elif field == 2:
            cols = v
        elif field == 3:
            if wt == 2:
                if signed:
                    chunk = _decode_packed_varints(v, signed=True)
                else:
                    chunk = np.frombuffer(v, dtype="<f8").copy()
                # a conforming writer may split one packed repeated field
                # across several length-delimited chunks — append, never
                # replace
                data = chunk if data is None else np.concatenate([data, chunk])
            else:  # non-packed single element (proto2-style writers)
                if signed:
                    iv = v - (1 << 64) if v >= 1 << 63 else v
                    extra = np.array([iv], dtype=np.int64)
                else:
                    extra = np.frombuffer(v, dtype="<f8")
                data = extra if data is None else np.concatenate([data, extra])
    if data is None or len(data) < 1:
        return None
    out = np.asarray(data)
    if cols > 0:
        out = out.reshape(rows, cols)
    return out


def _decode_location(payload: bytes):
    row = col = 0
    for field, _wt, v in _iter_fields(payload):
        if field == 1:
            row = v
        elif field == 2:
            col = v
    return row, col


def _decode_motif(payload: bytes):
    out = {"motifs": [], "neighbors": []}
    for field, _wt, v in _iter_fields(payload):
        if field == 1:
            out["motifs"].append(_decode_location(v))
        elif field == 2:
            out["neighbors"].append(_decode_location(v))
    return out


def from_mpf(buf: bytes) -> dict:
    """Binary MPFOutput message -> profile dict (reference key layout)."""
    out = {"class": "", "algorithm": "", "metric": "", "sample_pct": 0.0,
           "data": {"ts": None, "query": None}}
    windows: list = []
    mp_msg = pmp_msg = None
    motifs: list = []
    discords: list = []
    ts_b = query_b = cmp_b = av_b = None
    av_type = ""
    for field, wt, v in _iter_fields(buf):
        if field == 1:
            out["class"] = v.decode()
        elif field == 2:
            out["algorithm"] = v.decode()
        elif field == 3:
            out["metric"] = v.decode()
        elif field == 4:
            out["sample_pct"] = float(np.frombuffer(v, "<f8")[0])
        elif field == 5:
            if wt == 2:
                windows.extend(_decode_packed_varints(v, signed=False))
            else:
                windows.append(v)
        # embedded-message fields (6-9, 12, 13): proto3 MERGE semantics —
        # a conforming writer may emit the same submessage as several
        # records (e.g. mp matrix in one, pi/ez in another), and the
        # standard merge is "parse the concatenation"; replacing would
        # silently drop every record but the last
        elif field == 6:
            ts_b = (ts_b or b"") + v
        elif field == 7:
            query_b = (query_b or b"") + v
        elif field == 8:
            mp_msg = (mp_msg or b"") + v
        elif field == 9:
            pmp_msg = (pmp_msg or b"") + v
        elif field == 10:
            motifs.append(_decode_motif(v))
        elif field == 11:
            discords.append(_decode_location(v))
        elif field == 12:
            cmp_b = (cmp_b or b"") + v
        elif field == 13:
            av_b = (av_b or b"") + v
        elif field == 14:
            av_type = v.decode()
    if ts_b is not None:
        out["data"]["ts"] = _decode_matrix(ts_b, signed=False)
    if query_b is not None:
        out["data"]["query"] = _decode_matrix(query_b, signed=False)
    cmp_ = None if cmp_b is None else _decode_matrix(cmp_b, signed=False)
    av = None if av_b is None else _decode_matrix(av_b, signed=False)

    is_one_dimensional = False
    if out["class"] == "MatrixProfile":
        sub = {"mp": None, "pi": None, "lmp": None, "lpi": None,
               "rmp": None, "rpi": None, "ez": 0, "join": False}
        # inner embedded Matrix fields follow the same proto3 MERGE rule as
        # the top-level ones: accumulate bytes per field number, decode the
        # concatenation once after the loop (last-wins would drop records)
        mat_b = {1: None, 2: None, 3: None, 4: None, 5: None, 6: None}
        for field, _wt, v in _iter_fields(mp_msg or b""):
            if field in mat_b:
                mat_b[field] = (mat_b[field] or b"") + v
            elif field == 9:
                sub["ez"] = v
            elif field == 10:
                sub["join"] = bool(v)
        for field, key, signed in ((1, "mp", False), (2, "pi", True),
                                   (3, "lmp", False), (4, "lpi", True),
                                   (5, "rmp", False), (6, "rpi", True)):
            if mat_b[field] is not None:
                sub[key] = _decode_matrix(mat_b[field], signed=signed)
        out.update(sub)
        out["w"] = int(windows[0]) if windows else 0
        is_one_dimensional = out["mp"] is not None and out["mp"].ndim == 1
    elif out["class"] == "PMP":
        out["pmp"] = out["pmpi"] = None
        pmp_b = {1: None, 2: None}
        for field, _wt, v in _iter_fields(pmp_msg or b""):
            if field in pmp_b:
                pmp_b[field] = (pmp_b[field] or b"") + v
        if pmp_b[1] is not None:
            out["pmp"] = _decode_matrix(pmp_b[1], signed=False)
        if pmp_b[2] is not None:
            out["pmpi"] = _decode_matrix(pmp_b[2], signed=True)
        out["windows"] = np.array(windows, dtype=np.int64)

    if discords:
        if is_one_dimensional:
            out["discords"] = np.array([r for r, _c in discords], dtype=int)
        else:
            out["discords"] = np.array(discords, dtype=int)
    if motifs:
        if is_one_dimensional:
            motifs = [{"motifs": [r for r, _c in m["motifs"]],
                       "neighbors": [r for r, _c in m["neighbors"]]}
                      for m in motifs]
        out["motifs"] = motifs
    if cmp_ is not None:
        out["cmp"] = cmp_
    if av is not None:
        out["av"] = av
    if av_type:
        out["av_type"] = av_type
    return out


def to_disk_mpf(profile: dict, path: str) -> None:
    with open(path, "wb") as f:
        f.write(to_mpf(profile))


def from_disk_mpf(path: str) -> dict:
    with open(path, "rb") as f:
        return from_mpf(f.read())
