"""Binary .mpf round-trip (reference tests/test_io.py:73-123 MPF cases,
re-expressed) plus wire-level cross-validation against the reference's
generated protobuf bindings when available."""

import numpy as np
import pytest

from matrixprofile_1_ray.io import from_disk_mpf, from_mpf, to_disk_mpf, to_mpf
from matrixprofile_1_ray.kernels import mpx, skimp

def _build_pb_classes():
    """Recreate the MPFOutput schema dynamically with google.protobuf
    (the reference's checked-in pb2 predates protobuf 4+ and no longer
    imports) — Google's own serializer then cross-validates our wire
    codec."""
    from google.protobuf import descriptor_pb2, descriptor_pool, message_factory

    fd = descriptor_pb2.FileDescriptorProto()
    fd.name = "mpf_test_schema.proto"
    fd.package = "mpftest"
    fd.syntax = "proto3"
    F = descriptor_pb2.FieldDescriptorProto

    def msg(name):
        m = fd.message_type.add()
        m.name = name
        return m

    def add(m, name, num, ftype, label=F.LABEL_OPTIONAL, type_name=None,
            packed=False):
        f = m.field.add()
        f.name = name
        f.number = num
        f.type = ftype
        f.label = label
        if type_name:
            f.type_name = f".mpftest.{type_name}"
        if packed:
            f.options.packed = True

    dm = msg("DoubleMatrix")
    add(dm, "rows", 1, F.TYPE_UINT64)
    add(dm, "cols", 2, F.TYPE_UINT64)
    add(dm, "data", 3, F.TYPE_DOUBLE, F.LABEL_REPEATED, packed=True)
    im = msg("IntMatrix")
    add(im, "rows", 1, F.TYPE_UINT64)
    add(im, "cols", 2, F.TYPE_UINT64)
    add(im, "data", 3, F.TYPE_INT64, F.LABEL_REPEATED, packed=True)
    loc = msg("Location")
    add(loc, "row", 1, F.TYPE_UINT64)
    add(loc, "col", 2, F.TYPE_UINT64)
    mo = msg("Motif")
    add(mo, "motifs", 1, F.TYPE_MESSAGE, F.LABEL_REPEATED, "Location")
    add(mo, "neighbors", 2, F.TYPE_MESSAGE, F.LABEL_REPEATED, "Location")
    mp_m = msg("MatrixProfile")
    add(mp_m, "mp", 1, F.TYPE_MESSAGE, type_name="DoubleMatrix")
    add(mp_m, "pi", 2, F.TYPE_MESSAGE, type_name="IntMatrix")
    add(mp_m, "lmp", 3, F.TYPE_MESSAGE, type_name="DoubleMatrix")
    add(mp_m, "lpi", 4, F.TYPE_MESSAGE, type_name="IntMatrix")
    add(mp_m, "rmp", 5, F.TYPE_MESSAGE, type_name="DoubleMatrix")
    add(mp_m, "rpi", 6, F.TYPE_MESSAGE, type_name="IntMatrix")
    add(mp_m, "ez", 9, F.TYPE_UINT64)
    add(mp_m, "join", 10, F.TYPE_BOOL)
    pmp_m = msg("PanMatrixProfile")
    add(pmp_m, "pmp", 1, F.TYPE_MESSAGE, type_name="DoubleMatrix")
    add(pmp_m, "pmpi", 2, F.TYPE_MESSAGE, type_name="IntMatrix")
    out = msg("MPFOutput")
    add(out, "klass", 1, F.TYPE_STRING)
    add(out, "algorithm", 2, F.TYPE_STRING)
    add(out, "metric", 3, F.TYPE_STRING)
    add(out, "sample_pct", 4, F.TYPE_DOUBLE)
    add(out, "windows", 5, F.TYPE_UINT64, F.LABEL_REPEATED, packed=True)
    add(out, "ts", 6, F.TYPE_MESSAGE, type_name="DoubleMatrix")
    add(out, "query", 7, F.TYPE_MESSAGE, type_name="DoubleMatrix")
    add(out, "mp", 8, F.TYPE_MESSAGE, type_name="MatrixProfile")
    add(out, "pmp", 9, F.TYPE_MESSAGE, type_name="PanMatrixProfile")
    add(out, "motifs", 10, F.TYPE_MESSAGE, F.LABEL_REPEATED, "Motif")
    add(out, "discords", 11, F.TYPE_MESSAGE, F.LABEL_REPEATED, "Location")
    add(out, "cmp", 12, F.TYPE_MESSAGE, type_name="DoubleMatrix")
    add(out, "av", 13, F.TYPE_MESSAGE, type_name="DoubleMatrix")
    add(out, "av_type", 14, F.TYPE_STRING)

    pool = descriptor_pool.DescriptorPool()
    pool.Add(fd)
    desc = pool.FindMessageTypeByName("mpftest.MPFOutput")
    return message_factory.GetMessageClass(desc)


def _assert_profile_equal(a: dict, b: dict, keys):
    for k in keys:
        va, vb = a.get(k), b.get(k)
        if isinstance(va, np.ndarray) or isinstance(vb, np.ndarray):
            np.testing.assert_equal(np.asarray(va), np.asarray(vb), err_msg=k)
        elif va is not None and vb is not None:
            assert va == vb, k


def test_mpf_roundtrip_matrix_profile(tmp_path):
    rng = np.random.default_rng(4)
    ts = rng.uniform(size=1024)
    profile = mpx(ts, 32)
    path = str(tmp_path / "mp.mpf")
    to_disk_mpf(profile, path)
    back = from_disk_mpf(path)

    _assert_profile_equal(profile, back,
                          ["class", "algorithm", "metric", "sample_pct",
                           "w", "ez", "join", "mp", "pi"])
    np.testing.assert_equal(profile["data"]["ts"], back["data"]["ts"])
    assert back["data"]["query"] is None
    assert back["lmp"] is None and back["rpi"] is None


def test_mpf_roundtrip_join_profile(tmp_path):
    rng = np.random.default_rng(5)
    ts = rng.uniform(size=512)
    q = rng.uniform(size=128)
    profile = mpx(ts, 32, query=q)
    buf = to_mpf(profile)
    back = from_mpf(buf)
    assert back["join"] is True
    np.testing.assert_equal(profile["mp"], back["mp"])
    np.testing.assert_equal(profile["data"]["query"], back["data"]["query"])


def test_mpf_roundtrip_pmp(tmp_path):
    rng = np.random.default_rng(6)
    ts = rng.uniform(size=512)
    profile = skimp(ts, windows=[16, 32, 64])
    back = from_mpf(to_mpf(profile))
    assert back["class"] == "PMP"
    np.testing.assert_equal(profile["pmp"], back["pmp"])
    np.testing.assert_equal(profile["pmpi"], back["pmpi"])
    np.testing.assert_equal(np.asarray(profile["windows"]), back["windows"])


def test_mpf_roundtrip_motifs_discords_av():
    rng = np.random.default_rng(7)
    ts = rng.uniform(size=400)
    profile = mpx(ts, 16)
    profile["discords"] = np.array([5, 90, 200])
    profile["motifs"] = [{"motifs": [3, 77], "neighbors": [120, 130]},
                         {"motifs": [9, 50], "neighbors": []}]
    profile["av"] = np.ones(len(profile["mp"]))
    profile["av_type"] = "complexity"
    profile["cmp"] = profile["mp"] * 1.0
    back = from_mpf(to_mpf(profile))
    np.testing.assert_equal(back["discords"], profile["discords"])
    assert back["motifs"] == [{"motifs": [3, 77], "neighbors": [120, 130]},
                              {"motifs": [9, 50], "neighbors": []}]
    np.testing.assert_equal(back["av"], profile["av"])
    np.testing.assert_equal(back["cmp"], profile["cmp"])
    assert back["av_type"] == "complexity"


def test_av_io_mpf_roundtrip():
    """Corrected-profile artifacts survive the binary format (reference
    tests/test_annotation_vector.py:54-81 test_av_io_MPF, re-expressed)."""
    from matrixprofile_1_ray.kernels.transform import apply_av

    rng = np.random.default_rng(10)
    ts = rng.uniform(size=512)
    profile = apply_av(mpx(ts, 32), "default")
    back = from_mpf(to_mpf(profile))
    np.testing.assert_equal(back["av"], profile["av"])
    np.testing.assert_equal(back["cmp"], profile["cmp"])
    assert back["av_type"] == profile["av_type"] == "default"
    np.testing.assert_equal(back["mp"], profile["mp"])


def test_mpf_unpacked_negative_int64():
    """proto2-style writers emit repeated int64 UNPACKED; negative values
    (pi = -1 unmatched, INT64_MIN pmpi quirk) must decode via two's
    complement, not overflow."""
    from matrixprofile_1_ray.io.mpf import _f_varint, _f_bytes, _varint, _tag

    # hand-build an IntMatrix with unpacked data: rows=3, three elements
    vals = [-1, 5, -(1 << 63)]
    payload = _f_varint(1, 3)
    for v in vals:
        payload += _tag(3, 0) + _varint(v)
    mp_msg = _f_bytes(2, payload)  # field 2 = pi inside MatrixProfile
    buf = (_f_bytes(1, b"MatrixProfile")  # klass
           + _f_bytes(8, mp_msg))         # mp envelope
    out = from_mpf(buf)
    assert out["pi"].tolist() == vals


def test_mpf_wire_compatible_with_protobuf():
    """Bytes we write parse with Google's protobuf against the reference
    schema, and bytes protobuf writes load through our decoder — true
    archive compatibility with reference-written .mpf files."""
    pytest.importorskip("google.protobuf")
    MPFOutput = _build_pb_classes()
    rng = np.random.default_rng(8)
    ts = rng.uniform(size=256)
    profile = mpx(ts, 16)
    profile["discords"] = np.array([1, 2])

    # ours -> protobuf parser
    msg = MPFOutput()
    msg.ParseFromString(to_mpf(profile))
    assert msg.klass == "MatrixProfile"
    assert msg.algorithm == "mpx"
    assert list(msg.windows) == [16]
    np.testing.assert_allclose(np.array(msg.mp.mp.data), profile["mp"])
    np.testing.assert_equal(np.array(msg.mp.pi.data), profile["pi"])
    np.testing.assert_allclose(np.array(msg.ts.data), ts)
    assert [d.row for d in msg.discords] == [1, 2]

    # protobuf writer -> our parser
    out = MPFOutput()
    out.klass = "MatrixProfile"
    out.algorithm = "mpx"
    out.metric = "euclidean"
    out.sample_pct = 1.0
    out.windows.extend([16])
    out.ts.rows = len(ts)
    out.ts.cols = 0
    out.ts.data.extend(ts)
    out.mp.ez = 4
    out.mp.join = False
    out.mp.mp.rows = len(profile["mp"])
    out.mp.mp.cols = 0
    out.mp.mp.data.extend(profile["mp"])
    out.mp.pi.rows = len(profile["pi"])
    out.mp.pi.cols = 0
    out.mp.pi.data.extend(profile["pi"])
    back = from_mpf(out.SerializeToString())
    assert back["class"] == "MatrixProfile" and back["w"] == 16
    assert back["ez"] == 4
    np.testing.assert_allclose(back["mp"], profile["mp"])
    np.testing.assert_equal(back["pi"], profile["pi"])
    np.testing.assert_allclose(back["data"]["ts"], ts)


def test_from_disk_bare_path_roundtrips_both_formats(tmp_path):
    """to_disk appends the extension; from_disk with the same bare path
    must find the file for BOTH formats (the fallback used to try only
    .json, breaking the symmetric mpf round-trip)."""
    from matrixprofile_1_ray.io.json_io import from_disk, to_disk

    prof = {"class": "MatrixProfile", "algorithm": "mpx",
            "metric": "euclidean", "sample_pct": 1.0, "w": 4,
            "ez": 1, "join": False,
            "mp": np.array([1.0, 2.0]), "pi": np.array([1, 0]),
            "lmp": None, "lpi": None, "rmp": None, "rpi": None,
            "data": {"ts": np.arange(8, dtype="d"), "query": None}}
    for fmt in ("json", "mpf"):
        bare = str(tmp_path / f"prof_{fmt}")
        to_disk(prof, bare, format=fmt)
        back = from_disk(bare)
        np.testing.assert_array_equal(back["mp"], prof["mp"])
    with pytest.raises(ValueError, match="format must be"):
        from_disk(str(tmp_path / "prof_json.json"), format="parquet")


def test_from_mpf_merges_split_submessages():
    """proto3 merge semantics: a writer may emit the same embedded
    message as several records; parsers must treat them as the
    concatenation, not keep only the last."""
    from matrixprofile_1_ray.io.mpf import (
        _f_bytes,
        _iter_fields,
        from_mpf,
        to_mpf,
    )

    prof = {"class": "MatrixProfile", "algorithm": "mpx",
            "metric": "euclidean", "sample_pct": 1.0, "w": 4,
            "ez": 1, "join": False,
            "mp": np.array([1.0, 2.0]), "pi": np.array([1, 0]),
            "lmp": None, "lpi": None, "rmp": None, "rpi": None,
            "data": {"ts": np.arange(8, dtype="d"), "query": None}}
    buf = to_mpf(prof)
    # rebuild the top-level message, splitting the field-8 (MP
    # submessage) record into two consecutive field-8 records at an
    # inner record boundary
    rebuilt = b""
    for field, wt, v in _iter_fields(buf):
        if field == 8:
            inner = list(_iter_fields(v))
            assert len(inner) >= 2
            # locate the byte boundary after the first inner record by
            # probing prefixes until exactly one record parses cleanly
            first_len = None
            for cut in range(1, len(v)):
                try:
                    got = list(_iter_fields(v[:cut]))
                except Exception:
                    continue
                if len(got) == 1 and got[0][0] == inner[0][0] and \
                        got[0][2] == inner[0][2]:
                    first_len = cut
                    break
            assert first_len is not None
            rebuilt += _f_bytes(8, v[:first_len])
            rebuilt += _f_bytes(8, v[first_len:])
        elif wt == 2:
            rebuilt += _f_bytes(field, v)
        elif wt == 1:  # fixed64: v is the raw 8 bytes
            from matrixprofile_1_ray.io.mpf import _tag
            rebuilt += _tag(field, 1) + v
        else:          # varint
            from matrixprofile_1_ray.io.mpf import _f_varint
            rebuilt += _f_varint(field, int(v))
    back = from_mpf(rebuilt)
    np.testing.assert_array_equal(back["mp"], prof["mp"])
    np.testing.assert_array_equal(back["pi"], prof["pi"])


def test_from_mpf_merges_split_inner_matrix_fields():
    """Nested proto3 merge: a writer may emit MatrixProfile.mp (inner
    field 1) as TWO Matrix records inside the field-8 submessage stream;
    the parser must decode the concatenation, not keep only the last."""
    from matrixprofile_1_ray.io.mpf import _f_bytes, _f_varint, from_mpf

    # Matrix record A: rows=4, field-3 packed doubles [1.0, 2.0]
    mat_a = _f_varint(1, 4) + _f_bytes(3, np.array([1.0, 2.0]).tobytes())
    # Matrix record B: remaining packed doubles [3.0, 4.0]
    mat_b = _f_bytes(3, np.array([3.0, 4.0]).tobytes())
    # pi as one record (zigzag-free unsigned varints are what the
    # engine's packed-signed decoder expects for small non-negatives)
    pi = _f_varint(1, 4) + _f_bytes(3, b"\x01\x00\x03\x02")
    mp_sub = _f_bytes(1, mat_a) + _f_bytes(1, mat_b) + _f_bytes(2, pi) \
        + _f_varint(9, 1)
    buf = (_f_bytes(1, b"MatrixProfile") + _f_bytes(2, b"mpx")
           + _f_bytes(3, b"euclidean") + _f_varint(5, 4)
           + _f_bytes(8, mp_sub))
    back = from_mpf(buf)
    np.testing.assert_array_equal(back["mp"], [1.0, 2.0, 3.0, 4.0])
    np.testing.assert_array_equal(back["pi"], [1, 0, 3, 2])


def test_from_mpf_merges_split_inner_pmp_fields():
    """Same nested-merge rule for PMP.pmp (inner field 1)."""
    from matrixprofile_1_ray.io.mpf import _f_bytes, _f_varint, from_mpf

    mat_a = _f_varint(1, 2) + _f_varint(2, 2) \
        + _f_bytes(3, np.array([1.0, 2.0]).tobytes())
    mat_b = _f_bytes(3, np.array([3.0, 4.0]).tobytes())
    pmp_sub = _f_bytes(1, mat_a) + _f_bytes(1, mat_b)
    buf = (_f_bytes(1, b"PMP") + _f_bytes(2, b"skimp")
           + _f_bytes(3, b"euclidean") + _f_varint(5, 8) + _f_varint(5, 9)
           + _f_bytes(9, pmp_sub))
    back = from_mpf(buf)
    np.testing.assert_array_equal(back["pmp"], [[1.0, 2.0], [3.0, 4.0]])
