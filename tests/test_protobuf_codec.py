"""Protobuf codec contract tests (logstash-codec-protobuf parity).

Golden messages are HAND-ENCODED here from the public wire-format spec
(varint / zigzag / fixed / length-delimited / packed), so the decoder
is differential-tested against an independent encoder. The
google.protobuf library path is contract-shaped and gated — the decode
test for it skips when the wheel is absent (this sandbox), while the
gate's error message is asserted unconditionally.
"""

from __future__ import annotations

import struct

import pytest

from logstash_spark.protobuf_codec import (
    decode_message,
    decode_with_lib,
    read_protobuf,
    spark_ddl,
    split_delimited,
)


def vint(v: int) -> bytes:
    if v < 0:
        v += 1 << 64
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def zz(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v < 0 else v << 1


def tag(fnum: int, wt: int) -> bytes:
    return vint((fnum << 3) | wt)


def ld(fnum: int, payload: bytes) -> bytes:
    return tag(fnum, 2) + vint(len(payload)) + payload


SCHEMA = {
    1: ("name", "string"),
    2: ("id", "int64"),
    3: ("score", "double"),
    4: ("flags", ("repeated", "int32")),
    5: ("delta", "sint64"),
    6: ("ok", "bool"),
    7: ("message", "loc", {1: ("lat", "float"), 2: ("lon", "float")}),
    8: ("blob", "bytes"),
    9: ("repeated_message", "hits", {1: ("term", "string")}),
}


def encode_sample() -> bytes:
    return (
        ld(1, "café".encode())
        + tag(2, 0) + vint(-7)                      # negative int64, 10-byte
        + tag(3, 1) + struct.pack("<d", 2.5)
        + ld(4, vint(3) + vint(300) + vint(1))      # packed repeated int32
        + tag(5, 0) + vint(zz(-33))                 # zigzag sint64
        + tag(6, 0) + vint(1)
        + ld(7, tag(1, 5) + struct.pack("<f", 1.5)
              + tag(2, 5) + struct.pack("<f", -2.0))
        + ld(8, b"\x00\x01\xff")
        + ld(9, ld(1, b"alpha")) + ld(9, ld(1, b"beta"))
        + ld(99, b"unknown-skipped")                # unknown field: skipped
        + tag(98, 0) + vint(12345)                  # unknown varint: skipped
    )


def test_decode_message_golden():
    d = decode_message(encode_sample(), SCHEMA)
    assert d["name"] == "café"
    assert d["id"] == -7
    assert d["score"] == 2.5
    assert d["flags"] == [3, 300, 1]
    assert d["delta"] == -33
    assert d["ok"] is True
    assert d["loc"]["lat"] == 1.5 and d["loc"]["lon"] == -2.0
    assert d["blob"] == b"\x00\x01\xff"
    assert [h["term"] for h in d["hits"]] == ["alpha", "beta"]


def test_decode_defaults_and_unpacked_repeated():
    # empty message: scalars None, repeated []
    d = decode_message(b"", SCHEMA)
    assert d["name"] is None and d["flags"] == [] and d["hits"] == []
    # proto2-style UNpacked repeated varints also accumulate
    d2 = decode_message(tag(4, 0) + vint(9) + tag(4, 0) + vint(8), SCHEMA)
    assert d2["flags"] == [9, 8]


def test_truncated_and_bad_wiretype():
    with pytest.raises(ValueError, match="truncated"):
        decode_message(tag(3, 1) + b"\x00\x00", SCHEMA)
    with pytest.raises(ValueError, match="truncated varint"):
        decode_message(tag(2, 0) + b"\xff", SCHEMA)
    with pytest.raises(ValueError, match="wire type is 2"):
        decode_message(ld(2, b"xx"), SCHEMA)


def test_split_delimited():
    msgs = [b"abc", b"", b"x" * 200]
    stream = b"".join(vint(len(m)) + m for m in msgs)
    assert split_delimited(stream) == msgs
    with pytest.raises(ValueError, match="truncated delimited"):
        split_delimited(vint(10) + b"short")


def test_spark_ddl_shape():
    assert spark_ddl(SCHEMA) == (
        "name string, id long, score double, flags array<long>, "
        "delta long, ok boolean, loc struct<lat double, lon double>, "
        "blob binary, hits array<struct<term string>>"
    )


def test_read_protobuf_spark(spark, tmp_path):
    """binaryFile → mapInPandas decode: one-message-per-file AND a
    writeDelimitedTo stream; corrupt file → error row, not an abort."""
    one = tmp_path / "single"
    one.mkdir()
    (one / "a.pb").write_bytes(encode_sample())
    (one / "bad.pb").write_bytes(b"\xff\xff\xff\xff\xff\xff\xff\xff\xff\xff\xff")
    df = read_protobuf(spark, str(one), SCHEMA)
    rows = df.collect()
    good = [r for r in rows if r.error is None]
    bad = [r for r in rows if r.error is not None]
    assert len(good) == 1 and len(bad) == 1
    assert good[0].name == "café" and good[0].loc.lat == 1.5
    assert list(good[0].flags) == [3, 300, 1]

    multi = tmp_path / "stream"
    multi.mkdir()
    stream = b"".join(
        vint(len(m)) + m for m in (encode_sample(), encode_sample())
    )
    (multi / "s.pb").write_bytes(stream)
    df2 = read_protobuf(spark, str(multi), SCHEMA, delimited=True)
    assert df2.count() == 2
    assert [r.id for r in df2.collect()] == [-7, -7]


def test_sources_dispatch(spark, tmp_path):
    from logstash_spark.sources import SourceError, resolve_input

    d = tmp_path / "pb"
    d.mkdir()
    (d / "a.pb").write_bytes(encode_sample())
    df = resolve_input(spark, "file", {
        "path": str(d), "codec": "protobuf", "wire_schema": SCHEMA})
    assert df.collect()[0].name == "café"
    with pytest.raises(SourceError, match="wire_schema"):
        resolve_input(spark, "file", {"path": str(d), "codec": "protobuf"})


def test_class_name_mode_gate():
    """decode_with_lib either works (wheel present) or raises the
    documented gate message — never an opaque ModuleNotFoundError."""
    try:
        import google.protobuf  # noqa: F401
        pytest.skip("protobuf wheel present; gate not reachable")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="wire_schema mode"):
        decode_with_lib([b""], "x.Y", b"")


def test_uint64_fixed64_high_bit_reinterpreted_as_signed_long():
    """A valid uint64/fixed64 >= 2^63 must land in the Spark long column
    as its two's-complement reinterpretation (spark-protobuf mapping) —
    an unbounded Python int would abort the task at the Arrow boundary,
    outside the per-payload error-row try."""
    schema = {1: ("h", "uint64"), 2: ("f", "fixed64"),
              3: ("pf", ("repeated", "fixed64"))}
    data = (
        tag(1, 0) + vint(1 << 63)
        + tag(2, 1) + struct.pack("<Q", (1 << 64) - 2)
        + ld(3, struct.pack("<Q", 1 << 63))       # packed repeated
    )
    d = decode_message(data, schema)
    assert d["h"] == -(1 << 63)
    assert d["f"] == -2
    assert d["pf"] == [-(1 << 63)]


def test_overlong_varint_raises_for_error_row():
    """A varint carrying more than 64 bits is corrupt per the wire spec
    (a valid 10th byte is <= 0x01). It must raise inside the per-payload
    try — a ~2^70 Python int would otherwise overflow the Arrow int64
    column at batch serialization and abort the task."""
    schema = {1: ("h", "uint64")}
    # 10 bytes with a large final byte → ~2^70
    with pytest.raises(ValueError, match="exceeds 64 bits"):
        decode_message(tag(1, 0) + b"\xff" * 9 + b"\x7f", schema)
    # 11+ continuation bytes → malformed length
    with pytest.raises(ValueError, match="varint too long"):
        decode_message(tag(1, 0) + b"\xff" * 11 + b"\x01", schema)
    # the boundary stays valid: uint64 max is exactly 10 bytes, 10th 0x01
    d = decode_message(tag(1, 0) + b"\xff" * 9 + b"\x01", schema)
    assert d["h"] == -1  # 2^64-1 reinterpreted as signed long


def test_wire_type_mismatch_raises_for_error_row():
    """A varint arriving for a declared string field (etc.) must raise —
    silently storing an int in a string column poisons the Arrow batch
    later, killing the task instead of yielding one error row."""
    with pytest.raises(ValueError, match="wire type is 0"):
        decode_message(tag(1, 0) + vint(5), {1: ("name", "string")})
    with pytest.raises(ValueError, match="wire type is 1"):
        decode_message(tag(1, 1) + struct.pack("<Q", 1),
                       {1: ("name", "string")})
    with pytest.raises(ValueError, match="wire type is 5"):
        decode_message(tag(1, 5) + struct.pack("<I", 1),
                       {1: ("id", "int64")})
