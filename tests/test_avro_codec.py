"""Avro codec fallback decoder (avro_codec.py).

Two independent verification angles:
1. Golden bytes hand-assembled from the public Avro 1.x container spec
   (zigzag varints, deflate blocks, sync markers) — decoder vs spec.
2. Differential vs the JVM REFERENCE implementation (org.apache.avro,
   bundled inside the Spark distribution): files written by
   DataFileWriter must decode bit-for-bit through the full
   `resolve_input(file, codec=avro)` source path.
"""

from __future__ import annotations

import json
import struct
import zlib

import pytest

from logstash_spark.avro_codec import (
    AvroError,
    MAGIC,
    parse_schema,
    read_container,
    spark_ddl,
)
from logstash_spark.sources import resolve_input

# ------------------------------------------------------------ helpers


def _zz(n: int) -> bytes:
    """Zigzag varint encode (spec: 'Primitive Types — long')."""
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _avro_str(s: str) -> bytes:
    b = s.encode()
    return _zz(len(b)) + b


def _container(schema_json: str, encoded_rows: list[bytes], codec: str = "null") -> bytes:
    sync = bytes(range(16))
    meta = (
        _zz(2)
        + _avro_str("avro.schema") + _avro_str(schema_json)
        + _avro_str("avro.codec") + _avro_str(codec)
        + _zz(0)
    )
    body = b"".join(encoded_rows)
    if codec == "deflate":
        comp = zlib.compressobj(6, zlib.DEFLATED, -15)
        body = comp.compress(body) + comp.flush()
    block = _zz(len(encoded_rows)) + _zz(len(body)) + body + sync
    return MAGIC + meta + sync + block


GOLDEN_SCHEMA = json.dumps({
    "type": "record", "name": "ev", "fields": [
        {"name": "msg", "type": "string"},
        {"name": "n", "type": "long"},
        {"name": "ok", "type": "boolean"},
        {"name": "score", "type": "double"},
        {"name": "ratio", "type": "float"},
        {"name": "opt", "type": ["null", "string"]},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
    ],
})


def _golden_row(msg, n, ok, score, ratio, opt, tags) -> bytes:
    enc = _avro_str(msg) + _zz(n) + (b"\x01" if ok else b"\x00")
    enc += struct.pack("<d", score) + struct.pack("<f", ratio)
    enc += (_zz(0) if opt is None else _zz(1) + _avro_str(opt))
    if tags:
        enc += _zz(len(tags)) + b"".join(_avro_str(t) for t in tags)
    enc += _zz(0)
    return enc


# ------------------------------------------------------- spec (golden)


def test_zigzag_spec_vectors():
    # the spec's table: 0→00, -1→01, 1→02, -2→03, 2→04; -64→7f, 64→80 01
    assert _zz(0) == b"\x00" and _zz(-1) == b"\x01" and _zz(1) == b"\x02"
    assert _zz(-64) == b"\x7f" and _zz(64) == b"\x80\x01"


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_golden_container_roundtrip(codec):
    rows_in = [
        ("hello", 42, True, 1.5, 0.25, "x", ["a", "b"]),
        ("wörld", -7, False, -2.25, 8.0, None, []),
        ("big", 1 << 40, True, 0.0, 0.5, "y", ["c"]),
    ]
    raw = _container(
        GOLDEN_SCHEMA, [_golden_row(*r) for r in rows_in], codec=codec
    )
    schema, rows = read_container(raw)
    assert [f["name"] for f in schema["fields"]] == [
        "msg", "n", "ok", "score", "ratio", "opt", "tags"]
    for got, exp in zip(rows, rows_in, strict=True):
        msg, n, ok, score, ratio, opt, tags = exp
        assert got["msg"] == msg and got["n"] == n and got["ok"] is ok
        assert got["score"] == score and abs(got["ratio"] - ratio) < 1e-6
        assert got["opt"] == opt and got["tags"] == tags


def test_corrupt_sync_marker_raises():
    raw = bytearray(_container(GOLDEN_SCHEMA, [_golden_row("a", 1, True, 0.0, 0.0, None, [])]))
    raw[-1] ^= 0xFF
    with pytest.raises(AvroError, match="sync"):
        read_container(bytes(raw))


def test_spark_ddl_mapping():
    ddl = spark_ddl(parse_schema(GOLDEN_SCHEMA))
    assert "`msg` string" in ddl and "`n` bigint" in ddl
    assert "`ratio` float" in ddl and "`opt` string" in ddl
    assert "`tags` array<string>" in ddl


def test_general_union_rejected():
    s = parse_schema(json.dumps({
        "type": "record", "name": "r",
        "fields": [{"name": "u", "type": ["int", "string"]}],
    }))
    with pytest.raises(AvroError, match="union"):
        spark_ddl(s)


# ------------------------------------- differential vs JVM reference

DIFF_SCHEMA = json.dumps({
    "type": "record", "name": "logev", "fields": [
        {"name": "message", "type": "string"},
        {"name": "bytes_sent", "type": "long"},
        {"name": "status", "type": "int"},
        {"name": "latency", "type": "double"},
        {"name": "secure", "type": "boolean"},
        {"name": "payload", "type": "bytes"},
        {"name": "client", "type": ["null", "string"]},
        {"name": "level", "type": {"type": "enum", "name": "lvl",
                                   "symbols": ["DEBUG", "INFO", "ERROR"]}},
        {"name": "sig", "type": {"type": "fixed", "name": "sig8", "size": 8}},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "attrs", "type": {"type": "map", "values": "long"}},
        {"name": "geo", "type": {"type": "record", "name": "geo_t", "fields": [
            {"name": "lat", "type": "double"}, {"name": "lon", "type": "double"}]}},
    ],
})

DIFF_ROWS = [
    dict(message="GET /index", bytes_sent=5 << 33, status=200, latency=0.125,
         secure=True, payload=b"\x00\xffab", client="10.0.0.1", level="INFO",
         sig=b"12345678", tags=["web", "edge"], attrs={"retries": 1 << 34, "hops": 3 << 32},
         geo=dict(lat=52.5, lon=13.4)),
    dict(message="POST /søk", bytes_sent=-1 << 35, status=404, latency=-3.5,
         secure=False, payload=b"", client=None, level="ERROR",
         sig=b"\x00" * 8, tags=[], attrs={},
         geo=dict(lat=-33.9, lon=151.2)),
]


def _jlong(jvm, v):
    return jvm.java.lang.Long.parseLong(str(v))


def _to_java(jvm, field_schema, v):
    t = field_schema.getType().getName()
    if t == "union":
        if v is None:
            return None
        for b in field_schema.getTypes():
            if b.getType().getName() != "null":
                return _to_java(jvm, b, v)
    if t == "long":
        return _jlong(jvm, v)
    if t == "bytes":
        return jvm.java.nio.ByteBuffer.wrap(bytearray(v))
    if t == "enum":
        return jvm.org.apache.avro.generic.GenericData.EnumSymbol(field_schema, v)
    if t == "fixed":
        return jvm.org.apache.avro.generic.GenericData.Fixed(
            field_schema, bytearray(v))
    if t == "array":
        lst = jvm.java.util.ArrayList()
        for x in v:
            lst.add(_to_java(jvm, field_schema.getElementType(), x))
        return lst
    if t == "map":
        m = jvm.java.util.HashMap()
        for k, x in v.items():
            m.put(k, _to_java(jvm, field_schema.getValueType(), x))
        return m
    if t == "record":
        rec = jvm.org.apache.avro.generic.GenericData.Record(field_schema)
        for f in field_schema.getFields():
            rec.put(f.name(), _to_java(jvm, f.schema(), v[f.name()]))
        return rec
    return v  # string/int/double/boolean: py4j converts natively


def _jvm_write_avro(spark, path, schema_json, rows, deflate=False):
    jvm = spark._jvm
    schema = jvm.org.apache.avro.Schema.Parser().parse(schema_json)
    writer = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(schema))
    if deflate:
        writer.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    writer.create(schema, jvm.java.io.File(path))
    for row in rows:
        rec = jvm.org.apache.avro.generic.GenericData.Record(schema)
        for f in schema.getFields():
            rec.put(f.name(), _to_java(jvm, f.schema(), row[f.name()]))
        writer.append(rec)
    writer.close()


@pytest.mark.parametrize("deflate", [False, True])
def test_differential_vs_jvm_reference(spark, tmp_path, deflate):
    d = tmp_path / "avro_in"
    d.mkdir()
    _jvm_write_avro(spark, str(d / "part-0.avro"), DIFF_SCHEMA, DIFF_ROWS,
                    deflate=deflate)
    df = resolve_input(spark, "file", {"path": str(d), "codec": "avro"})
    got = {r["message"]: r.asDict(recursive=True)
           for r in df.collect()}
    assert len(got) == len(DIFF_ROWS)
    for exp in DIFF_ROWS:
        g = got[exp["message"]]
        for k, v in exp.items():
            if k == "payload" or k == "sig":
                assert bytes(g[k]) == v, k
            elif k == "geo":
                assert g[k] == v, k
            else:
                assert g[k] == v, k


def test_schema_evolution_missing_field_null(spark, tmp_path):
    """Rolled log files with drifting writer schemas: each file decodes
    with its OWN embedded schema; fields absent in an older file come
    back null under the declared plan schema."""
    old = json.dumps({"type": "record", "name": "logev", "fields": [
        {"name": "message", "type": "string"}]})
    new = json.dumps({"type": "record", "name": "logev", "fields": [
        {"name": "message", "type": "string"},
        {"name": "status", "type": "int"}]})
    d = tmp_path / "evolve"
    d.mkdir()
    _jvm_write_avro(spark, str(d / "a_old.avro"), old, [dict(message="m1")])
    _jvm_write_avro(spark, str(d / "b_new.avro"), new,
                    [dict(message="m2", status=500)])
    df = resolve_input(
        spark, "file",
        {"path": str(d), "codec": "avro", "avro_schema": new})
    rows = {r["message"]: r["status"] for r in df.collect()}
    assert rows == {"m1": None, "m2": 500}


def test_tag_on_failure_corrupt_file(spark, tmp_path):
    """avro.rb `tag_on_failure`: default (false) raises on a corrupt
    payload; true yields ONE all-null `_avroparsefailure`-tagged row
    per corrupt file instead of aborting the task."""
    schema = json.dumps({"type": "record", "name": "logev", "fields": [
        {"name": "message", "type": "string"}]})
    d = tmp_path / "corrupt"
    d.mkdir()
    _jvm_write_avro(spark, str(d / "good.avro"), schema,
                    [dict(message="ok1"), dict(message="ok2")])
    good = (d / "good.avro").read_bytes()
    bad = bytearray(good)
    bad[-1] ^= 0xFF  # corrupt the trailing sync marker
    (d / "bad.avro").write_bytes(bytes(bad))

    args = {"path": str(d), "codec": "avro", "avro_schema": schema}
    with pytest.raises(Exception):
        resolve_input(spark, "file", dict(args)).collect()

    df = resolve_input(spark, "file", dict(args, tag_on_failure=True))
    assert "tags" in df.columns
    rows = df.collect()
    got = {(r["message"], tuple(r["tags"] or ())) for r in rows}
    assert got == {
        (None, ("_avroparsefailure",)), ("ok1", ()), ("ok2", ())}


def test_tag_on_failure_record_with_own_tags_field(spark, tmp_path):
    """An avro record whose schema ITSELF has a `tags` array<string>
    field: no duplicate column, decoded tags values survive on good
    rows, and the corrupt-file row carries the failure tag (review
    finding: good rows' tags were clobbered to null)."""
    schema = json.dumps({"type": "record", "name": "logev", "fields": [
        {"name": "message", "type": "string"},
        {"name": "tags", "type": {"type": "array", "items": "string"}}]})
    d = tmp_path / "owntags"
    d.mkdir()
    _jvm_write_avro(spark, str(d / "good.avro"), schema,
                    [dict(message="ok", tags=["real", "decoded"])])
    good = (d / "good.avro").read_bytes()
    bad = bytearray(good)
    bad[-1] ^= 0xFF
    (d / "bad.avro").write_bytes(bytes(bad))

    df = resolve_input(spark, "file", {
        "path": str(d), "codec": "avro", "avro_schema": schema,
        "tag_on_failure": True})
    assert df.columns.count("tags") == 1
    got = {(r["message"], tuple(r["tags"] or ())) for r in df.collect()}
    assert got == {("ok", ("real", "decoded")),
                   (None, ("_avroparsefailure",))}


def test_tag_on_failure_incompatible_tags_type_rejected(spark, tmp_path):
    """A record `tags` field that is not array<string> cannot carry the
    failure tag — loud plan-time error, not a silent type clash."""
    schema = json.dumps({"type": "record", "name": "logev", "fields": [
        {"name": "message", "type": "string"},
        {"name": "tags", "type": "string"}]})
    d = tmp_path / "badtags"
    d.mkdir()
    _jvm_write_avro(spark, str(d / "a.avro"), schema,
                    [dict(message="ok", tags="scalar")])
    with pytest.raises(ValueError, match="cannot carry"):
        resolve_input(spark, "file", {
            "path": str(d), "codec": "avro", "avro_schema": schema,
            "tag_on_failure": True})
