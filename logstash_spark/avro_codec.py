"""Avro codec: pure-Python Object Container File decoder.

Reference counterpart: logstash-codec-avro (SURVEY §2.3) — decodes Avro
records into event fields. Spark's native `format("avro")` reader
(the external spark-avro module) is preferred when its jar is on the
cluster classpath — it is splittable at sync markers and decodes
JVM-side. This module is the jar-free fallback: it implements the
public Avro 1.x Object Container File spec
(https://avro.apache.org/docs/1.11.1/specification/#object-container-files)
so the codec is REAL and testable in environments that ship only core
avro (as this sandbox does), not the datasource module.

Execution model of the fallback (see `sources.resolve_input`):
`binaryFile` scan → `mapInPandas` decode, ONE file per record/task.
Each file is self-describing (writer schema in the header), so workers
never need driver-shipped schemas; the driver peeks one header only to
declare the plan-time Spark schema. Scale note: whole-file-per-task is
the right shape for the log-shipping case this codec serves (many
rolled files); a single multi-GB avro file needs the splittable native
reader — the error message says so.

Supported: null/deflate codecs; all primitive types; record, enum,
array, map, union, fixed; named-type references; nullable unions
([null, X] → nullable X). General (multi-branch) unions and the snappy
codec raise a clear error — documented deviation, no silent data.
Logical types decode as their underlying primitive.

Verified two ways (tests/test_avro_codec.py): hand-built golden bytes
from the spec, and a differential test against the JVM reference
implementation (org.apache.avro, bundled with Spark) writing files
that this decoder must read back bit-for-bit.
"""

from __future__ import annotations

import json
import struct
import zlib

MAGIC = b"Obj\x01"
_SYNC_SIZE = 16

_PRIMITIVES = {
    "null", "boolean", "int", "long", "float", "double", "bytes", "string",
}


class AvroError(ValueError):
    pass


# ---------------------------------------------------------------- schema

def parse_schema(schema_json, _names=None):
    """Avro schema JSON → normalized dict tree.

    Named types (record/enum/fixed) register in `_names` so later
    references by full name resolve (spec: "Names").
    """
    if _names is None:
        _names = {}
    s = json.loads(schema_json) if isinstance(schema_json, (str, bytes)) else schema_json
    return _norm(s, _names)


def _fullname(s):
    name = s["name"]
    ns = s.get("namespace")
    if "." not in name and ns:
        return f"{ns}.{name}"
    return name


def _norm(s, names):
    if isinstance(s, str):
        if s in _PRIMITIVES:
            return {"type": s}
        if s in names:
            return names[s]
        raise AvroError(f"unknown schema name {s!r}")
    if isinstance(s, list):  # union
        return {"type": "union", "branches": [_norm(b, names) for b in s]}
    t = s["type"]
    if t in _PRIMITIVES:
        return {"type": t}
    if t == "record":
        node = {"type": "record", "name": _fullname(s), "fields": []}
        names[node["name"]] = node  # register before fields: recursion
        names.setdefault(s["name"], node)
        node["fields"] = [
            {"name": f["name"], "schema": _norm(f["type"], names)}
            for f in s["fields"]
        ]
        return node
    if t == "enum":
        node = {"type": "enum", "name": _fullname(s), "symbols": list(s["symbols"])}
        names[node["name"]] = node
        names.setdefault(s["name"], node)
        return node
    if t == "fixed":
        node = {"type": "fixed", "name": _fullname(s), "size": int(s["size"])}
        names[node["name"]] = node
        names.setdefault(s["name"], node)
        return node
    if t == "array":
        return {"type": "array", "items": _norm(s["items"], names)}
    if t == "map":
        return {"type": "map", "values": _norm(s["values"], names)}
    if isinstance(t, (dict, list)):  # {"type": {...nested...}, "logicalType": ...}
        return _norm(t, names)
    raise AvroError(f"unsupported avro type {t!r}")


def spark_ddl(schema) -> str:
    """Avro schema tree → Spark DDL string for the top-level record."""
    if schema["type"] != "record":
        raise AvroError("top-level avro schema must be a record")
    cols = ", ".join(
        f"`{f['name']}` {_spark_type(f['schema'])}" for f in schema["fields"]
    )
    return cols


def _spark_type(s) -> str:
    t = s["type"]
    simple = {
        "boolean": "boolean", "int": "int", "long": "bigint",
        "float": "float", "double": "double", "bytes": "binary",
        "string": "string", "fixed": "binary", "enum": "string",
        "null": "void",
    }
    if t in simple:
        return simple[t]
    if t == "union":
        branch = _nullable_branch(s)
        return _spark_type(branch)  # nullability is implicit in Spark DDL
    if t == "array":
        return f"array<{_spark_type(s['items'])}>"
    if t == "map":
        return f"map<string, {_spark_type(s['values'])}>"
    if t == "record":
        inner = ", ".join(
            f"`{f['name']}`: {_spark_type(f['schema'])}" for f in s["fields"]
        )
        return f"struct<{inner}>"
    raise AvroError(f"unsupported avro type {t!r}")


def _nullable_branch(union):
    branches = [b for b in union["branches"] if b["type"] != "null"]
    if len(branches) != 1:
        raise AvroError(
            "only nullable unions [null, X] are supported by the fallback "
            "decoder; general unions need the spark-avro native reader"
        )
    return branches[0]


# ---------------------------------------------------------------- decode

class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf):
        self.buf = buf
        self.pos = 0

    def read_long(self) -> int:
        buf, pos = self.buf, self.pos
        acc = 0
        shift = 0
        while True:
            byte = buf[pos]
            pos += 1
            acc |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
        self.pos = pos
        return (acc >> 1) ^ -(acc & 1)  # zigzag

    def read_raw(self, n: int) -> bytes:
        p = self.pos
        self.pos = p + n
        out = self.buf[p:self.pos]
        if len(out) < n:
            raise AvroError("truncated avro data")
        return bytes(out)

    def read_bytes(self) -> bytes:
        return self.read_raw(self.read_long())


def _decode(s, r: _Reader):
    t = s["type"]
    if t == "string":
        return r.read_bytes().decode("utf-8")
    if t == "long" or t == "int":
        return r.read_long()
    if t == "double":
        return struct.unpack("<d", r.read_raw(8))[0]
    if t == "float":
        return struct.unpack("<f", r.read_raw(4))[0]
    if t == "boolean":
        return r.read_raw(1) == b"\x01"
    if t == "null":
        return None
    if t == "bytes":
        return r.read_bytes()
    if t == "union":
        idx = r.read_long()
        return _decode(s["branches"][idx], r)
    if t == "record":
        return {f["name"]: _decode(f["schema"], r) for f in s["fields"]}
    if t == "array":
        out = []
        while True:
            n = r.read_long()
            if n == 0:
                return out
            if n < 0:  # block with byte-size prefix (skippable form)
                n = -n
                r.read_long()
            for _ in range(n):
                out.append(_decode(s["items"], r))
    if t == "map":
        out = {}
        while True:
            n = r.read_long()
            if n == 0:
                return out
            if n < 0:
                n = -n
                r.read_long()
            for _ in range(n):
                k = r.read_bytes().decode("utf-8")
                out[k] = _decode(s["values"], r)
    if t == "enum":
        return s["symbols"][r.read_long()]
    if t == "fixed":
        return r.read_raw(s["size"])
    raise AvroError(f"unsupported avro type {t!r}")


def _read_meta_map(r: _Reader) -> dict:
    meta = {}
    while True:
        n = r.read_long()
        if n == 0:
            return meta
        if n < 0:
            n = -n
            r.read_long()
        for _ in range(n):
            k = r.read_bytes().decode("utf-8")
            meta[k] = r.read_bytes()


def read_header(raw: bytes):
    """Container header → (schema tree, codec name, sync marker, body offset)."""
    r = _Reader(memoryview(raw))
    if r.read_raw(4) != MAGIC:
        raise AvroError("not an avro object container file (bad magic)")
    meta = _read_meta_map(r)
    sync = r.read_raw(_SYNC_SIZE)
    schema = parse_schema(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise AvroError(
            f"avro codec {codec!r} needs the spark-avro native reader "
            "(fallback supports null/deflate)"
        )
    return schema, codec, sync, r.pos


def read_container(raw: bytes):
    """Whole container file bytes → (schema tree, list of decoded records)."""
    schema, codec, sync, pos = read_header(raw)
    r = _Reader(memoryview(raw))
    r.pos = pos
    rows = []
    total = len(raw)
    while r.pos < total:
        count = r.read_long()
        size = r.read_long()
        block = r.read_raw(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)  # raw deflate per spec
        br = _Reader(memoryview(block))
        for _ in range(count):
            rows.append(_decode(schema, br))
        if r.read_raw(_SYNC_SIZE) != sync:
            raise AvroError("sync marker mismatch (corrupt avro block)")
    return schema, rows


def peek_schema(path: str):
    """Driver-side plan-time peek: read ONE local file's header.

    Only the header is read (grown geometrically if the schema outruns
    the initial 64 KiB) — never the data blocks, so multi-GB files cost
    one small read. Remote paths (s3a/hdfs) should pass the schema via
    the `avro_schema` input arg instead.
    """
    import glob as _glob
    import os

    p = path[7:] if path.startswith("file://") else path
    if os.path.isdir(p):
        cands = sorted(_glob.glob(os.path.join(p, "**", "*.avro"), recursive=True))
    else:
        cands = sorted(_glob.glob(p))
    if not cands:
        raise AvroError(f"no avro files under {path!r} to peek a schema from")
    size = 65536
    while True:
        with open(cands[0], "rb") as fh:
            head = fh.read(size)
        try:
            schema, _, _, _ = read_header(head)
            return schema
        except (IndexError, AvroError) as e:
            if len(head) < size or size > 1 << 26:
                raise AvroError(f"cannot parse avro header of {cands[0]}: {e}")
            size *= 4
