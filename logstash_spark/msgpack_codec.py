"""MessagePack codec.

Reference counterpart: logstash-codec-msgpack
(lib/logstash/codecs/msgpack.rb) — each payload unpacks into the event
hash (plus the usual ``target`` option); decode failures keep the raw
payload in ``message`` and tag ``_msgpackparsefailure``.

Spark re-expression, avro/protobuf dual-stance precedent: a complete
**pure-Python decoder of the public MessagePack format spec** (all
fixint/str/bin/array/map/float/uint/int families, str8/16/32,
bin8/16/32, array16/32, map16/32, the timestamp ext type → ISO-8601
string, other ext types → ``{"__ext__": type, "data": hex}``) — no
wheel needed. Events are schemaless (like the json codec), so each
decoded object is emitted as one canonical-JSON ``message`` string and
flows into the existing json filter for schema application — identical
layering to how the reference's codec hands a Ruby hash to the event.
A stream of concatenated objects per file is supported (the msgpack
framing used by fluent-forward and file dumps). Corrupt payloads yield
an error row with the failure tag, never a task abort.
"""

from __future__ import annotations

import datetime as _dt
import json
import struct
from collections.abc import Iterator

import pandas as pd

MSGPACK_SCHEMA = "message string, tags array<string>"
FAILURE_TAG = "_msgpackparsefailure"


class MsgpackError(ValueError):
    pass


def _need(data: bytes, pos: int, n: int) -> None:
    if pos + n > len(data):
        raise MsgpackError(f"truncated at {pos} (need {n} bytes)")


def _iso(sec: int, ns: int) -> str:
    try:
        ts = _dt.datetime.fromtimestamp(sec, tz=_dt.timezone.utc)
    except (ValueError, OverflowError, OSError) as e:
        # the 96-bit form carries a full int64 of seconds — out-of-range
        # values are representable on the wire but not as a datetime
        raise MsgpackError(f"timestamp out of range ({sec}s)") from e
    out = ts.strftime("%Y-%m-%dT%H:%M:%S")
    return out + (f".{ns:09d}".rstrip("0").rstrip(".") or "") + "Z"


def _decode_ext(typ: int, body: bytes):
    if typ == -1:  # timestamp ext (spec: 32/64/96-bit forms)
        if len(body) == 4:
            sec, ns = struct.unpack(">I", body)[0], 0
        elif len(body) == 8:
            v = struct.unpack(">Q", body)[0]
            ns, sec = v >> 34, v & ((1 << 34) - 1)
        elif len(body) == 12:
            ns, sec = struct.unpack(">Iq", body)
        else:
            raise MsgpackError(f"bad timestamp ext length {len(body)}")
        return _iso(sec, ns)
    return {"__ext__": typ, "data": body.hex()}


def unpack_one(data: bytes, pos: int = 0):
    """One object at ``pos`` → (value, new_pos). Public-spec decode."""
    _need(data, pos, 1)
    b = data[pos]
    pos += 1
    if b <= 0x7F:                      # positive fixint
        return b, pos
    if b >= 0xE0:                      # negative fixint
        return b - 0x100, pos
    if 0x80 <= b <= 0x8F:              # fixmap
        return _unpack_map(data, pos, b & 0x0F)
    if 0x90 <= b <= 0x9F:              # fixarray
        return _unpack_array(data, pos, b & 0x0F)
    if 0xA0 <= b <= 0xBF:              # fixstr
        n = b & 0x1F
        _need(data, pos, n)
        return data[pos:pos + n].decode("utf-8", errors="replace"), pos + n
    if b == 0xC0:
        return None, pos
    if b == 0xC2:
        return False, pos
    if b == 0xC3:
        return True, pos
    if b in (0xC4, 0xC5, 0xC6):        # bin8/16/32
        w = 1 << (b - 0xC4)
        _need(data, pos, w)
        n = int.from_bytes(data[pos:pos + w], "big")
        pos += w
        _need(data, pos, n)
        return {"__bin__": data[pos:pos + n].hex()}, pos + n
    if b in (0xC7, 0xC8, 0xC9):        # ext8/16/32
        w = 1 << (b - 0xC7)
        _need(data, pos, w + 1)
        n = int.from_bytes(data[pos:pos + w], "big")
        typ = struct.unpack(">b", data[pos + w:pos + w + 1])[0]
        pos += w + 1
        _need(data, pos, n)
        return _decode_ext(typ, data[pos:pos + n]), pos + n
    if b == 0xCA:
        _need(data, pos, 4)
        return struct.unpack(">f", data[pos:pos + 4])[0], pos + 4
    if b == 0xCB:
        _need(data, pos, 8)
        return struct.unpack(">d", data[pos:pos + 8])[0], pos + 8
    if 0xCC <= b <= 0xCF:              # uint8/16/32/64
        w = 1 << (b - 0xCC)
        _need(data, pos, w)
        return int.from_bytes(data[pos:pos + w], "big"), pos + w
    if 0xD0 <= b <= 0xD3:              # int8/16/32/64
        w = 1 << (b - 0xD0)
        _need(data, pos, w)
        return int.from_bytes(data[pos:pos + w], "big", signed=True), pos + w
    if 0xD4 <= b <= 0xD8:              # fixext1/2/4/8/16
        n = 1 << (b - 0xD4)
        _need(data, pos, 1 + n)
        typ = struct.unpack(">b", data[pos:pos + 1])[0]
        return _decode_ext(typ, data[pos + 1:pos + 1 + n]), pos + 1 + n
    if b in (0xD9, 0xDA, 0xDB):        # str8/16/32
        w = 1 << (b - 0xD9)
        _need(data, pos, w)
        n = int.from_bytes(data[pos:pos + w], "big")
        pos += w
        _need(data, pos, n)
        return data[pos:pos + n].decode("utf-8", errors="replace"), pos + n
    if b in (0xDC, 0xDD):              # array16/32
        w = 2 << (b - 0xDC)
        _need(data, pos, w)
        n = int.from_bytes(data[pos:pos + w], "big")
        return _unpack_array(data, pos + w, n)
    if b in (0xDE, 0xDF):              # map16/32
        w = 2 << (b - 0xDE)
        _need(data, pos, w)
        n = int.from_bytes(data[pos:pos + w], "big")
        return _unpack_map(data, pos + w, n)
    raise MsgpackError(f"reserved/unknown type byte 0x{b:02X}")


def _unpack_array(data: bytes, pos: int, n: int):
    out = []
    for _ in range(n):
        v, pos = unpack_one(data, pos)
        out.append(v)
    return out, pos


def _unpack_map(data: bytes, pos: int, n: int):
    out = {}
    for _ in range(n):
        k, pos = unpack_one(data, pos)
        v, pos = unpack_one(data, pos)
        out[k if isinstance(k, str) else json.dumps(k)] = v
    return out, pos


def unpack_stream(data: bytes) -> list:
    """Concatenated msgpack objects (fluent-forward / dump framing)."""
    out, pos = [], 0
    while pos < len(data):
        v, pos = unpack_one(data, pos)
        out.append(v)
    return out


def read_msgpack(spark, path: str, streaming: bool = False):
    """binaryFile → mapInPandas: each decoded object becomes one event
    with its canonical-JSON rendering in ``message`` (json-codec
    layering — apply the json filter downstream for schema); decode
    failures keep the raw payload hex in ``message`` + the reference's
    ``_msgpackparsefailure`` tag."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for raw in pdf["content"]:
                payload = bytes(raw)
                try:
                    for obj in unpack_stream(payload):
                        rows.append((json.dumps(obj, sort_keys=True), None))
                except Exception as e:
                    # MsgpackError/struct.error for diagnosed shapes;
                    # a corrupt payload can also surface RecursionError
                    # (deep nesting) etc. — the contract is an error
                    # row, never a task abort
                    rows.append((payload.hex(), [FAILURE_TAG, str(e)[:120]]))
            yield pd.DataFrame(rows, columns=["message", "tags"])

    from .binfile import binary_content

    return binary_content(spark, path, streaming).mapInPandas(_decode, schema=MSGPACK_SCHEMA)


# ---------------------------------------------------------------------------
# fluent codec (logstash-codec-fluent) — the Fluentd forward-protocol
# framing over msgpack: a payload is one msgpack array of either
#   [tag, time, record]                       (Message mode)
#   [tag, [[time, record], ...]]              (Forward mode)
#   [tag, <msgpack-stream of EventTime/records binary>] is the
#     PackedForward mode — its entries blob is itself a concatenated
#     msgpack stream of [time, record] pairs.
# Times are ints (epoch sec) or Fluentd's EventTime ext type 0
# (decoded to an ISO string by ``_fluent_time``). Each entry → one
# event row:
# (tag, fluent_time, message=canonical-JSON record).
# ---------------------------------------------------------------------------

FLUENT_SCHEMA = "tag string, fluent_time string, message string, tags array<string>"
FLUENT_FAILURE_TAG = "_fluentparsefailure"


def _fluent_entries(obj):
    if not isinstance(obj, list) or len(obj) < 2 or not isinstance(obj[0], str):
        raise MsgpackError("not a fluent forward frame")
    tag, second = obj[0], obj[1]
    if isinstance(second, dict) and "__bin__" in second:
        # PackedForward: bin of concatenated [time, record] pairs
        blob = bytes.fromhex(second["__bin__"])
        entries = unpack_stream(blob)
    elif isinstance(second, list):
        # Forward: [tag, [[time, record], ...], options?]
        entries = second
    elif len(obj) >= 3 and isinstance(obj[2], dict):
        # Message: [tag, time, record, options?]
        entries = [[second, obj[2]]]
    else:
        raise MsgpackError("unrecognized fluent frame shape")
    if not all(isinstance(e, list) and len(e) == 2 for e in entries):
        raise MsgpackError("malformed fluent entry list")
    return tag, [tuple(e) for e in entries]


def _fluent_time(t) -> str:
    """Entry time → string: epoch-sec int, pre-decoded timestamp ext
    (ISO, from the msgpack layer), or Fluentd's EventTime ext type 0
    (fixext8: 4B sec + 4B ns big-endian — the forward-protocol default
    when time_as_integer is false)."""
    if isinstance(t, dict) and t.get("__ext__") == 0:
        body = bytes.fromhex(t["data"])
        if len(body) != 8:
            raise MsgpackError(f"bad EventTime length {len(body)}")
        sec, ns = struct.unpack(">II", body)
        return _iso(sec, ns)
    return str(t)


def read_fluent(spark, path: str, streaming: bool = False):
    """binaryFile → mapInPandas fluent-forward decode (one frame per
    file; a concatenated stream of frames also works)."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for raw in pdf["content"]:
                payload = bytes(raw)
                # decode the WHOLE payload before emitting anything: a
                # malformed later frame must yield ONE error row, not
                # the earlier frames' events PLUS an error row carrying
                # the same bytes (double-represented data)
                decoded = []
                try:
                    for frame in unpack_stream(payload):
                        tag, entries = _fluent_entries(frame)
                        for t, rec in entries:
                            decoded.append((tag, _fluent_time(t),
                                            json.dumps(rec, sort_keys=True),
                                            None))
                except Exception as e:
                    rows.append((None, None, payload.hex(),
                                 [FLUENT_FAILURE_TAG, str(e)[:120]]))
                else:
                    rows.extend(decoded)
            yield pd.DataFrame(
                rows, columns=["tag", "fluent_time", "message", "tags"])

    from .binfile import binary_content

    return binary_content(spark, path, streaming).mapInPandas(_decode, schema=FLUENT_SCHEMA)
