"""MessagePack codec contract tests (logstash-codec-msgpack parity).

Golden bytes are HAND-ENCODED from the public format spec, so the
decoder is differential-tested against an independent encoder."""

from __future__ import annotations

import json
import struct

import pytest

from logstash_spark.msgpack_codec import (
    FAILURE_TAG,
    MsgpackError,
    read_msgpack,
    unpack_one,
    unpack_stream,
)


def fixstr(s: str) -> bytes:
    b = s.encode()
    assert len(b) < 32
    return bytes([0xA0 | len(b)]) + b


def fixmap(pairs: list[bytes]) -> bytes:
    return bytes([0x80 | len(pairs)]) + b"".join(pairs)


SAMPLE = fixmap([
    fixstr("host") + fixstr("web-1"),
    fixstr("code") + bytes([0xCC, 0xC8]),                    # uint8 200
    fixstr("delta") + bytes([0xD1]) + struct.pack(">h", -500),  # int16
    fixstr("ratio") + bytes([0xCB]) + struct.pack(">d", 0.25),
    fixstr("ok") + b"\xc3",                                   # true
    fixstr("tags") + bytes([0x92]) + fixstr("a") + fixstr("b"),  # fixarray
    fixstr("note") + b"\xc0",                                 # nil
])


def test_unpack_scalars_and_containers():
    v, pos = unpack_one(SAMPLE)
    assert pos == len(SAMPLE)
    assert v == {"host": "web-1", "code": 200, "delta": -500,
                 "ratio": 0.25, "ok": True, "tags": ["a", "b"],
                 "note": None}


def test_unpack_wide_types():
    # str8, bin8, array16, map16, uint64, negative fixint
    s8 = bytes([0xD9, 3]) + b"xyz"
    assert unpack_one(s8)[0] == "xyz"
    b8 = bytes([0xC4, 2]) + b"\x01\xff"
    assert unpack_one(b8)[0] == {"__bin__": "01ff"}
    a16 = bytes([0xDC]) + struct.pack(">H", 3) + b"\x01\x02\x03"
    assert unpack_one(a16)[0] == [1, 2, 3]
    m16 = bytes([0xDE]) + struct.pack(">H", 1) + fixstr("k") + b"\xe0"  # -32
    assert unpack_one(m16)[0] == {"k": -32}
    u64 = bytes([0xCF]) + struct.pack(">Q", 2**63 + 5)
    assert unpack_one(u64)[0] == 2**63 + 5


def test_timestamp_ext():
    # fixext8 type -1, 64-bit form: ns<<34 | sec
    sec, ns = 1735689600, 250_000_000  # 2025-01-01T00:00:00.25Z
    body = struct.pack(">Q", (ns << 34) | sec)
    buf = bytes([0xD7, 0xFF]) + body
    assert unpack_one(buf)[0] == "2025-01-01T00:00:00.25Z"
    # fixext4 type -1, 32-bit seconds-only form
    buf32 = bytes([0xD6, 0xFF]) + struct.pack(">I", sec)
    assert unpack_one(buf32)[0] == "2025-01-01T00:00:00Z"


def test_stream_and_truncation():
    stream = SAMPLE + bytes([0x07]) + fixstr("end")
    assert unpack_stream(stream) == [unpack_one(SAMPLE)[0], 7, "end"]
    with pytest.raises(MsgpackError, match="truncated"):
        unpack_stream(SAMPLE[:-2])
    with pytest.raises(MsgpackError, match="reserved"):
        unpack_one(b"\xc1")


def test_read_msgpack_spark(spark, tmp_path):
    d = tmp_path / "mp"
    d.mkdir()
    (d / "a.msgpack").write_bytes(SAMPLE + bytes([0x2A]))  # map + int 42
    (d / "bad.msgpack").write_bytes(b"\xc1\xc1")
    rows = read_msgpack(spark, str(d)).collect()
    good = sorted(
        (r.message for r in rows if r.tags is None), key=len
    )
    assert good[0] == "42"
    assert json.loads(good[1])["host"] == "web-1"
    bad = [r for r in rows if r.tags is not None]
    assert len(bad) == 1 and FAILURE_TAG in bad[0].tags


def test_sources_dispatch_msgpack(spark, tmp_path):
    from logstash_spark.sources import resolve_input

    d = tmp_path / "mp2"
    d.mkdir()
    (d / "x.msgpack").write_bytes(fixmap([fixstr("k") + fixstr("v")]))
    df = resolve_input(spark, "file", {"path": str(d), "codec": "msgpack"})
    assert json.loads(df.collect()[0].message) == {"k": "v"}


def test_fluent_modes(spark, tmp_path):
    """fluent codec: Message / Forward / PackedForward framings all
    decode to per-entry events with tag + time + record JSON."""
    from logstash_spark.msgpack_codec import (
        FLUENT_FAILURE_TAG,
        read_fluent,
    )

    def arr(items: list[bytes]) -> bytes:
        return bytes([0x90 | len(items)]) + b"".join(items)

    def u32(v: int) -> bytes:
        return bytes([0xCE]) + struct.pack(">I", v)

    rec = fixmap([fixstr("msg") + fixstr("hello")])
    message_mode = arr([fixstr("app.logs"), u32(1735689600), rec])
    forward_mode = arr([
        fixstr("fw.tag"),
        arr([arr([u32(1), rec]), arr([u32(2), rec])]),
    ])
    packed_entries = arr([u32(7), rec]) + arr([u32(8), rec])
    packed_mode = arr([
        fixstr("pk.tag"),
        bytes([0xC4, len(packed_entries)]) + packed_entries,
    ])
    d = tmp_path / "fl"
    d.mkdir()
    (d / "m.bin").write_bytes(message_mode)
    (d / "f.bin").write_bytes(forward_mode)
    (d / "p.bin").write_bytes(packed_mode)
    (d / "bad.bin").write_bytes(b"\x05")  # an int is not a frame
    rows = read_fluent(spark, str(d)).collect()
    by_tag = {}
    for r in rows:
        by_tag.setdefault(r.tag, []).append(r)
    assert len(by_tag["app.logs"]) == 1
    assert by_tag["app.logs"][0].fluent_time == "1735689600"
    assert json.loads(by_tag["app.logs"][0].message) == {"msg": "hello"}
    assert sorted(r.fluent_time for r in by_tag["fw.tag"]) == ["1", "2"]
    assert sorted(r.fluent_time for r in by_tag["pk.tag"]) == ["7", "8"]
    bad = by_tag.get(None, [])
    assert len(bad) == 1 and FLUENT_FAILURE_TAG in bad[0].tags


def test_fluent_partial_payload_is_one_error_row(spark, tmp_path):
    """A payload whose LATER frame/entry is malformed must produce ONE
    error row for the whole payload — not the earlier frames' events
    plus an error row embedding the same bytes (double-represented
    data on replay/count)."""
    from logstash_spark.msgpack_codec import FLUENT_FAILURE_TAG, read_fluent

    def arr(items: list[bytes]) -> bytes:
        return bytes([0x90 | len(items)]) + b"".join(items)

    def u32(v: int) -> bytes:
        return bytes([0xCE]) + struct.pack(">I", v)

    rec = fixmap([fixstr("msg") + fixstr("hello")])
    good_frame = arr([fixstr("ok.tag"), u32(1), rec])
    # EventTime ext with a 5-byte body (must be 8) → decode error
    bad_time = bytes([0xC7, 5, 0x00]) + b"\x00" * 5
    bad_frame = arr([fixstr("bad.tag"), bad_time, rec])
    d = tmp_path / "fl_partial"
    d.mkdir()
    (d / "x.bin").write_bytes(good_frame + bad_frame)
    rows = read_fluent(spark, str(d)).collect()
    assert len(rows) == 1
    assert rows[0].tag is None and FLUENT_FAILURE_TAG in rows[0].tags


def test_timestamp_out_of_range_is_msgpack_error():
    """The 96-bit timestamp form carries a full int64 of seconds; values
    datetime can't represent must raise MsgpackError (→ failure row),
    not a bare ValueError that escapes the codec's error handling."""
    body = struct.pack(">Iq", 0, 1 << 62)
    ext = bytes([0xC7, 12, 0xFF]) + body       # ext8, type -1
    with pytest.raises(MsgpackError, match="out of range"):
        unpack_one(ext)


def test_fluent_eventtime_ext_decodes_to_iso(spark, tmp_path):
    """Fluentd's EventTime ext type 0 (fixext8: 4B sec + 4B ns) is the
    forward-protocol default (time_as_integer false) — it must decode
    to an ISO string, not the str() of the raw ext dict."""
    from logstash_spark.msgpack_codec import read_fluent

    rec = fixmap([fixstr("msg") + fixstr("hi")])
    et = bytes([0xD7, 0x00]) + struct.pack(">II", 1735689600, 500_000_000)
    frame = bytes([0x93]) + fixstr("app") + et + rec
    d = tmp_path / "flet"
    d.mkdir()
    (d / "m.bin").write_bytes(frame)
    row = read_fluent(spark, str(d)).collect()[0]
    assert row.tag == "app"
    assert row.fluent_time == "2025-01-01T00:00:00.5Z"
    assert row.tags is None
