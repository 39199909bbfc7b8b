"""collectd binary-protocol codec.

Reference counterpart: logstash-codec-collectd
(lib/logstash/codecs/collectd.rb) — decodes collectd's network plugin
datagrams: a sequence of TLV parts (type:u16be, length:u16be, payload)
where string/metadata parts (host, plugin, type, instances, time,
interval) set decoder state and each VALUES part (0x0006) emits one
event carrying the current state plus the decoded value list.

Part types (public collectd protocol spec, network.h):
  0x0000 host        0x0001 time          0x0008 time_hr (2^-30 s)
  0x0002 plugin      0x0003 plugin_instance
  0x0004 type        0x0005 type_instance
  0x0006 values      0x0007 interval      0x0009 interval_hr
Value kinds inside a VALUES part: 0 counter (u64be), 1 gauge (f64 LE —
the protocol's one little-endian field), 2 derive (i64be),
3 absolute (u64be).

Spark re-expression mirrors the netflow codec: ``binaryFile`` scan →
``mapInPandas``; the per-datagram TLV walk is inherently sequential
(state machine), but datagrams decode independently and in parallel.
Corrupt payloads yield an error row, never a task abort.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

COLLECTD_SCHEMA = (
    "host string, plugin string, plugin_instance string, type string, "
    "type_instance string, collectd_time double, interval double, "
    "value_kinds array<string>, values array<double>, error string"
)

_KINDS = {0: "counter", 1: "gauge", 2: "derive", 3: "absolute"}
_STATE_STRINGS = {0x0000: "host", 0x0002: "plugin", 0x0003: "plugin_instance",
                  0x0004: "type", 0x0005: "type_instance"}


def decode_datagram(payload: bytes) -> list[dict]:
    """One datagram → list of event dicts (or one error dict)."""

    def err(msg: str) -> list[dict]:
        return [{"host": None, "plugin": None, "plugin_instance": None,
                 "type": None, "type_instance": None, "collectd_time": None,
                 "interval": None, "value_kinds": None, "values": None,
                 "error": msg}]

    if payload is None:
        return err("null payload")
    state: dict = {"host": None, "plugin": None, "plugin_instance": None,
                   "type": None, "type_instance": None,
                   "collectd_time": None, "interval": None}
    out: list[dict] = []
    pos, n = 0, len(payload)
    try:
        while pos + 4 <= n:
            ptype, plen = struct.unpack_from(">HH", payload, pos)
            if plen < 4 or pos + plen > n:
                raise ValueError(f"bad part length {plen} at offset {pos}")
            body = payload[pos + 4: pos + plen]
            if ptype in _STATE_STRINGS:
                # NUL-terminated string
                state[_STATE_STRINGS[ptype]] = body.rstrip(b"\x00").decode(
                    "utf-8", errors="replace"
                )
            elif ptype == 0x0001:      # time (epoch seconds)
                state["collectd_time"] = float(struct.unpack(">Q", body)[0])
            elif ptype == 0x0008:      # time_hr (2^-30 s units)
                state["collectd_time"] = struct.unpack(">Q", body)[0] / 2**30
            elif ptype == 0x0007:      # interval (seconds)
                state["interval"] = float(struct.unpack(">Q", body)[0])
            elif ptype == 0x0009:      # interval_hr
                state["interval"] = struct.unpack(">Q", body)[0] / 2**30
            elif ptype == 0x0006:      # values
                (cnt,) = struct.unpack_from(">H", body, 0)
                if len(body) != 2 + cnt * 9:
                    raise ValueError(
                        f"values part size {len(body)} != 2+{cnt}*9"
                    )
                kinds, vals = [], []
                for i in range(cnt):
                    k = body[2 + i]
                    off = 2 + cnt + i * 8
                    if k == 1:  # gauge: little-endian double
                        v = struct.unpack_from("<d", body, off)[0]
                    elif k == 2:  # derive: signed
                        v = float(struct.unpack_from(">q", body, off)[0])
                    elif k in (0, 3):  # counter/absolute: unsigned
                        v = float(struct.unpack_from(">Q", body, off)[0])
                    else:
                        raise ValueError(f"unknown value kind {k}")
                    kinds.append(_KINDS[k])
                    vals.append(v)
                out.append({**state, "value_kinds": kinds, "values": vals,
                            "error": None})
            # unknown part types are skipped (forward compatibility,
            # same as the reference's default branch)
            pos += plen
        if pos != n:
            raise ValueError(f"trailing {n - pos} bytes after last part")
    except (struct.error, ValueError) as e:
        # keep every VALUES event decoded BEFORE the corruption point
        # (UDP truncation is routine); the error row rides alongside
        return out + err(str(e))
    return out


def decode_frames(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cols = [f.split()[0] for f in COLLECTD_SCHEMA.split(", ")]
    for pdf in it:
        rows: list[dict] = []
        for payload in pdf["content"]:
            rows.extend(decode_datagram(payload))
        yield pd.DataFrame(rows, columns=cols)


def encode_datagram(events: list[dict]) -> bytes:
    """Test-side encoder: list of {host, plugin, type, time, interval,
    values: [(kind, value), …]} state+values groups → one datagram."""

    def part(ptype: int, body: bytes) -> bytes:
        return struct.pack(">HH", ptype, len(body) + 4) + body

    def spart(ptype: int, s: str) -> bytes:
        return part(ptype, s.encode() + b"\x00")

    buf = b""
    rev = {v: k for k, v in _STATE_STRINGS.items()}
    for ev in events:
        for key in ("host", "plugin", "plugin_instance", "type",
                    "type_instance"):
            if ev.get(key) is not None:
                buf += spart(rev[key], ev[key])
        if ev.get("time") is not None:
            buf += part(0x0008, struct.pack(">Q", int(ev["time"] * 2**30)))
        if ev.get("interval") is not None:
            buf += part(0x0007, struct.pack(">Q", int(ev["interval"])))
        if ev.get("values"):
            kinds_rev = {v: k for k, v in _KINDS.items()}
            vals = ev["values"]
            body = struct.pack(">H", len(vals))
            body += bytes(kinds_rev[k] for k, _ in vals)
            for k, v in vals:
                if k == "gauge":
                    body += struct.pack("<d", v)
                elif k == "derive":
                    body += struct.pack(">q", int(v))
                else:
                    body += struct.pack(">Q", int(v))
            buf += part(0x0006, body)
    return buf


def read_collectd(spark, path: str, streaming: bool = False):
    from .binfile import binary_content

    return binary_content(spark, path, streaming).mapInPandas(
        decode_frames, schema=COLLECTD_SCHEMA
    )
