"""edn + nmap codec tests — golden inputs hand-written from the public
specs (edn-format.org; nmap XML DTD), reference shapes from
logstash-codec-edn / logstash-codec-nmap."""

from __future__ import annotations

import json

import pytest

from logstash_spark.edn_codec import EdnError, read_stream
from logstash_spark.nmap_codec import parse_report
from logstash_spark.sources import resolve_input


# ----------------------------------------------------------------- edn unit

def test_edn_scalars_and_collections():
    forms = read_stream(
        'nil true false 42 -7 3.25 1e3 10N 2.5M "hi\\n\\u0041" \\a \\newline '
        '[1 2] (3 4) #{5 6} {:k 1, "s" 2, 3 4}'
    )
    assert forms == [
        None, True, False, 42, -7, 3.25, 1000.0, 10, 2.5, "hi\nA", "a", "\n",
        [1, 2], [3, 4], [5, 6], {"k": 1, "s": 2, "3": 4},
    ]


def test_edn_keywords_symbols_tags_discard_comments():
    forms = read_stream(
        "; a comment\n"
        ':ns/kw my-sym #_ {:dropped 1} '
        '#inst "2024-01-02T03:04:05Z" #uuid "f81d4fae-7dec-11d0-a765-00a0c91e6bf6" '
        '#my/tag [1 2]'
    )
    assert forms == [
        "ns/kw", "my-sym",
        "2024-01-02T03:04:05Z", "f81d4fae-7dec-11d0-a765-00a0c91e6bf6",
        {"__tag__": "my/tag", "value": [1, 2]},
    ]


def test_edn_stacked_discard_and_symbolic_values():
    # edn-format.org: each #_ discards one VALUE, so stacked discards
    # compose — `#_ #_ 1 2 3` is the single form 3
    assert read_stream("#_ #_ 1 2 3") == [3]
    assert read_stream("#_#_ 1 2 3") == [3]
    assert read_stream("[1 #_ #_ 2 3 4]") == [[1, 4]]
    with pytest.raises(EdnError):  # stacked discard starving at EOF
        read_stream("#_ #_ 1")
    # ## symbolic values are legal scalars, not parse failures
    inf, ninf, nan = read_stream("##Inf ##-Inf ##NaN")
    assert inf == float("inf") and ninf == float("-inf")
    assert nan != nan  # NaN
    assert read_stream("{:x ##Inf}") == [{"x": float("inf")}]
    with pytest.raises(EdnError):
        read_stream("##Bogus")


def test_edn_errors():
    for bad in ('"unterminated', "{:odd}", "[1 2", "#{1", "\\bogusname",
                # corrupt shapes that used to escape as bare
                # IndexError/ValueError (→ task abort instead of the
                # contractual error row): trailing discard/tag, bad \u
                "#_", "#inst ", '"a\\uZZZZ"', "\\uZZZZ"):
        with pytest.raises(EdnError):
            read_stream(bad)


def test_edn_codec_spark(spark, tmp_path):
    (tmp_path / "a.edn").write_text(
        '{:user "ada" :n 1}\n{:user "bob" :n 2, :tags #{:x}}'
    )
    (tmp_path / "bad.edn").write_text("{:broken")
    out = resolve_input(spark, "file", {"path": str(tmp_path), "codec": "edn"}).collect()
    ok = sorted(r.message for r in out if r.tags is None)
    assert json.loads(ok[0]) == {"n": 1, "user": "ada"}
    assert json.loads(ok[1]) == {"n": 2, "user": "bob", "tags": ["x"]}
    bad = [r for r in out if r.tags is not None]
    assert len(bad) == 1 and "_ednparsefailure" in bad[0].tags


# ---------------------------------------------------------------- nmap unit

NMAP_XML = """<?xml version="1.0"?>
<nmaprun scanner="nmap" args="nmap -sS host" start="1700000000" version="7.94">
 <host>
  <status state="up" reason="syn-ack"/>
  <address addr="192.0.2.10" addrtype="ipv4"/>
  <hostnames><hostname name="web.example" type="PTR"/></hostnames>
  <ports>
   <port protocol="tcp" portid="22">
    <state state="open" reason="syn-ack"/><service name="ssh"/>
   </port>
   <port protocol="tcp" portid="443">
    <state state="closed" reason="reset"/><service name="https"/>
   </port>
  </ports>
  <trace><hop ttl="1" ipaddr="10.0.0.1" rtt="0.5"/>
         <hop ttl="2" ipaddr="192.0.2.10" rtt="1.25"/></trace>
 </host>
 <runstats><finished time="1700000042"/></runstats>
</nmaprun>"""


def test_nmap_parse_report_event_stream():
    rows = parse_report(NMAP_XML.encode())
    by_type = {}
    cols = dict(zip(
        [c.split()[0] for c in
         __import__("logstash_spark.nmap_codec", fromlist=["_COLS"])._COLS],
        range(99)))
    for r in rows:
        by_type.setdefault(r[cols["event_type"]], []).append(r)
    assert len(by_type["nmap_scan_metadata"]) == 1
    meta = by_type["nmap_scan_metadata"][0]
    assert meta[cols["scanner"]] == "nmap"
    assert meta[cols["scan_start_ts"]] == 1700000000
    assert meta[cols["scan_end_ts"]] == 1700000042
    host = by_type["nmap_host"][0]
    assert host[cols["addr"]] == "192.0.2.10"
    assert host[cols["hostname"]] == "web.example"
    assert host[cols["host_status"]] == "up"
    ports = {p[cols["port"]]: p for p in by_type["nmap_port"]}
    assert ports[22][cols["service"]] == "ssh"
    assert ports[22][cols["port_state"]] == "open"
    assert ports[443][cols["port_state"]] == "closed"
    links = by_type["nmap_traceroute_link"]
    assert [(l[cols["hop_from"]], l[cols["hop_to"]]) for l in links] == [
        (None, "10.0.0.1"), ("10.0.0.1", "192.0.2.10")]
    assert links[1][cols["hop_rtt"]] == 1.25
    # emit toggles mirror the reference options
    only_ports = parse_report(NMAP_XML.encode(), emit_scan_metadata=False,
                              emit_hosts=False, emit_traceroute_links=False)
    assert {r[cols["event_type"]] for r in only_ports} == {"nmap_port"}


def test_nmap_codec_spark(spark, tmp_path):
    (tmp_path / "scan.xml").write_bytes(NMAP_XML.encode())
    (tmp_path / "junk.xml").write_bytes(b"<html>not nmap</html>")
    out = resolve_input(spark, "file", {"path": str(tmp_path), "codec": "nmap"})
    rows = out.collect()
    types = sorted({r.event_type for r in rows})
    assert types == ["error", "nmap_host", "nmap_port",
                     "nmap_scan_metadata", "nmap_traceroute_link"]
    err = [r for r in rows if r.event_type == "error"][0]
    assert "_nmapparsefailure" in err.tags
    port22 = [r for r in rows if r.event_type == "nmap_port" and r.port == 22][0]
    assert port22.service == "ssh" and port22.addr == "192.0.2.10"
