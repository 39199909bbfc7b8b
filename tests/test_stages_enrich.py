"""Enrich-family tests: translate / geoip range join (both strategies) /
useragent / cidr / tld — mirroring the reference plugin spec shapes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from logstash_spark.datagen import gen_geo_ranges, gen_ua_rules
from logstash_spark.stages import apply_stage
from logstash_spark.stages.enrich import ip_to_long


def test_ip_to_long(spark):
    df = spark.createDataFrame([("1.2.3.4",), ("255.255.255.255",)], "ip string")
    vals = [r.n for r in df.select(ip_to_long(F.col("ip")).alias("n")).collect()]
    assert vals == [16909060, 4294967295]


def test_translate_inline_dict(spark):
    df = spark.createDataFrame([(1, "a"), (2, "zz")], "id int, code string")
    out = apply_stage(
        df,
        {"translate": {"source": "code", "target": "meaning",
                       "dictionary": {"a": "alpha", "b": "beta"},
                       "fallback": "unknown", "tag_on_miss": "_miss"}},
    )
    rows = {r.id: r for r in out.collect()}
    assert rows[1].meaning == "alpha" and "_miss" not in (rows[1].tags or [])
    assert rows[2].meaning == "unknown" and "_miss" in rows[2].tags


def test_translate_broadcast_df(spark):
    dim = spark.createDataFrame([("x", "ex"), ("y", "why")], "key string, value string")
    df = spark.createDataFrame([(1, "x"), (2, "q")], "id int, code string")
    out = apply_stage(
        df, {"translate": {"source": "code", "target": "word", "dictionary_df": dim}}
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    rows = {r.id: r for r in out.collect()}
    assert rows[1].word == "ex" and rows[2].word is None


def test_translate_multicolumn_dim(spark):
    dim = spark.createDataFrame(
        [("site1.com", "news", 0.9)], "key string, category string, trust double"
    )
    df = spark.createDataFrame([(1, "site1.com")], "id int, domain string")
    out = apply_stage(
        df, {"translate": {"source": "domain", "target": "dominfo", "dictionary_df": dim}}
    )
    r = out.collect()[0]
    assert r.dominfo.category == "news" and r.dominfo.trust == 0.9


@pytest.mark.parametrize("strategy", ["broadcast_range", "binary_search"])
def test_geoip_strategies_agree(spark, strategy):
    ranges = gen_geo_ranges(spark, 50)
    df = spark.createDataFrame(
        [(1, "0.0.1.0"), (2, "128.0.0.1"), (3, None), (4, "bad-ip")],
        "id int, ip string",
    )
    out = apply_stage(
        df, {"geoip": {"source": "ip", "ranges_df": ranges, "strategy": strategy}}
    )
    rows = {r.id: r for r in out.collect()}
    assert rows[1].geo is not None and rows[1].geo.country is not None
    assert rows[2].geo is not None
    assert rows[3].geo is None
    assert rows[4].geo is None and "_geoip_lookup_failure" in rows[4].tags


def test_geoip_strategies_identical_results(spark):
    ranges = gen_geo_ranges(spark, 64)
    ips = [(i, f"{(i * 37) % 224}.{(i * 13) % 256}.{i % 256}.{(i * 7) % 256}") for i in range(64)]
    df = spark.createDataFrame(ips, "id int, ip string")
    a = apply_stage(df, {"geoip": {"source": "ip", "ranges_df": ranges,
                                   "strategy": "broadcast_range"}})
    b = apply_stage(df, {"geoip": {"source": "ip", "ranges_df": ranges,
                                   "strategy": "binary_search"}})
    ra = {r.id: r.geo for r in a.collect()}
    rb = {r.id: r.geo for r in b.collect()}
    assert ra == rb


def test_useragent(spark):
    rules = gen_ua_rules(spark)
    df = spark.createDataFrame(
        [
            (1, "Mozilla/5.0 (X11; Linux x86_64) Firefox/121.0"),
            (2, "Googlebot/2.1 (+http://www.google.com/bot.html)"),
            (3, "weird agent"),
            (4, None),
        ],
        "id int, agent string",
    )
    out = apply_stage(df, {"useragent": {"source": "agent", "rules_df": rules}})
    rows = {r.id: r for r in out.collect()}
    assert rows[1].ua.name == "Firefox"
    assert rows[2].ua.name == "Googlebot"  # priority 0 wins over Chrome-ish patterns
    assert rows[3].ua is None and rows[4].ua is None


def test_cidr(spark):
    df = spark.createDataFrame(
        [(1, "10.1.2.3"), (2, "192.168.1.5"), (3, "8.8.8.8")], "id int, ip string"
    )
    out = apply_stage(
        df,
        {"cidr": {"address": "ip", "network": ["10.0.0.0/8", "192.168.0.0/16"],
                  "add_tag": ["internal"]}},
    )
    rows = {r.id: r for r in out.collect()}
    assert "internal" in rows[1].tags and "internal" in rows[2].tags
    assert "internal" not in (rows[3].tags or [])


def test_tld(spark):
    df = spark.createDataFrame(
        [(1, "https://www.example.co.uk/x"), (2, "https://site.com/y"), (3, "nota url")],
        "id int, url string",
    )
    out = apply_stage(
        df, {"tld": {"source": "url", "suffixes": ["com", "co.uk", "uk"]}}
    )
    rows = {r.id: r for r in out.collect()}
    assert rows[1].tld == "co.uk" and rows[1].domain == "www.example.co.uk"
    assert rows[2].tld == "com"
    assert rows[3].tld is None


def test_translate_dictionary_file_formats(tmp_path):
    """YAML (minimal fallback parser) / CSV / JSON dictionary files all
    load to the same dict (translate.rb file-dictionary surface)."""
    from logstash_spark.stages.enrich import load_dictionary_file

    expected = {"click": "engagement", "purchase": "revenue"}
    (tmp_path / "d.json").write_text('{"click": "engagement", "purchase": "revenue"}')
    (tmp_path / "d.csv").write_text("click,engagement\npurchase,revenue\n")
    (tmp_path / "d.yml").write_text(
        "# categories\nclick: engagement\n'purchase': 'revenue'\n"
    )
    for name in ("d.json", "d.csv", "d.yml"):
        assert load_dictionary_file(str(tmp_path / name)) == expected, name
    import pytest

    with pytest.raises(ValueError):
        load_dictionary_file(str(tmp_path / "d.txt"))


def test_ruby_code_string_rejected(spark):
    from logstash_spark.stages.base import apply_stage
    import pytest

    df = spark.createDataFrame([(1, "x")], "id int, message string")
    with pytest.raises(ValueError, match="callable"):
        apply_stage(df, {"ruby": {"code": 'event.set("a", 1)'}})


def test_ip_to_long_malformed_never_aborts(spark):
    """ANSI-on session: numeric-but-huge segments must yield null, not
    ARITHMETIC_OVERFLOW; wrong octet counts and out-of-range octets are
    lookup misses (null), never job aborts."""
    df = spark.createDataFrame(
        [("99999999999999999.1.1.1",), ("1.2.3",), ("1.2.3.4.5",),
         ("256.1.1.1",), ("a.b.c.d",), ("10.0.0.1",), (None,)],
        "ip string",
    )
    vals = [r.n for r in df.select(ip_to_long(F.col("ip")).alias("n")).collect()]
    assert vals == [None, None, None, None, None, 167772161, None]
