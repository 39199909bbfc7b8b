"""URL filtering: suffix semantics, both strategies (plan-literal vs
broadcast join) agreeing, banned terms, and the zero-shuffle plan
contract for the literal strategy."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from logstash_spark.datapipe.urlfilter import (
    LITERAL_CAP, banned_terms_pred, host_suffix_chain, url_filter,
)

URLS = [
    (1, "https://www.bad.example/page?x=1"),
    (2, "http://a.b.bad.example:8080/deep"),
    (3, "https://notbad.example/innocent"),
    (4, "https://bad.example.evil.org/other-tld"),
    (5, "https://fine.org/casino-night"),      # banned term in path
    (6, "https://fine.org/ok"),
    (7, None),
    (8, "not a url at all"),
]
BLOCKED = ["bad.example", "EVIL.org"]
TERMS = ["casino", "xxx"]


def _flags(df):
    return {r[0]: (r["url_blocked"], r["url_block_reason"])
            for r in df.collect()}


def test_url_filter_literal_strategy(spark):
    df = spark.createDataFrame(URLS, "id int, url string")
    got = _flags(url_filter(
        df, blocked_domains=BLOCKED, banned_terms=TERMS))
    assert got[1] == (True, "domain_blocklist")    # www. subdomain
    assert got[2] == (True, "domain_blocklist")    # deep subdomain + port
    assert got[3] == (False, None)                 # suffix, not substring
    assert got[4] == (True, "domain_blocklist")    # evil.org case-folded
    assert got[5] == (True, "banned_term")
    assert got[6] == (False, None)
    assert got[7] == (False, None)                 # null url survives
    assert got[8] == (False, None)


def test_url_filter_join_strategy_matches_literal(spark):
    df = spark.createDataFrame(URLS, "id int, url string")
    bl = spark.createDataFrame([(d,) for d in BLOCKED], "domain string")
    lit = _flags(url_filter(df, blocked_domains=BLOCKED,
                            banned_terms=TERMS))
    join = _flags(url_filter(df, blocked_domains=bl, banned_terms=TERMS))
    assert lit == join


def test_url_filter_drop_mode(spark):
    df = spark.createDataFrame(URLS, "id int, url string")
    kept = url_filter(df, blocked_domains=BLOCKED, banned_terms=TERMS,
                      mode="drop")
    assert sorted(r["id"] for r in kept.collect()) == [3, 6, 7, 8]
    assert kept.columns == ["id", "url"]  # audit columns dropped


def test_url_filter_literal_plan_is_shuffle_free(spark):
    df = spark.createDataFrame(URLS, "id int, url string")
    out = url_filter(df, blocked_domains=BLOCKED, banned_terms=TERMS)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan


def test_url_filter_literal_cap_rejected(spark):
    df = spark.createDataFrame(URLS, "id int, url string")
    too_many = [f"d{i}.com" for i in range(LITERAL_CAP + 1)]
    with pytest.raises(ValueError, match="cap"):
        url_filter(df, blocked_domains=too_many)


def test_url_filter_trailing_dot_host_no_bypass(spark):
    """'example.org.' (absolute DNS form) is the same host — appending
    a dot must not evade the blocklist (review finding), in BOTH
    strategies; dotted blocklist entries ('.bad.example', 'bad.example.')
    normalize identically in both too."""
    df = spark.createDataFrame(
        [(1, "https://bad.example./x"), (2, "https://www.bad.example./y")],
        "id int, url string")
    for bl in (["bad.example"], [".bad.example."]):
        lit = _flags(url_filter(df, blocked_domains=bl))
        bldf = spark.createDataFrame([(d,) for d in bl], "domain string")
        join = _flags(url_filter(df, blocked_domains=bldf))
        assert lit == join == {1: (True, "domain_blocklist"),
                               2: (True, "domain_blocklist")}, bl


def test_host_suffix_chain_shapes(spark):
    df = spark.createDataFrame(
        [("https://A.B.Example.ORG/x",), ("https://org/x",), (None,)],
        "url string")
    got = [r["c"] for r in df.select(
        host_suffix_chain(F.col("url")).alias("c")).collect()]
    assert got[0] == ["org", "example.org", "b.example.org",
                      "a.b.example.org"]
    assert got[1] == ["org"]
    assert got[2] == []


def test_banned_terms_single_pass_and_empty(spark):
    df = spark.createDataFrame(
        [("https://x.com/XXX-zone",), ("https://x.com/ok",)],
        "url string")
    got = [r["b"] for r in df.select(banned_terms_pred(
        F.col("url"), ["xxx"]).alias("b")).collect()]
    assert got == [True, False]
    none = [r["b"] for r in df.select(banned_terms_pred(
        F.col("url"), []).alias("b")).collect()]
    assert none == [False, False]
