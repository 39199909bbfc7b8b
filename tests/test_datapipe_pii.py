"""PII scrub: crafted-corpus expectations, a DuckDB RE2 differential
(the dialect-compatibility contract pii.py documents), and the
zero-Python plan discipline check."""

from __future__ import annotations

import random

import duckdb
import pytest

from logstash_spark.datapipe.pii import (
    PII_KINDS, PII_MASKS, pii_oracle_sql, pii_stats, scrub_pii,
)

DOCS = [
    "contact me at jane.doe+spam@mail.example.co.uk or on 555-867-5309",
    "server 10.0.255.7 and 192.168.1.1 replied; 999.1.2.3 is not an ip",
    "call +1 (415) 555-0133 or 415.555.0134 today",
    "no pii here, just 1234567890 digits and a.b@c (not an email tld)",
    "v1.2.3.4.5 release notes",  # known FP class: 4-octet sub-match
    "",
]


def _scrubbed(spark):
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(DOCS)], "id int, text string")
    return {r["id"]: r for r in scrub_pii(df).collect()}


def test_pii_masks_and_counts_crafted(spark):
    rows = _scrubbed(spark)
    r0 = rows[0]
    assert PII_MASKS["email"] in r0["text"]
    assert PII_MASKS["phone"] in r0["text"]
    assert "jane.doe" not in r0["text"] and "5309" not in r0["text"]
    assert r0["pii_email_count"] == 1 and r0["pii_phone_count"] == 1
    r1 = rows[1]
    assert r1["text"].count(PII_MASKS["ipv4"]) == 2
    assert "999.1.2.3" in r1["text"]  # invalid octet survives
    assert r1["pii_ipv4_count"] == 2
    r2 = rows[2]
    assert r2["pii_phone_count"] == 2
    assert "555-0133" not in r2["text"] and "555.0134" not in r2["text"]
    r3 = rows[3]
    assert r3["pii_total_count"] == 0 and r3["text"] == DOCS[3]
    # dotted >4-tuples ARE a known false-positive (no lookaround in
    # the RE2/Java intersection): a 4-octet sub-match gets masked.
    # Pinned so the behavior is documented, not accidental.
    r4 = rows[4]
    assert r4["pii_ipv4_count"] == 1
    assert PII_MASKS["ipv4"] in r4["text"]
    assert rows[5]["pii_total_count"] == 0


def test_pii_counts_vs_masks_adjacency_divergence(spark):
    """Documented semantics: counts are detections on the ORIGINAL
    text; masks are sequential-scrub outcomes. Adjacent PII tokens can
    diverge in both directions — pinned here."""
    docs = [
        (0, "a@b.co555-123-4567"),   # mask creates a boundary: phone
                                     # masked but counted 0
        (1, "555-123-4567@x.com"),   # email consumes it: phone counted
                                     # 1 but never masked
    ]
    df = spark.createDataFrame(docs, "id int, text string")
    got = {r["id"]: r for r in scrub_pii(df).collect()}
    assert got[0]["pii_phone_count"] == 0
    assert PII_MASKS["phone"] in got[0]["text"]
    assert got[1]["pii_phone_count"] == 1
    assert PII_MASKS["phone"] not in got[1]["text"]
    assert PII_MASKS["email"] in got[1]["text"]


def test_pii_differential_vs_duckdb(spark):
    """Same pattern strings, same answers: Spark (Java regex) vs
    DuckDB (RE2) over a seeded corpus with embedded PII — the
    dialect-compatibility contract that makes the op oracle-gradable."""
    rng = random.Random(42)
    words = ["lorem", "ipsum", "data", "spark", "table", "row"]
    piis = [
        lambda: f"{rng.choice(words)}{rng.randint(1, 99)}@ex{rng.randint(1, 9)}.org",
        lambda: ".".join(str(rng.randint(0, 255)) for _ in range(4)),
        lambda: f"+{rng.randint(1, 99)} {rng.randint(100, 999)}-"
                f"{rng.randint(100, 999)}-{rng.randint(1000, 9999)}",
        lambda: str(rng.randint(10**9, 10**10 - 1)),  # bare digits: no match
    ]
    docs = []
    for i in range(200):
        toks = [rng.choice(words) if rng.random() < 0.7
                else rng.choice(piis)() for _ in range(rng.randint(3, 12))]
        docs.append((i, " ".join(toks)))

    sdf = spark.createDataFrame(docs, "id int, text string")
    got = {r["id"]: r for r in scrub_pii(sdf).collect()}

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs(id int, text varchar)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", docs)
    want = con.sql(
        pii_oracle_sql("docs", extra_cols="id, ")).fetchall()
    assert len(want) == len(docs)
    cols = ["id"] + [f"pii_{k}_count" for k in PII_KINDS] + [
        "pii_total_count", "text"]
    mismatches = [
        (w[0], c, got[w[0]][c], w[j])
        for w in want for j, c in enumerate(cols)
        if got[w[0]][c] != w[j]
    ]
    assert not mismatches, mismatches[:5]


def test_pii_plan_is_pure_jvm(spark):
    """Scale discipline: the scrub plan must contain NO Python eval
    node — it's regexp expressions inside whole-stage codegen."""
    df = spark.createDataFrame([(d,) for d in DOCS], "text string")
    plan = scrub_pii(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_pii_unknown_kind_rejected(spark):
    df = spark.createDataFrame([("x",)], "text string")
    with pytest.raises(ValueError, match="unknown PII kinds"):
        pii_stats(df, kinds=("email", "ssn"))
