"""Byte-differential gate for the JVM-native extractor lowering.

Round-5 deliverable (VERDICT r4 "Next round #1"): the Catalyst chain in
``extract.extract_text_column`` must be byte-identical to the frozen
Python oracle ``extract_text`` on every input — natively where the
guard passes, via the guard-routed oracle fallback everywhere else.

Three layers:
  1. the supported-entity table is asserted against html.unescape
     itself (the table cannot drift from the oracle);
  2. a hand-built adversarial corpus hits every guard class (invalid
     UTF-8, semicolon-less entities, prefix entities, numeric refs
     outside the table, NUL sentinel, nested drop-tags, exotic
     whitespace, CJK/emoji) and every Java-vs-Python regex alignment
     choice ((?iu), UNIX_LINES, the explicit \\s class);
  3. hypothesis fuzz over html-ish strings, compared through one Spark
     job per batch.

The lowering is NOT the default engine path: the round-5 extractor
study (BASELINE.md) measured it at ~8-10 MB/s/core vs ~20-35 MB/s/core
for the CPython oracle over Arrow, so ``mode="python"`` stays default
and this suite keeps the alternative honest for deployments that need
a Python-worker-free plan.
"""

from __future__ import annotations

import html as _html

import pytest
from pyspark.sql import functions as F

from logstash_spark.datagen import gen_pages
from logstash_spark.extract import (
    _AMP_FORMS,
    _ENTITIES,
    _NUMERIC,
    extract_guard,
    extract_text,
    extract_text_column,
    extract_text_native,
)

ADVERSARIAL: list[bytes | None] = [
    None,
    b"",
    b"plain text no tags",
    b"<p>a&amp;lt;b</p>",                # single-pass semantics: stays &lt;
    b"<p>&AMP;amp;</p>",                 # uppercase amp chain
    b"<p>&ampx &copy2026 &lt </p>",      # semicolon-less legacy names -> guard
    b"<p>&zzz; &#9999; &#x1F600; &#128;</p>",  # unknown/unsupported refs -> guard
    b"<p>&amp;#38; &#38;amp;</p>",
    b"\xff\xfehello",                    # invalid UTF-8 -> guard
    b"<p>\xe2\x82</p>",                  # truncated multi-byte -> guard
    b"<SCRIPT>x</SCRIPT><P>Hi</P>",
    b"<script >a</script\t>b",
    b"<script=weird>x</script>ok",       # \b after tag name, non-word follower
    b"<div>a\x00b</div>",                # NUL sentinel -> guard
    b"<p>a  b\tc\r\nd</p>",
    b"<p>\xc2\xa0 padded \xc2\xa0</p>",  # &nbsp;-class ws is not collapsed
    b"<p>x\xe2\x80\xa8y</p>",            # U+2028: Java line-terminator trap
    b"line1<br/>line2<BR>line3",
    b"<!-- multi\nline\ncomment --><p>kept</p>",
    b"<!DOCTYPE html PUBLIC 'x'><p>t</p>",
    b"<p title='a>b'>odd</p>",
    b"<pre>  spaced  </pre>",
    b"<param>notblock</param>",          # 'p' alternative must not eat 'param'
    b"<scripts>notscript</scripts>",
    b"<p>&quot;q&quot; &apos;a&apos; &nbsp;nb</p>",
    b"<p>&#39;x&#x27;y&#X27;z</p>",
    b"<p>\xc3\xa9\xc3\xa8</p>",
    "<p>数据 ウェブ 🚀</p>".encode(),
    b"<noscript\x0b>weirdws</noscript>",
    b"<style>p{}</style",                # unclosed drop tag
    b"&lt;script&gt;alert()&lt;/script&gt;",
    b"<p>&eacute;&Eacute;</p>",          # Eacute not in table -> guard
    b"<title>T</title>no body",
    # cross-nested drop tags: per-tag passes would diverge from the
    # oracle's single alternation scan -> must be guard-routed
    b"<style>A<script>B</style>C</script>D",
    "<ſcript>fold</ſcript>x".encode(),   # U+017F case-fold probe
    b"<p>&#32;&#9;&#10;spaced</p>",      # ws-producing numeric refs
    b"<p>end &amp",                      # trailing semicolon-less amp
    # deep-fuzz counterexample (seed-7 doc 13): '</ſcript>' closes
    # '<script>' under Python's fold-aware (?i) backreference but not
    # Java's (?iu) — the raw-side non-ASCII-in-tag guard must catch it
    b"b&#38;1a<title>1&#x27;<noscript><script>\xf0\x9f\x9a\x80--><script>"
    b"<!DOCTYPE html>&<script>\r\xc2\xa0<br/><!--<script><SCRIPT a=1>"
    b"&Eacute;&#38;<p><!--<!--</\xc5\xbfcript>&#38;</script>&#x27; </\xc5\xbfcript>",
]


def test_entity_table_matches_html_unescape():
    for body, ch in {**_ENTITIES, **_NUMERIC}.items():
        assert _html.unescape(f"&{body};") == ch, body
    for body in _AMP_FORMS:
        assert _html.unescape(f"&{body};") == "&", body


def _differential(spark, payloads: list[bytes | None]):
    rows = [(i, b) for i, b in enumerate(payloads)]
    df = spark.createDataFrame(rows, "id long, html binary")
    out = df.select(
        "id",
        "html",
        extract_text_column(F.col("html"), mode="auto").alias("auto"),
        extract_text_native(F.col("html")).alias("native"),
        extract_guard(F.col("html")).alias("guard"),
    ).collect()
    assert len(out) == len(payloads)
    for r in out:
        oracle = extract_text(bytes(r["html"]) if r["html"] is not None else None)
        assert r["auto"] == oracle, (r["id"], r["auto"], oracle)
        if r["guard"] is False:
            # native must be byte-identical wherever the guard passes
            assert r["native"] == oracle, (r["id"], r["native"], oracle)
    return out


def test_adversarial_differential(spark):
    out = _differential(spark, ADVERSARIAL)
    flagged = {r["id"] for r in out if r["guard"]}
    # the guard must actually fire on the out-of-domain classes
    must_flag = {
        ADVERSARIAL.index(b"<p>&ampx &copy2026 &lt </p>"),
        ADVERSARIAL.index(b"<p>&zzz; &#9999; &#x1F600; &#128;</p>"),
        ADVERSARIAL.index(b"\xff\xfehello"),
        ADVERSARIAL.index(b"<div>a\x00b</div>"),
        ADVERSARIAL.index(b"<p>&eacute;&Eacute;</p>"),
        ADVERSARIAL.index(b"<p>end &amp"),
    }
    assert must_flag <= flagged


def test_corpus_differential_and_zero_guard_rate(spark):
    pages = gen_pages(spark, 400).cache()
    agg = pages.select(
        (extract_text_column(F.col("html"), mode="auto") == F.col("text")).alias("eq_auto"),
        (extract_text_native(F.col("html")) == F.col("text")).alias("eq_native"),
        extract_guard(F.col("html")).alias("guard"),
    ).agg(
        F.sum(F.when(~F.col("eq_auto"), 1).otherwise(0)).alias("bad_auto"),
        F.sum(F.when(~F.col("eq_native"), 1).otherwise(0)).alias("bad_native"),
        F.sum(F.when(F.col("guard"), 1).otherwise(0)).alias("guarded"),
    ).collect()[0]
    assert agg["bad_auto"] == 0
    # the whole synthetic Common-Crawl corpus is in the native fast path
    assert agg["guarded"] == 0
    assert agg["bad_native"] == 0


def test_stage_mode_conf(spark):
    from logstash_spark.stages.base import apply_stage

    pages = gen_pages(spark, 30).cache()
    for mode in ("python", "auto", "native"):
        out = apply_stage(
            pages.drop("text"),
            {"extract_text": {"source": "html", "target": "t2", "mode": mode}},
        )
        got = {r["url"]: r["t2"] for r in out.select("url", "t2").collect()}
        want = {r["url"]: r["text"] for r in pages.select("url", "text").collect()}
        assert got == want, mode
    with pytest.raises(Exception):
        apply_stage(
            pages, {"extract_text": {"source": "html", "mode": "bogus"}}
        ).collect()


def test_hypothesis_fuzz_differential(spark):
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    tags = st.sampled_from(
        ["p", "div", "script", "style", "SCRIPT", "pre", "param", "title",
         "br/", "\u017fcript", "a href='x'", "!DOCTYPE html", "!--", "x"]
    )
    token = st.one_of(
        st.sampled_from(
            list("abc <>&;#x019\t\n\r\x0b\xa0\xe9\u6570\U0001f680\x00\x85 ")
            + ["&amp;", "&lt;", "&ampx", "&copy", "&#38;", "&#999;",
               "&#x27;", "&nbsp;", "<!--", "-->", "</script>", "<script>",
               "</style>", "  ", "word "]
        ),
        tags.map(lambda t: f"<{t}>"),
        tags.map(lambda t: f"</{t}>"),
    )
    docs = st.lists(token, max_size=24).map("".join)

    batch: list[bytes] = []

    @settings(
        max_examples=300,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(docs)
    def _collect(doc: str):
        batch.append(doc.encode("utf-8"))

    _collect()
    # one Spark job over the whole fuzz corpus (per-example jobs would
    # take minutes); _differential asserts auto==oracle everywhere and
    # native==oracle wherever the guard passes
    _differential(spark, batch)
