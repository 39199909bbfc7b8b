"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship parse→enrich pipeline (the Spark
re-expression of Logstash's `apache` benchmark case: extract + grok-ish
url parse + date + geoip + useragent + translate + fingerprint) over a
pages table derived deterministically from /root/testdata/sf0.001.

``queries()`` / ``oracle_sql()`` expose the operator suite in
logstash_spark/suite.py — one entry per implemented operator family
from SURVEY.md §2, each with a DuckDB oracle where SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF0001 = "/root/testdata/sf0.001"


def pages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive a deterministic Common-Crawl-style pages table
    (url, warc_ts, html binary, text, lang — BASELINE.json input_hint)
    from the driver's documents table. The engine re-extracts ``text``
    from ``html`` and must reproduce it byte-for-byte."""
    from logstash_spark.datagen import TLDS

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rank = F.pmod(F.col("doc_id"), F.lit(1000)).cast("int")
    tld = F.element_at(
        F.array(*[F.lit(t) for t in TLDS]),
        (F.pmod(rank, F.lit(len(TLDS))) + 1).cast("int"),
    )
    url = F.concat(
        F.lit("https://site"), F.lpad(rank.cast("string"), 4, "0"), F.lit("."), tld,
        F.lit("/doc/"), F.col("doc_id").cast("string"),
    )
    html = F.encode(
        F.concat(
            F.lit("<html><head><title>doc "), F.col("doc_id").cast("string"),
            F.lit("</title></head><body><p>"), F.col("text"),
            F.lit("</p></body></html>"),
        ),
        "UTF-8",
    )
    return docs.select(
        url.alias("url"),
        F.timestamp_seconds(F.lit(1767225600) + F.col("doc_id")).alias("warc_ts"),
        html.alias("html"),
        F.col("text"),
        F.col("lang"),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship parse→enrich→route chain on sf0.001-derived pages."""
    from logstash_spark.flagship import SINK_SELECT, flagship_df

    pages = pages_from_documents(spark, SF0001)
    out = flagship_df(spark, pages)
    return out.select(*[c for c in SINK_SELECT if c in out.columns])


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from logstash_spark.suite import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from logstash_spark.suite import ORACLES

    return dict(ORACLES)
