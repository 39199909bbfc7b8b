"""Salted two-phase applyInPandas (skew handling) tests."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from logstash_spark.datapipe.skew import salted_apply_in_pandas, salted_group_count


def test_salted_count_equals_direct(spark):
    n = 5000
    # Zipf-ish skew: ~60% of rows share one key
    df = spark.range(n).select(
        F.when(F.pmod("id", F.lit(10)) < 6, "en")
        .when(F.pmod("id", F.lit(10)) < 8, "de")
        .otherwise(F.concat(F.lit("lang"), F.pmod("id", F.lit(7)).cast("string")))
        .alias("lang"),
        F.col("id").cast("string").alias("text"),
    )
    salted = {
        r["lang"]: r["n"]
        for r in salted_group_count(df, ["lang"], salt_on="text", n_salt=8).collect()
    }
    direct = {r["lang"]: r["cnt"] for r in df.groupBy("lang").agg(
        F.count(F.lit(1)).alias("cnt")).collect()}
    assert salted == direct


def test_salted_custom_reduce(spark):
    df = spark.range(1000).select(
        F.when(F.col("id") < 900, "hot").otherwise("cold").alias("k"),
        F.col("id").cast("string").alias("rid"),
        F.col("id").alias("v"),
    )

    def partial(pdf):
        return pd.DataFrame({
            "k": [pdf["k"].iloc[0]],
            "s": [int(pdf["v"].sum())],
            "mx": [int(pdf["v"].max())],
        })

    def merge(pdf):
        return pd.DataFrame({
            "k": [pdf["k"].iloc[0]],
            "s": [int(pdf["s"].sum())],
            "mx": [int(pdf["mx"].max())],
        })

    out = {
        r["k"]: (r["s"], r["mx"])
        for r in salted_apply_in_pandas(
            df, ["k"], partial, merge,
            partial_schema="k string, s long, mx long",
            final_schema="k string, s long, mx long",
            salt_on="rid", n_salt=4,
        ).collect()
    }
    assert out["hot"] == (sum(range(900)), 899)
    assert out["cold"] == (sum(range(900, 1000)), 999)
