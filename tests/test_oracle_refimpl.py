"""Parity tests for the independent oracle reimplementation.

The literal VALUES oracles (suite_expected.py) are only as good as the
pure-Python XXH64 underneath them — these tests pin it bit-for-bit to
Spark's xxhash64 for every input shape the datapipe operators use, and
guard the regression the oracle originally caught (the default-arg
lambda collapsing all minhash permutations into one).
"""

import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
from xxh64_pure import (  # noqa: E402
    spark_xxhash64_long_intseed,
    spark_xxhash64_str,
    spark_xxhash64_str_intseed,
)


STRINGS = ["", "a", "hello world", "ünïcode tèxt", "x" * 100,
           "the quick brown fox jumps over the lazy dog"]


def test_xxh64_matches_spark_single_arg(spark):
    df = spark.createDataFrame([(s,) for s in STRINGS], "s string")
    got = [r.h for r in df.select(F.xxhash64("s").alias("h")).collect()]
    assert got == [spark_xxhash64_str(s) for s in STRINGS]


def test_xxh64_matches_spark_int_seed_fold(spark):
    """xxhash64(str, lit(int p)) — the minhash permutation shape."""
    df = spark.createDataFrame([(s,) for s in STRINGS], "s string")
    for p in (0, 7, 63):
        got = [r.h for r in df.select(F.xxhash64("s", F.lit(p)).alias("h")).collect()]
        assert got == [spark_xxhash64_str_intseed(s, p) for s in STRINGS]


def test_xxh64_matches_spark_long_col(spark):
    """xxhash64(long_col, lit(int seed)) — the IVF centroid-order shape."""
    vals = [0, 1, -1, 42, 2**40, -(2**40)]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = [r.h for r in df.select(F.xxhash64("v", F.lit(42)).alias("h")).collect()]
    assert got == [spark_xxhash64_long_intseed(v, 42) for v in vals]


def test_minhash_permutations_are_distinct(spark):
    """Regression: `lambda h, p=p:` inside F.transform binds p to the
    ARRAY INDEX (transform calls 2-param lambdas as fn(element, index)),
    silently collapsing all permutations into one hash — near-dup
    recall drops to ~zero. The signature must differ across
    permutations and match the independent reimplementation of the
    affine universal-hash construction."""
    from logstash_spark.datapipe.dedup import (
        _M31,
        _perm_coeffs,
        minhash_signature,
        word_shingles,
    )

    text = "the quick brown fox jumps over the lazy dog"
    df = spark.createDataFrame([(text,)], "text string")
    hs = F.array_distinct(
        F.transform(word_shingles(F.col("text"), 3), lambda s: F.xxhash64(s))
    )
    sig = df.select(minhash_signature(hs, 8).alias("sig")).collect()[0]["sig"]
    assert len(set(sig)) > 1, "all permutations identical — index-bound seed"

    import re as _re
    shingles = []
    ws = _re.split(r"\s+", text)
    for i in range(len(ws) - 2):
        s = " ".join(ws[i:i + 3])
        if s not in shingles:
            shingles.append(s)
    a, b = _perm_coeffs(8)
    h31 = [spark_xxhash64_str(s) % _M31 for s in dict.fromkeys(shingles)]
    expected = [min((a[p] * h + b[p]) % _M31 for h in h31) for p in range(8)]
    assert list(sig) == expected
