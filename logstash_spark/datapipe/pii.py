"""PII detection and redaction over document text — the standard
training-data scrub (emails, IPv4 addresses, phone numbers) that
Dolma/C4-class pipelines run before publishing a corpus.

Spark-first shape: the whole op is a chain of JVM-side
``regexp_extract_all`` / ``regexp_replace`` expressions — zero Python
at runtime, zero shuffle, embarrassingly parallel. At 100 TB this is
a pure map stage that rides whole-stage codegen; the only cost is the
regex automaton per byte, the same cost class as the extractor study
(PLANS.md round-5 extractor part 2).

Dialect discipline: every pattern below is simultaneously valid Java
regex (Spark) and RE2 (DuckDB), so each op has a one-line SQL oracle —
no lookaround, no backrefs, no possessive quantifiers; ``\\b`` and
non-capturing groups only. ``pii_oracle_sql`` emits the DuckDB side,
and ``tests/test_datapipe_pii.py`` runs the differential on a crafted
corpus (the synthetic documents table contains no PII by construction,
so the fixtures embed their own).

Reference anchor: logstash has no in-text PII scrub (its
fingerprint/anonymize filters hash whole FIELDS — ``stages/mutate.py``
FingerprintStage); this op is part of the training-data-pipeline
family the build brief adds beyond the reference surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Scrub order matters: emails can embed digit runs a later pattern
# might chew on, so they go first; IPv4 before phone is arbitrary
# (octets cap at 3 digits, phones need a 4-digit tail — no overlap)
# but FIXED so output is deterministic and the oracle can mirror it.
PII_KINDS = ("email", "ipv4", "phone")

PII_PATTERNS: dict[str, str] = {
    # local part per common practice (not full RFC 5321 — quoted
    # locals are vanishingly rare in web text and RE2 can't do the
    # nested quoting anyway); domain labels may not start/end with '-'
    "email": (
        r"[A-Za-z0-9._%+-]+@"
        r"(?:[A-Za-z0-9](?:[A-Za-z0-9-]*[A-Za-z0-9])?\.)+"
        r"[A-Za-z]{2,}"
    ),
    # exact octet range 0-255, word-bounded so 999.1.1.1 never
    # matches. KNOWN false-positive class (asserted in tests): a
    # dotted run of >4 small numbers — a semver-ish '1.2.3.4.5' —
    # yields a 4-octet sub-match ('\b' holds after a dot), because
    # excluding it needs lookaround, which RE2 lacks; Dolma-class
    # scrubbers share this behavior. Both engines agree on the match
    # (leftmost-first, non-overlapping), so the oracle contract holds.
    "ipv4": (
        r"\b(?:(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])\.){3}"
        r"(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])\b"
    ),
    # conservative NANP-ish with optional country code: demands BOTH
    # group separators so bare 10-digit integers and timestamps are
    # not eaten; +CC (XXX) XXX-XXXX / XXX.XXX.XXXX / XXX XXX XXXX.
    # Start anchor is (?:\+|\b) because \b cannot assert before '+'
    # when it follows whitespace (both dialects agree on this)
    "phone": (
        r"(?:\+|\b)(?:[0-9]{1,3}[-. ])?"
        r"\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}\b"
    ),
}

# Dolma-style sentinel masks: unambiguous, regex-inert (no $ or \ so
# the replacement string is literal in BOTH Java and RE2 dialects)
PII_MASKS: dict[str, str] = {
    "email": "|||EMAIL_ADDRESS|||",
    "ipv4": "|||IP_ADDRESS|||",
    "phone": "|||PHONE_NUMBER|||",
}


def _check_kinds(kinds) -> tuple[str, ...]:
    kinds = tuple(kinds)
    unknown = [k for k in kinds if k not in PII_PATTERNS]
    if unknown:
        raise ValueError(
            f"unknown PII kinds {unknown}; available: {list(PII_KINDS)}")
    return kinds


def pii_count_col(text: Column, kind: str) -> Column:
    """Match count of one PII kind in ``text`` (JVM-side)."""
    return F.size(F.regexp_extract_all(text, F.lit(PII_PATTERNS[kind]), 0))


def pii_scrub_col(text: Column, kinds=PII_KINDS) -> Column:
    """``text`` with every PII match replaced by its sentinel mask,
    applied in the canonical PII_KINDS order."""
    out = text
    for k in _check_kinds(kinds):
        out = F.regexp_replace(out, PII_PATTERNS[k], PII_MASKS[k])
    return out


def pii_stats(
    df: DataFrame, text_col: str = "text", kinds=PII_KINDS,
) -> DataFrame:
    """Per-document PII counts: one ``pii_<kind>_count`` int column per
    kind plus ``pii_total_count``. Counts are measured on the ORIGINAL
    text (before any scrub)."""
    kinds = _check_kinds(kinds)
    text = F.col(text_col)
    for k in kinds:
        df = df.withColumn(f"pii_{k}_count", pii_count_col(text, k))
    return df.withColumn(
        "pii_total_count",
        sum((F.col(f"pii_{k}_count") for k in kinds), F.lit(0)))


def scrub_pii(
    df: DataFrame, text_col: str = "text", kinds=PII_KINDS,
    out_col: str | None = None, with_counts: bool = True,
) -> DataFrame:
    """Redact PII in ``text_col`` (into ``out_col``, default in-place)
    and, with ``with_counts``, record per-kind match counts measured on
    the pre-scrub text — the audit trail a corpus release wants.

    Count semantics: ``pii_<kind>_count`` are DETECTOR counts on the
    ORIGINAL text; the masks are the outcome of the sequential scrub.
    At adjacency boundaries the two can differ in either direction
    (asserted in tests): an earlier mask can create a word boundary
    that lets a later pattern match text it did not match originally,
    and an earlier pattern can consume characters a later detector
    counted. Audits reconciling masks against counts must compare
    per-kind counts to pre-scrub detections, not to sentinel
    occurrences."""
    if with_counts:
        df = pii_stats(df, text_col, kinds)
    return df.withColumn(
        out_col or text_col, pii_scrub_col(F.col(text_col), kinds))


def pii_oracle_sql(
    table: str, text_col: str = "text", kinds=PII_KINDS,
    extra_cols: str = "",
) -> str:
    """DuckDB SQL computing the same counts + scrubbed text (RE2 runs
    the identical pattern strings; 'g' = global replace like Java's
    regexp_replace). For differential tests."""
    kinds = _check_kinds(kinds)
    scrub = text_col
    for k in kinds:
        scrub = (f"regexp_replace({scrub}, '{PII_PATTERNS[k]}', "
                 f"'{PII_MASKS[k]}', 'g')")
    counts = ", ".join(
        f"len(regexp_extract_all({text_col}, '{PII_PATTERNS[k]}')) "
        f"AS pii_{k}_count" for k in kinds)
    total = " + ".join(
        f"len(regexp_extract_all({text_col}, '{PII_PATTERNS[k]}'))"
        for k in kinds)
    return (f"SELECT {extra_cols}{counts}, {total} AS pii_total_count, "
            f"{scrub} AS {text_col} FROM {table}")
