"""Skew handling for stateful (non-algebraic) aggregations.

Catalyst already does partial→final (map-side combine) for algebraic
aggregates, and AQE splits skewed JOIN partitions — but a
``groupBy(key).applyInPandas(fn)`` ships EVERY row of a key to one
task. With Zipf-skewed keys (lang: en≈55%, domains: rank^-1.2 — the
north rule's named skew case) the hot key's task dominates the stage.

``salted_apply_in_pandas`` is the classic two-phase rewrite for
DECOMPOSABLE reductions: phase 1 reduces (key, salt) sub-groups in
parallel — the hot key fans out over ``n_salt`` tasks — and phase 2
merges the (at most ``n_salt``) partials per key. The salt is
deterministic (xxhash64 of a caller-named column), so reruns/resumes
produce identical sub-groups (same requirement as drop-sampling,
SURVEY §7 determinism note).

Reference counterpart: none — logstash-filter-aggregate requires
workers=1 and has no skew story (aggregate.rb); this is the piece the
Spark re-architecture adds (SURVEY §4 "New physical design").
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_apply_in_pandas(
    df: DataFrame,
    key_cols: list[str],
    partial_fn,
    merge_fn,
    partial_schema: str,
    final_schema: str,
    salt_on: str,
    n_salt: int = 16,
) -> DataFrame:
    """Two-phase grouped-pandas reduce with salted phase 1.

    ``partial_fn(pdf) -> pdf`` reduces one (key, salt) sub-group to one
    (or few) partial rows matching ``partial_schema`` (must include the
    key columns). ``merge_fn(pdf) -> pdf`` combines a key's partials
    into final rows matching ``final_schema``. ``salt_on`` names a
    high-cardinality column whose hash spreads the hot key.
    """
    salt = F.pmod(F.xxhash64(F.col(salt_on)), F.lit(n_salt)).alias("__salt")
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*key_cols, "__salt")
        .applyInPandas(partial_fn, schema=partial_schema)
    )
    return partial.groupBy(*key_cols).applyInPandas(merge_fn, schema=final_schema)


def salted_group_count(
    df: DataFrame, key_cols: list[str], salt_on: str, n_salt: int = 16
) -> DataFrame:
    """Salted count/sum demo used by tests and the driver suite — the
    same shape (count + token sum per skewed key) expressed through the
    two-phase machinery so the suite exercises it end-to-end."""

    def partial(pdf):
        first = pdf.iloc[0]
        out = {k: [first[k]] for k in key_cols}
        out["n"] = [len(pdf)]
        return pd.DataFrame(out)

    def merge(pdf):
        first = pdf.iloc[0]
        out = {k: [first[k]] for k in key_cols}
        out["n"] = [int(pdf["n"].sum())]
        return pd.DataFrame(out)

    # derive key types from the input — hardcoding string breaks the
    # Arrow conversion the moment a key column is long/int/date
    dtypes = dict(df.dtypes)
    keys_ddl = ", ".join(f"{k} {dtypes[k]}" for k in key_cols)
    return salted_apply_in_pandas(
        df, key_cols, partial, merge,
        partial_schema=f"{keys_ddl}, n long",
        final_schema=f"{keys_ddl}, n long",
        salt_on=salt_on, n_salt=n_salt,
    )
