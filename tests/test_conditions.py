"""Conditional-expression parity tests.

Mirrors logstash-core EventConditionTest / java_pipeline_spec.rb
conditional-routing cases: tiny in-memory frames, full operator surface.
"""

from __future__ import annotations

import pytest

from logstash_spark.conditions import compile_condition


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [
            (1, "en", 200, "GET /index.html", ["ok", "web"], None),
            (2, "de", 404, "POST /submit", ["err"], 1.5),
            (3, "und", 500, None, [], 2.0),
            (4, "en", 301, "GET /about", None, None),
        ],
        "id int, lang string, status int, request string, tags array<string>, score double",
    )


def ids(df, cond):
    return sorted(r.id for r in df.filter(compile_condition(cond, df)).collect())


def test_eq_neq(df):
    assert ids(df, "[lang] == 'en'") == [1, 4]
    assert ids(df, "[lang] != 'en'") == [2, 3]


def test_compare_numeric(df):
    assert ids(df, "[status] >= 400") == [2, 3]
    assert ids(df, "[status] < 300") == [1]
    assert ids(df, "[score] > 1.6") == [3]


def test_regex(df):
    assert ids(df, "[request] =~ /^GET/") == [1, 4]
    assert ids(df, "[request] !~ /^GET/") == [2]


def test_in_list(df):
    assert ids(df, "[lang] in ['en', 'de']") == [1, 2, 4]
    assert ids(df, "[lang] not in ['en', 'de']") == [3]


def test_in_array_field(df):
    assert ids(df, "'err' in [tags]") == [2]
    assert ids(df, "'ok' in [tags]") == [1]


def test_in_string_field(df):
    assert ids(df, "'index' in [request]") == [1]


def test_boolean_combinators(df):
    assert ids(df, "[lang] == 'en' and [status] == 200") == [1]
    assert ids(df, "[lang] == 'de' or [status] == 301") == [2, 4]
    assert ids(df, "!([lang] == 'en')") == [2, 3]
    assert ids(df, "[lang] == 'en' xor [status] == 200") == [4]
    assert ids(df, "[lang] == 'en' nand [status] == 200") == [2, 3, 4]


def test_truthiness(df):
    assert ids(df, "[request]") == [1, 2, 4]
    assert ids(df, "![request]") == [3]


def test_precedence_and_parens(df):
    assert ids(df, "[status] == 200 or [status] == 404 and [lang] == 'de'") == [1, 2]
    assert ids(df, "([status] == 200 or [status] == 404) and [lang] == 'de'") == [2]


def test_string_field_numeric_coercion(spark):
    df2 = spark.createDataFrame([(1, "42"), (2, "7")], "id int, n string")
    assert sorted(
        r.id for r in df2.filter(compile_condition("[n] > 10", df2)).collect()
    ) == [1]
