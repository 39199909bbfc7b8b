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
    # row 3 has request=NULL: nil =~ /x/ is false, so nil !~ /x/ is
    # TRUE (Ruby / RegexEq-negate) — three-valued ~null would drop it
    assert ids(df, "[request] !~ /^GET/") == [2, 3]


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
    # the LSCL treetop grammar folds boolean operators LEFT-ASSOCIATIVELY
    # with NO precedence: `a or b and c` is `(a or b) and c`, unlike
    # conventional and-binds-tighter parsing
    assert ids(df, "[status] == 200 or [status] == 404 and [lang] == 'de'") == [2]
    assert ids(df, "([status] == 200 or [status] == 404) and [lang] == 'de'") == [2]
    assert ids(df, "[lang] == 'de' and [status] == 404 or [status] == 301") == [2, 4]


def test_null_discipline_covers_both_branches(df):
    """EventCondition nil semantics: a nil comparison is plain false,
    so its negation is TRUE — a row with a missing field must appear in
    exactly ONE branch of an if/else, never in neither."""
    # request is NULL on row 3
    then_ids = ids(df, "[request] == 'GET /about'")
    else_ids = ids(df, "!([request] == 'GET /about')")
    assert then_ids == [4]
    assert else_ids == [1, 2, 3]  # the null row lands in the else branch
    assert ids(df, "[request] != 'GET /about'") == [1, 2, 3]
    assert ids(df, "[request] not in ['GET /about']") == [1, 2, 3]
    # score is NULL on rows 1 and 4
    assert ids(df, "[score] == 1.5 nand [lang] == 'de'") == [1, 3, 4]
    assert ids(df, "[score] == 1.5 xor [lang] == 'en'") == [1, 2, 4]


def test_truthiness_empty_and_false_strings(spark):
    """EventCondition.Compiler#valueIsTruthy: null, the empty string,
    and the string 'false' are falsy; 0 is truthy."""
    df2 = spark.createDataFrame(
        [(1, "x", 0), (2, "", 5), (3, "false", 6), (4, None, 7)],
        "id int, s string, n int")
    assert sorted(r.id for r in df2.filter(
        compile_condition("[s]", df2)).collect()) == [1]
    assert sorted(r.id for r in df2.filter(
        compile_condition("![s]", df2)).collect()) == [2, 3, 4]
    assert sorted(r.id for r in df2.filter(
        compile_condition("[n]", df2)).collect()) == [1, 2, 3, 4]


def test_nested_field_coercion_and_dtype(spark):
    """The string-vs-number try_cast guard must resolve NESTED leaf
    types — [a][b] against a number literal on a string leaf would
    otherwise hit an ANSI cast abort on non-numeric rows."""
    df3 = spark.createDataFrame(
        [(1, ("42",)), (2, ("abc",)), (3, ("7",))],
        "id int, a struct<b:string>")
    assert sorted(r.id for r in df3.filter(
        compile_condition("[a][b] > 10", df3)).collect()) == [1]


def test_string_field_numeric_coercion(spark):
    df2 = spark.createDataFrame([(1, "42"), (2, "7")], "id int, n string")
    assert sorted(
        r.id for r in df2.filter(compile_condition("[n] > 10", df2)).collect()
    ) == [1]


def test_missing_field_condition_is_nil_not_analysis_error(spark):
    """Review finding: a ref absent from the schema must evaluate as
    nil (reference: route to the else branch), not UNRESOLVED_COLUMN.
    The module's documented `[missing] != 'debug'` drop-debug idiom
    depends on it."""
    from logstash_spark.conditions import compile_condition

    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, msg string")
    kept = df.filter(compile_condition("[level] != 'debug'", df)).count()
    assert kept == 2                         # nil != 'debug' is TRUE
    assert df.filter(compile_condition("[level] == 'debug'", df)).count() == 0
    assert df.filter(compile_condition("[level]", df)).count() == 0
    assert df.filter(compile_condition("![level]", df)).count() == 2
    assert df.filter(compile_condition(
        "'x' in [level]", df)).count() == 0
    assert df.filter(compile_condition(
        "[msg] == 'a' and [nope][deep] == 'x'", df)).count() == 0


def test_in_on_map_field_checks_keys(spark):
    """Ruby Hash#include? checks KEYS: 'k' in [@metadata]."""
    from logstash_spark.conditions import compile_condition

    df = spark.createDataFrame(
        [(1, {"token": "t"}), (2, {"other": "x"})],
        "id int, _meta map<string,string>")
    got = [r["id"] for r in df.filter(
        compile_condition("'token' in [@metadata]", df)).collect()]
    assert got == [1]
    got2 = [r["id"] for r in df.filter(
        compile_condition("'token' not in [@metadata]", df)).collect()]
    assert got2 == [2]


def test_regex_match_rejects_field_rhs(spark):
    """The LSCL grammar only allows string/regexp on the right of =~;
    a field ref used to become a character-class pattern silently."""
    import pytest as _pytest

    from logstash_spark.conditions import compile_condition

    df = spark.createDataFrame([("x", "y")], "message string, pat string")
    with _pytest.raises(ValueError, match="right operand"):
        compile_condition("[message] =~ [pat]", df)


def test_escaped_quotes_in_condition_strings(spark):
    """LSCL accepts \\" inside double-quoted strings (and \\' in
    single); the tokenizer must not stop at the inner quote."""
    from logstash_spark.conditions import compile_condition

    df = spark.createDataFrame(
        [(1, 'say "hi"'), (2, "plain")], "id int, msg string")
    got = [r["id"] for r in df.filter(compile_condition(
        '[msg] == "say \\"hi\\""', df)).collect()]
    assert got == [1]
    # other backslashes stay verbatim (support_escapes=false stance)
    df2 = spark.createDataFrame([(1, "a\\nb")], "id int, msg string")
    assert df2.filter(compile_condition(
        '[msg] == "a\\nb"', df2)).count() == 1
