

def test_grok_unsupported_re_construct_message():
    """ADVICE r4: a regex construct Python's re cannot compile surfaces
    as a dialect-level ValueError, not a raw sre error."""
    import pytest
    from logstash_spark.grok import compile_grok

    with pytest.raises(ValueError, match="unsupported by this Python re"):
        compile_grok(r"(?<name>\p{L}+)", {})


def test_grok_zero_capture_pattern_is_match_test():
    """A pure match-test pattern (no captures at all) must not crash
    the batch executor — grok.rb configs use it for tagging."""
    import pandas as pd
    from logstash_spark.grok import compile_grok, grok_extract_batch

    cg = compile_grok("%{IPV4}")
    out = grok_extract_batch(pd.Series(["1.2.3.4", "nope", None]), [cg])
    assert list(out["_matched"]) == [True, False, False]


def test_grok_int_conversion_truncates_floats():
    """grok.rb :int is Ruby to_i — '1.5' → 1 (truncate), exact for
    integer strings; non-numeric → null (documented try_ deviation).
    One dirty row must never abort the Arrow batch."""
    import pandas as pd
    from logstash_spark.grok import compile_grok, grok_extract_batch

    cg = compile_grok("%{NUMBER:x:int}")
    out = grok_extract_batch(pd.Series(["1.5", "42", "-3.9"]), [cg])
    assert list(out["x"]) == [1, 42, -3]
    # exact at int64 edge (no float round-trip for integral strings)
    big = "9223372036854775807"
    out = grok_extract_batch(pd.Series([big]), [cg])
    assert out.loc[0, "x"] == 9223372036854775807
    # int64-max MIXED with a float in the same batch: the float hop
    # made this unsafe-castable and aborted the whole Arrow batch
    out = grok_extract_batch(pd.Series([big, "1.5"]), [cg])
    assert list(out["x"]) == [9223372036854775807, 1]
    # exact past 2**53 even when the batch has a float (no float hop)
    out = grok_extract_batch(pd.Series(["9007199254740993", "2.5"]), [cg])
    assert list(out["x"]) == [9007199254740993, 2]
    # out-of-int64-range → null, batch survives (Ruby bignum cannot
    # live in a long column — try_ discipline)
    out = grok_extract_batch(
        pd.Series(["99999999999999999999", "7", "-1.5"]), [cg])
    assert pd.isna(out.loc[0, "x"])
    assert list(out["x"][1:]) == [7, -1]


def test_grok_all_optional_captures_still_match():
    """A row that MATCHES a pattern whose captures are all optional-
    and-absent is a match (no _grokparsefailure), grok.rb parity."""
    import pandas as pd
    from logstash_spark.grok import compile_grok, grok_extract_batch

    cg = compile_grok(r"foo(?: %{WORD:w})?")
    out = grok_extract_batch(pd.Series(["foo", "foo bar", "zzz"]), [cg])
    assert list(out["_matched"]) == [True, True, False]
    assert out.loc[1, "w"] == "bar" and pd.isna(out.loc[0, "w"])


def test_grok_inline_named_captures_registered():
    """Inline named captures — Oniguruma (?<name>…) in user patterns
    and (?P<name>…) inside library patterns (RAILS family) — are output
    fields exactly like %{X:name} refs."""
    import pandas as pd
    from logstash_spark.grok import compile_grok, grok_extract_batch, lower_multi_capture

    cg = compile_grok(r"(?<queue_id>[0-9A-F]{10,11}):")
    assert "queue_id" in cg.fields
    out = grok_extract_batch(pd.Series(["BEF25A72965: ok"]), [cg])
    assert out.loc[0, "queue_id"] == "BEF25A72965"
    # the library RAILS controller pattern carries inline captures
    cg = compile_grok("%{RCONTROLLER}")
    out = grok_extract_batch(pd.Series(["Users#show"]), [cg])
    assert out.loc[0, "controller"] == "Users" and out.loc[0, "action"] == "show"
    # and the native lowering handles the translated named group
    low = lower_multi_capture(r"id=(?<qid>\w+)")
    assert low is not None and low[1][0][0] == "qid"
    # lookbehind is NOT a named group — must survive translation
    cg = compile_grok(r"(?<=-)%{WORD:w}")
    out = grok_extract_batch(pd.Series(["-abc"]), [cg])
    assert out.loc[0, "w"] == "abc"


def test_grok_int_uint64_range_goes_null_not_abort():
    """An integer capture in [2**63, 2**64) makes pandas to_numeric
    return uint64; the safe-cast to Int64 raises — the conversion must
    fall to the exact-prefix path and null the out-of-range value
    instead of aborting the whole Arrow batch (review finding)."""
    import pandas as pd

    from logstash_spark.grok import compile_grok, grok_extract_batch

    c = compile_grok("%{NUMBER:x:int}")
    out = grok_extract_batch(
        pd.Series(["9223372036854775808", "42"]), [c])
    assert out["x"].tolist()[0] is None or pd.isna(out["x"].tolist()[0])
    assert out["x"].tolist()[1] == 42
