

def test_grok_unsupported_re_construct_message():
    """ADVICE r4: a regex construct Python's re cannot compile surfaces
    as a dialect-level ValueError, not a raw sre error."""
    import pytest
    from logstash_spark.grok import compile_grok

    with pytest.raises(ValueError, match="unsupported by this Python re"):
        compile_grok(r"(?<name>\p{L}+)", {})
