"""Mutate-family tests mirroring logstash-filter-mutate spec cases
(rename/convert/gsub/case/split/join/strip op-order semantics)."""

from __future__ import annotations

import pytest

from logstash_spark.stages import apply_stage


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [
            (1, "  Hello World  ", "42", "a-b-c", None),
            (2, "FOO bar", "x", "one", "keep"),
        ],
        "id int, message string, num string, csvish string, maybe string",
    )


def test_mutate_core_ops(df):
    out = apply_stage(
        df,
        {
            "mutate": {
                "strip": ["message"],
                "convert": {"num": "integer"},
                "gsub": ["csvish", "-", "_"],
                "lowercase": ["message"],
                "split": {"csvish": "_"},  # order: gsub runs before split
            }
        },
    )
    rows = {r.id: r for r in out.collect()}
    assert rows[1].message == "hello world"
    assert rows[1].num == 42
    assert rows[2].num is None  # bad convert -> null, never a throw
    assert rows[1].csvish == ["a", "b", "c"]


def test_mutate_rename_replace_copy_coerce(df):
    out = apply_stage(
        df,
        {
            "mutate": {
                "coerce": {"maybe": "default"},
                "rename": {"num": "number"},
                "replace": {"message": "static-%{id}"},
                "copy": {"csvish": "csvish_copy"},
            }
        },
    )
    rows = {r.id: r for r in out.collect()}
    assert rows[1].number == "42" and "num" not in out.columns
    assert rows[1].message == "static-1"
    assert rows[1].maybe == "default" and rows[2].maybe == "keep"
    assert rows[1].csvish_copy == "a-b-c"


def test_mutate_join_upper_capitalize(spark):
    df = spark.createDataFrame([(1, ["x", "y"], "word")], "id int, arr array<string>, w string")
    out = apply_stage(
        df, {"mutate": {"join": {"arr": ","}, "capitalize": ["w"]}}
    )
    r = out.collect()[0]
    assert r.arr == "x,y" and r.w == "Word"


def test_prune(spark):
    df = spark.createDataFrame([(1, "a", "b")], "id int, keep_me string, drop_me string")
    out = apply_stage(df, {"prune": {"whitelist_names": ["^id$", "^keep"]}})
    assert out.columns == ["id", "keep_me"]
    out2 = apply_stage(df, {"prune": {"blacklist_names": ["^drop"]}})
    assert out2.columns == ["id", "keep_me"]


def test_fingerprint_methods(spark):
    import hashlib

    df = spark.createDataFrame([(1, "hello")], "id int, message string")
    out = apply_stage(df, {"fingerprint": {"source": "message", "method": "SHA256"}})
    assert out.collect()[0].fingerprint == hashlib.sha256(b"hello").hexdigest()
    out = apply_stage(df, {"fingerprint": {"source": "message", "method": "MD5"}})
    assert out.collect()[0].fingerprint == hashlib.md5(b"hello").hexdigest()


def test_fingerprint_concat_sources(spark):
    import hashlib

    df = spark.createDataFrame(
        [(1, "a", "b"), (2, "a", None)], "id int, x string, y string")
    # concatenate_sources=true: fingerprint.rb hashes '|name|value|…|'
    # over SORTED sources, nil rendering empty
    out = apply_stage(df, {"fingerprint": {
        "source": ["y", "x"], "concatenate_sources": True, "method": "SHA1"}})
    rows = {r.id: r for r in out.collect()}
    assert rows[1].fingerprint == hashlib.sha1(b"|x|a|y|b|").hexdigest()
    assert rows[2].fingerprint == hashlib.sha1(b"|x|a|y||").hexdigest()
    # default (no concatenation): each present source sets the target in
    # sorted order — last PRESENT source wins
    out = apply_stage(df, {"fingerprint": {"source": ["y", "x"], "method": "SHA1"}})
    rows = {r.id: r for r in out.collect()}
    assert rows[1].fingerprint == hashlib.sha1(b"b").hexdigest()
    assert rows[2].fingerprint == hashlib.sha1(b"a").hexdigest()


def test_urldecode(spark):
    df = spark.createDataFrame([(1, "a%20b%2Fc")], "id int, message string")
    assert apply_stage(df, {"urldecode": {"field": "message"}}).collect()[0].message == "a b/c"


def test_truncate_bytes(spark):
    df = spark.createDataFrame([(1, "abcdef"), (2, "ab")], "id int, message string")
    out = apply_stage(df, {"truncate": {"fields": "message", "length_bytes": 4}})
    rows = {r.id: r for r in out.collect()}
    assert rows[1].message == "abcd" and rows[2].message == "ab"


def test_syslog_pri(spark):
    df = spark.createDataFrame([(1, "165")], "id int, syslog_pri string")
    r = apply_stage(df, {"syslog_pri": {}}).collect()[0]
    assert r.syslog_facility_code == 20 and r.syslog_facility == "local4"
    assert r.syslog_severity_code == 5 and r.syslog_severity == "notice"


def test_uuid_deterministic(spark):
    df = spark.createDataFrame([(1, "u1")], "id int, url string")
    a = apply_stage(df, {"uuid": {"deterministic_from": "url"}}).collect()[0].uuid
    b = apply_stage(df, {"uuid": {"deterministic_from": "url"}}).collect()[0].uuid
    assert a == b and len(a.split("-")) == 5


def test_ruby_vectorized_udf(spark):
    df = spark.createDataFrame([(1, "abc")], "id int, message string")
    out = apply_stage(
        df,
        {"ruby": {"code": lambda s: s.str.upper(), "source": "message", "target": "up"}},
    )
    assert out.collect()[0].up == "ABC"


def test_de_dot(spark):
    df = spark.createDataFrame([(1, "v")], ["id", "dotted.name"])
    assert "dotted_name" in apply_stage(df, {"de_dot": {}}).columns


def test_fingerprint_hmac_matches_stdlib(spark):
    """True RFC-2104 HMAC parity with Python's stdlib (the check a
    reference deployment would run against OpenSSL::HMAC digests)."""
    import hashlib
    import hmac

    df = spark.createDataFrame(
        [(1, "hello"), (2, "wörld ünïcode"), (3, None)], "id int, message string"
    )
    mods = {"SHA256": hashlib.sha256, "SHA1": hashlib.sha1,
            "MD5": hashlib.md5, "SHA512": hashlib.sha512}
    for method, mod in mods.items():
        out = {
            r.id: r.fingerprint
            for r in apply_stage(
                df, {"fingerprint": {"source": "message", "key": "k3y!",
                                     "method": method}}
            ).collect()
        }
        assert out[1] == hmac.new(b"k3y!", b"hello", mod).hexdigest()
        assert out[2] == hmac.new(b"k3y!", "wörld ünïcode".encode(), mod).hexdigest()
        assert out[3] is None
    # key longer than the 64-byte block → hashed-key path
    long_key = "K" * 100
    out = {
        r.id: r.fingerprint
        for r in apply_stage(
            df, {"fingerprint": {"source": "message", "key": long_key,
                                 "method": "SHA256"}}
        ).collect()
    }
    import hashlib as _h
    import hmac as _hm

    assert out[1] == _hm.new(long_key.encode(), b"hello", _h.sha256).hexdigest()


def test_truncate_utf8_boundary(spark):
    """Byte-true truncation backs up to a UTF-8 char boundary — never
    emits broken UTF-8, never throws under ANSI sessions."""
    s = "aé€😀xyz"  # widths: 1,2,3,4,1,1,1 bytes
    df = spark.createDataFrame([(1, s)], "id int, message string")
    for n, expected in [(3, "aé"), (4, "aé"), (5, "aé"), (6, "aé€"),
                        (7, "aé€"), (10, "aé€😀"), (13, s), (50, s)]:
        out = apply_stage(df, {"truncate": {"length_bytes": n}}).collect()[0]
        assert out.message == expected, (n, out.message, expected)
        assert len(out.message.encode()) <= n


def test_extractnumbers(spark):
    df = spark.createDataFrame(
        [(1, "took 42 ms, -3.5 retries, 0.25 ratio"), (2, "no digits here"), (3, None)],
        "id int, message string",
    )
    out = {r.id: r.extracted_numbers for r in
           apply_stage(df, {"extractnumbers": {}}).collect()}
    assert out[1] == [42.0, -3.5, 0.25]
    assert out[2] == []
    assert out[3] is None


def test_range_filter(spark):
    df = spark.createDataFrame(
        [(1, 50.0, "ok"), (2, 500.0, "toolongvalue"), (3, None, "x")],
        "id int, value double, name string",
    )
    out, m = __import__("logstash_spark.stages.base", fromlist=["build_stage"]).build_stage(
        {"range": {"ranges": [["value", 0, 100], ["name", 10, 99]]}}
    ).transform(df)
    got = {r["id"]: r["__matched"] for r in out.select("id", "__matched").collect()}
    assert got[1] is True          # value in [0,100]
    assert got[2] is True          # name length 12 in [10,99]
    assert got[3] in (False, None)  # null value, short name
    # drop action removes matching rows
    dropped = apply_stage(
        df, {"range": {"ranges": [["value", 0, 100]], "action": "drop"}}
    )
    assert sorted(r.id for r in dropped.collect()) == [2, 3]


def test_environment_stage(spark, monkeypatch):
    monkeypatch.setenv("LS_SPARK_TEST_ENV", "prod-7")
    df = spark.createDataFrame([(1,)], "id int")
    out = apply_stage(
        df, {"environment": {"add_field_from_env": {"deployment": "LS_SPARK_TEST_ENV",
                                                    "missing": "LS_SPARK_NOPE"}}}
    ).collect()[0]
    assert out.deployment == "prod-7" and out.missing is None


def test_i18n_transliterate(spark):
    """logstash-filter-i18n: accents fold to ASCII, unmapped chars drop
    (best-effort contract); unchanged rows are unmatched."""
    df = spark.createDataFrame(
        [(1, "héllo wörld", "café"), (2, "plain ascii", None)],
        "id int, a string, b string",
    )
    from logstash_spark.stages import apply_stage

    out = apply_stage(
        df, {"i18n": {"transliterate": ["a", "b"], "add_tag": ["folded"]}}
    )
    rows = {r.id: r for r in out.collect()}
    assert rows[1].a == "hello world" and rows[1].b == "cafe"
    assert "folded" in rows[1].tags
    assert rows[2].a == "plain ascii" and rows[2].b is None
    assert "folded" not in (rows[2].tags or [])


def test_anonymize_in_place_hmac_matches_stdlib(spark):
    """anonymize (deprecated fingerprint alias): fields replaced IN
    PLACE with HMAC-<algorithm>, OpenSSL::HMAC parity via stdlib."""
    import hmac as _hmac

    df = spark.createDataFrame([(1, "alice", "10.1.2.3"), (2, None, None)],
                               "id int, user string, ip string")
    out = {r.id: r for r in apply_stage(
        df, {"anonymize": {"fields": ["user", "ip"], "key": "s3cret",
                           "algorithm": "SHA1"}}).collect()}
    exp = _hmac.new(b"s3cret", b"alice", "sha1").hexdigest()
    assert out[1].user == exp
    assert out[1].ip == _hmac.new(b"s3cret", b"10.1.2.3", "sha1").hexdigest()
    assert out[2].user is None and out[2].ip is None


def test_anonymize_sha384_and_murmur(spark):
    import hmac as _hmac

    df = spark.createDataFrame([(1, "x")], "id int, v string")
    out = apply_stage(df, {"anonymize": {
        "fields": "v", "key": "k", "algorithm": "SHA384"}}).collect()[0]
    assert out.v == _hmac.new(b"k", b"x", "sha384").hexdigest()
    out = apply_stage(df, {"anonymize": {
        "fields": "v", "algorithm": "MURMUR3"}}).collect()[0]
    assert out.v.lstrip("-").isdigit()


def test_anonymize_ipv4_network(spark):
    df = spark.createDataFrame(
        [(1, "192.168.37.201"), (2, "not-an-ip"), (3, None)],
        "id int, ip string")
    out = {r.id: r for r in apply_stage(
        df, {"anonymize": {"fields": ["ip"], "key": "24",
                           "algorithm": "IPV4_NETWORK"}}).collect()}
    assert out[1].ip == "192.168.37.0"
    assert out[2].ip is None and out[3].ip is None
    with pytest.raises(ValueError, match="prefix"):
        apply_stage(df, {"anonymize": {"fields": ["ip"], "key": "64",
                                       "algorithm": "IPV4_NETWORK"}})
    with pytest.raises(ValueError, match="key"):
        apply_stage(df, {"anonymize": {"fields": ["ip"]}})


def test_gsub_ruby_backrefs_and_dollar(spark):
    """mutate.rb gsub replacements are Ruby syntax: \\1 backrefs must
    swap groups (not emit literal '1') and a literal '$' must not throw
    Java's 'Illegal group reference'."""
    df = spark.createDataFrame([(1, "12-34", "x")], "id int, a string, b string")
    out = apply_stage(df, {"mutate": {"gsub": ["a", r"(\d+)-(\d+)", r"\2-\1"]}})
    assert out.collect()[0].a == "34-12"
    out = apply_stage(df, {"mutate": {"gsub": ["b", "x", "$$$"]}})
    assert out.collect()[0].b == "$$$"


def test_convert_boolean_dirty_value_nulls(spark):
    """convert => boolean on an unconvertible value yields null (the
    documented try_ deviation; a static column can't keep the original
    string) — and never throws."""
    df = spark.createDataFrame(
        [(1, "true"), (2, "enabled"), (3, "NO")], "id int, f string")
    out = apply_stage(df, {"mutate": {"convert": {"f": "boolean"}}})
    rows = {r.id: r.f for r in out.collect()}
    assert rows == {1: True, 2: None, 3: False}
