"""Input-plugin resolution tests (sources.py)."""

from __future__ import annotations

import gzip

import pytest

from logstash_spark.sources import SourceError, resolve_input


def test_file_line_codec(spark, tmp_path):
    p = tmp_path / "log.txt"
    p.write_text("line one\nline two\n")
    df = resolve_input(spark, "file", {"path": str(p)})
    assert df.columns == ["message"]
    assert {r["message"] for r in df.collect()} == {"line one", "line two"}


def test_file_gzip_lines(spark, tmp_path):
    p = tmp_path / "log.txt.gz"
    with gzip.open(p, "wt") as f:
        f.write("a\nb\nc\n")
    df = resolve_input(spark, "file", {"path": str(p)})
    assert df.count() == 3


def test_file_json_codec(spark, tmp_path):
    p = tmp_path / "ev.jsonl"
    p.write_text('{"a": 1, "b": "x"}\n{"a": 2, "b": "y"}\n')
    df = resolve_input(spark, "file", {"path": str(p), "codec": "json_lines"})
    assert {r["a"] for r in df.collect()} == {1, 2}


def test_generator_lines(spark):
    df = resolve_input(
        spark, "generator", {"count": 5, "lines": ["foo", "bar"]}
    )
    rows = df.collect()
    assert len(rows) == 10  # count x lines (generator emits each line per cycle)
    assert {r["message"] for r in rows} == {"foo", "bar"}


def test_unknown_and_p2_inputs(spark):
    with pytest.raises(SourceError):
        resolve_input(spark, "beats_like_nonsense", {})
    with pytest.raises(SourceError, match="batch-engine"):
        resolve_input(spark, "stdin", {})
    with pytest.raises(SourceError, match="streaming"):
        resolve_input(spark, "kafka", {"bootstrap_servers": "x", "topics": "t"})


def test_dlq_readback(spark, tmp_path):
    df = spark.createDataFrame([("u1", "_grokparsefailure")], "url string, error_stage string")
    df.write.parquet(str(tmp_path / "dlq"))
    back = resolve_input(spark, "dead_letter_queue", {"path": str(tmp_path / "dlq")})
    assert back.count() == 1


def test_heartbeat_input(spark):
    from logstash_spark.sources import resolve_input

    df = resolve_input(
        spark, "heartbeat",
        {"count": 3, "interval": 30, "start_ts": "2026-06-01 00:00:00",
         "message": "beat"},
    )
    rows = sorted(df.collect(), key=lambda r: r.sequence)
    assert [r.message for r in rows] == ["beat"] * 3
    assert rows[1].event_ts.second == 30 and rows[2].event_ts.minute == 1


def test_jdbc_input_embedded_derby(spark, tmp_path):
    """The real jdbc reader path against the Derby embedded driver that
    ships inside the Spark distribution: write a table via
    df.write.jdbc, read it back through resolve_input('jdbc')."""
    from logstash_spark.sources import resolve_input

    url = f"jdbc:derby:{tmp_path}/jdbc_db;create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "id int, name string"
    ).write.mode("overwrite").format("jdbc").options(
        url=url, dbtable="things", driver=driver
    ).save()
    back = resolve_input(
        spark, "jdbc",
        {"jdbc_connection_string": url, "dbtable": "things",
         "jdbc_driver_class": driver},
    )
    assert sorted((r[0], r[1]) for r in back.collect()) == [(1, "alpha"), (2, "beta")]
    # statement mode (Derby folds unquoted identifiers to upper case)
    q = resolve_input(
        spark, "jdbc",
        {"jdbc_connection_string": url,
         "statement": 'SELECT "id" FROM things WHERE "id" > 1',
         "jdbc_driver_class": driver},
    )
    assert [r[0] for r in q.collect()] == [2]


def test_catalog_table_input(spark):
    """Catalog-table input (the Iceberg deployment shape) against the
    built-in session catalog: same `spark.read.table` code path an
    Iceberg catalog serves on a cluster."""
    spark.sql("DROP TABLE IF EXISTS ls_src_pages")
    spark.createDataFrame(
        [("http://a", "en"), ("http://b", "de")], "url string, lang string"
    ).writeTo("ls_src_pages").using("parquet").create()
    try:
        df = resolve_input(spark, "table", {"table": "ls_src_pages"})
        assert sorted(r["url"] for r in df.collect()) == ["http://a", "http://b"]
        df2 = resolve_input(spark, "iceberg", {"table": "ls_src_pages"})
        assert df2.count() == 2
        with pytest.raises(SourceError, match="table =>"):
            resolve_input(spark, "iceberg", {})
    finally:
        spark.sql("DROP TABLE IF EXISTS ls_src_pages")


def test_catalog_table_sink_overwrite_and_append(spark):
    """Router catalog-table sink: create on first batch (partitioned by
    bucket), dynamic-partition overwrite on re-run (idempotent resume),
    append accumulates."""
    from logstash_spark.router import Router, SinkSpec

    spark.sql("DROP TABLE IF EXISTS ls_sink_out")
    df = spark.createDataFrame(
        [("u1", "en", 0), ("u2", "en", 0), ("u3", "de", 1)],
        "url string, lang string, bucket int",
    ).persist()
    router = Router([SinkSpec(name="out", table="ls_sink_out", fmt="parquet")])
    try:
        counts = router.write_batch(df, run_dir="/tmp/unused", mode="overwrite")
        assert counts == {"out": 3}
        # re-run of the same batch: dynamic partition overwrite → same rows
        router.write_batch(df, run_dir="/tmp/unused", mode="overwrite")
        assert spark.table("ls_sink_out").count() == 3
        # append mode accumulates (micro-batch shape)
        router.write_batch(df, run_dir="/tmp/unused", mode="append")
        assert spark.table("ls_sink_out").count() == 6
    finally:
        df.unpersist()
        spark.sql("DROP TABLE IF EXISTS ls_sink_out")
