"""Flow-family tests: drop / clone / split / throttle / aggregate /
multiline / metrics — the stateful re-expressions (SURVEY §2.4)."""

from __future__ import annotations

import datetime

import pandas as pd
import pytest

from logstash_spark.stages import apply_stage

T0 = datetime.datetime(2026, 1, 1, 0, 0, 0)


def ts(sec: int) -> datetime.datetime:
    return T0 + datetime.timedelta(seconds=sec)


def test_drop_conditional(spark):
    df = spark.createDataFrame([(1, "en"), (2, "und")], "id int, lang string")
    out = apply_stage(df, {"drop": {"when": "[lang] == 'und'"}})
    assert [r.id for r in out.collect()] == [1]


def test_drop_sampling_deterministic(spark):
    df = spark.createDataFrame([(i, f"u{i}") for i in range(200)], "id int, url string")
    a = apply_stage(df, {"drop": {"percentage": 50, "deterministic_on": "url"}})
    b = apply_stage(df, {"drop": {"percentage": 50, "deterministic_on": "url"}})
    ka = sorted(r.id for r in a.collect())
    kb = sorted(r.id for r in b.collect())
    assert ka == kb
    assert 60 < len(ka) < 140  # ~50%


def test_clone(spark):
    df = spark.createDataFrame([(1, "msg")], "id int, message string")
    out = apply_stage(df, {"clone": {"clones": ["copy1", "copy2"], "add_tag": ["cloned"]}})
    rows = sorted(out.collect(), key=lambda r: (r.type or ""))
    assert len(rows) == 3
    assert rows[0].type is None and rows[0].tags == []  # original untouched
    assert rows[1].type == "copy1" and "cloned" in rows[1].tags
    assert rows[2].type == "copy2"


def test_split_array_and_string(spark):
    df = spark.createDataFrame([(1, ["a", "b"], "x\ny")], "id int, arr array<string>, s string")
    out = apply_stage(df, {"split": {"field": "arr"}})
    assert sorted(r.arr for r in out.collect()) == ["a", "b"]
    out2 = apply_stage(df, {"split": {"field": "s"}})
    assert sorted(r.s for r in out2.collect()) == ["x", "y"]


def test_throttle(spark):
    rows = [(i, "k", ts(i)) for i in range(5)] + [(10, "other", ts(2))]
    df = spark.createDataFrame(rows, "id int, key string, event_ts timestamp")
    out = apply_stage(
        df,
        {"throttle": {"key": "key", "period": 60, "after_count": 3,
                      "add_tag": ["throttled"]}},
    )
    tagged = sorted(r.id for r in out.collect() if "throttled" in (r.tags or []))
    assert tagged == [3, 4]  # rows 4 and 5 of key "k" exceed 3-per-minute


def test_aggregate(spark):
    df = spark.createDataFrame(
        [(1, "t1", 1.0, ts(0)), (2, "t1", 2.0, ts(1)), (3, "t2", 5.0, ts(2))],
        "id int, task_id string, value double, event_ts timestamp",
    )

    def reduce_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"task_id": [pdf["task_id"].iloc[0]], "total": [pdf["value"].sum()],
             "n": [len(pdf)]}
        )

    out = apply_stage(
        df,
        {"aggregate": {"task_id": "task_id", "code": reduce_fn,
                       "schema": "task_id string, total double, n long",
                       "sort_by": "event_ts"}},
    )
    rows = {r.task_id: r for r in out.collect()}
    assert rows["t1"].total == 3.0 and rows["t1"].n == 2
    assert rows["t2"].total == 5.0


def test_multiline_previous(spark):
    lines = [
        (1, "f", 1, "2026-01-01 start of event"),
        (2, "f", 2, "  continuation one"),
        (3, "f", 3, "  continuation two"),
        (4, "f", 4, "2026-01-01 second event"),
        (5, "g", 1, "2026-01-01 other file"),
    ]
    df = spark.createDataFrame(lines, "id int, file string, lineno int, message string")
    out = apply_stage(
        df,
        {"multiline": {"pattern": r"^\s", "what": "previous",
                       "group_by": "file", "order_by": "lineno"}},
    )
    rows = sorted(out.collect(), key=lambda r: (r.file, r.lineno))
    assert rows[0].message == "2026-01-01 start of event\n  continuation one\n  continuation two"
    assert "multiline" in rows[0].tags
    assert rows[1].message == "2026-01-01 second event"
    assert rows[2].file == "g" and "\n" not in rows[2].message
    assert "n_lines" not in out.columns  # helper must not leak


def test_metrics_stage(spark):
    rows = [(i, "click" if i % 2 else "view", ts(i)) for i in range(20)]
    df = spark.createDataFrame(rows, "id int, event_type string, event_ts timestamp")
    out = apply_stage(
        df, {"metrics": {"meter": "event_type", "flush_interval": 10}}
    )
    got = {(r.meter, r.window_start.second): r["count"] for r in out.collect()}
    assert got[("click", 0)] == 5 and got[("view", 0)] == 5
    assert got[("click", 10)] == 5 and got[("view", 10)] == 5
    assert all(r.rate == r["count"] / 10.0 for r in out.collect())


def test_metrics_ewma_long_series_stays_finite(spark):
    """10k flush windows: the old closed-form pow(1-a, -rn) overflowed
    to inf within a few thousand windows; the recursion must not."""
    import math

    from pyspark.sql import functions as F

    df = (
        spark.range(10_000)
        .select(
            F.lit("m").alias("event_type"),
            F.timestamp_seconds(F.col("id") * 10).alias("event_ts"),
        )
    )
    out = apply_stage(df, {"metrics": {"meter": "event_type", "flush_interval": 10}})
    pdf = out.toPandas().sort_values("window_start")
    assert len(pdf) == 10_000
    assert all(math.isfinite(x) for x in pdf["rate_1m"])
    # exact recursion check against a python loop
    a = 2.0 / (60.0 / 10 + 1.0)
    b = 1.0 - a
    acc = None
    for r, e in zip(pdf["rate"], pdf["rate_1m"]):
        acc = r if acc is None else a * r + b * acc
        assert e == acc


def test_aggregate_push_map_as_event(spark):
    """push_map_as_event_on_timeout: originals pass through AND one
    flushed map event per task_id is appended (batch = end-of-input)."""

    def reduce_fn(pdf):
        return pd.DataFrame({"task_id": [pdf["task_id"].iloc[0]], "n": [len(pdf)]})

    df = spark.createDataFrame(
        [(1, "t1"), (2, "t1"), (3, "t2")], "id int, task_id string"
    )
    out = apply_stage(
        df,
        {"aggregate": {"task_id": "task_id", "code": reduce_fn,
                       "schema": "task_id string, n long",
                       "push_map_as_event": True}},
    ).collect()
    originals = [r for r in out if not r.is_timeout_event]
    flushed = {r.task_id: r.n for r in out if r.is_timeout_event}
    assert len(originals) == 3 and all(r.n is None for r in originals)
    assert flushed == {"t1": 2, "t2": 1}


def test_drop_percentage_with_condition(spark):
    """drop.rb: percentage sampling applies only to condition-matching
    rows; everything else passes untouched."""
    rows = [(i, "en" if i % 2 else "de") for i in range(200)]
    df = spark.createDataFrame(rows, "id int, lang string")
    out = apply_stage(
        df, {"drop": {"when": "[lang] == 'de'", "percentage": 50,
                      "deterministic_on": "id"}}
    ).collect()
    en = [r for r in out if r.lang == "en"]
    de = [r for r in out if r.lang == "de"]
    assert len(en) == 100          # never sampled
    assert 20 <= len(de) <= 80     # ~half the de rows dropped
    # deterministic: rerun drops the same rows
    again = apply_stage(
        df, {"drop": {"when": "[lang] == 'de'", "percentage": 50,
                      "deterministic_on": "id"}}
    ).collect()
    assert sorted(r.id for r in again) == sorted(r.id for r in out)


# --------------------------------------------------------------------------
# sleep filter (logstash-filter-sleep) — replay pacing
# --------------------------------------------------------------------------

def test_sleep_paces_and_passes_through(spark):
    import time as _t

    df = spark.createDataFrame([(i,) for i in range(20)], "id int").coalesce(1)
    out = apply_stage(df, {"sleep": {"time": 0.05, "every": 1}})
    t0 = _t.monotonic()
    rows = sorted(r.id for r in out.collect())
    wall = _t.monotonic() - t0
    assert rows == list(range(20))           # pure pass-through
    assert wall >= 20 * 0.05                 # total sleep = time * rows / every


def test_sleep_every_and_field_time(spark):
    import time as _t

    df = spark.createDataFrame(
        [(1, 0.2), (2, 0.2), (3, None)], "id int, wait double").coalesce(1)
    out = apply_stage(df, {"sleep": {"time": "%{wait}", "every": 2}})
    t0 = _t.monotonic()
    assert out.count() == 3
    assert _t.monotonic() - t0 >= 0.2        # (0.2+0.2+0)/2
    # enforce=false → audited no-op, no python hop in the plan
    noop = apply_stage(df, {"sleep": {"time": 5, "enforce": False}})
    assert "mapInPandas" not in noop._jdf.queryExecution().executedPlan().toString()
    with pytest.raises(ValueError, match="not in schema"):
        apply_stage(df, {"sleep": {"time": "%{nope}"}})


def test_sleep_nested_field_time(spark):
    """A nested `%{[a][b]}` time reference must resolve the struct PATH —
    the bare top-level column is a struct, coerces to NaN, and would
    silently sleep 0."""
    import time as _t

    df = spark.createDataFrame(
        [(1, (0.3, "x")), (2, (0.3, "y"))],
        "id int, metrics struct<delay:double, name:string>").coalesce(1)
    out = apply_stage(df, {"sleep": {"time": "%{[metrics][delay]}"}})
    assert out.columns == ["id", "metrics"]  # helper column dropped
    t0 = _t.monotonic()
    assert out.count() == 2
    assert _t.monotonic() - t0 >= 0.6
