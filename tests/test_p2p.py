"""Pipeline-to-pipeline bus (org/logstash/plugins/pipeline/PipelineBus.java):
addresses as intermediate tables, topological execution, multi-sender
merge, cycle rejection."""

from __future__ import annotations

import pytest

from logstash_spark.p2p import PipelineGraph


def _df(spark, rows):
    return spark.createDataFrame(rows, "url string, lang string, n int")


def test_p2p_graph_merge_and_order(spark, tmp_path):
    specs = [
        {"id": "gen_a",
         "outputs": [
             {"pipeline": {"send_to": "bus"}, "when": "[lang] == 'en'"},
             {"name": "local_a"},
         ]},
        {"id": "gen_b", "outputs": [{"pipeline": {"send_to": ["bus"]}}]},
        {"id": "agg",
         "input": {"pipeline": {"address": "bus"}},
         "filters": [{"mutate": {"add_field": {"hop": "via-bus"}}}],
         "outputs": [{"name": "final"}]},
    ]
    g = PipelineGraph(specs)
    assert g.order.index("agg") > max(g.order.index("gen_a"), g.order.index("gen_b"))

    inputs = {
        "gen_a": _df(spark, [("http://a/1", "en", 1), ("http://a/2", "de", 2),
                             ("http://a/3", "en", 3)]),
        "gen_b": _df(spark, [("http://b/1", "fr", 4), ("http://b/2", "en", 5)]),
    }
    run_dir = str(tmp_path / "g")
    metrics = g.run(spark, inputs, run_dir, n_buckets=4)
    # bus merge: 2 en rows from gen_a (conditional send) + all 2 from gen_b
    assert metrics["agg"].events_in == 4
    final = spark.read.parquet(f"{run_dir}/agg/final")
    assert final.count() == 4
    assert set(r.url for r in final.select("url").collect()) == {
        "http://a/1", "http://a/3", "http://b/1", "http://b/2"
    }
    assert final.select("hop").distinct().collect()[0].hop == "via-bus"
    # the non-p2p sink of the root pipeline still got every row
    assert spark.read.parquet(f"{run_dir}/gen_a/local_a").count() == 3


def test_p2p_two_branches_same_address_merge(spark, tmp_path):
    """PipelineBus semantics: several output entries may send to the
    SAME address and the bus merges them. Each branch needs its own
    sink path — with one shared name the concurrent writers clobbered
    each other's bucket partitions and the downstream read doubled."""
    specs = [
        {"id": "src",
         "outputs": [
             {"pipeline": {"send_to": "bus"}, "when": "[lang] == 'en'"},
             {"pipeline": {"send_to": "bus"}, "when": "[lang] == 'fr'"},
         ]},
        {"id": "agg",
         "input": {"pipeline": {"address": "bus"}},
         "outputs": [{"name": "final"}]},
    ]
    g = PipelineGraph(specs)
    inputs = {"src": _df(spark, [
        ("http://a/1", "en", 1), ("http://a/2", "de", 2),
        ("http://a/3", "fr", 3), ("http://a/4", "en", 4)])}
    run_dir = str(tmp_path / "dup")
    metrics = g.run(spark, inputs, run_dir, n_buckets=4)
    final = spark.read.parquet(f"{run_dir}/agg/final")
    # en branch (2 rows) + fr branch (1 row); the de row matched neither
    assert metrics["agg"].events_in == 3
    assert {r.url for r in final.select("url").collect()} == {
        "http://a/1", "http://a/3", "http://a/4"}


def test_p2p_cycle_rejected():
    with pytest.raises(ValueError, match="cycle"):
        PipelineGraph([
            {"id": "a", "input": {"pipeline": {"address": "x"}},
             "outputs": [{"pipeline": {"send_to": "y"}}]},
            {"id": "b", "input": {"pipeline": {"address": "y"}},
             "outputs": [{"pipeline": {"send_to": "x"}}]},
        ])


def test_p2p_unwired_address_rejected():
    with pytest.raises(ValueError, match="nobody sends"):
        PipelineGraph([
            {"id": "a", "input": {"pipeline": {"address": "ghost"}},
             "outputs": [{"name": "out"}]},
        ])


def test_p2p_empty_sender_skipped_and_all_empty_rejected(spark, tmp_path):
    """A sender whose `when` matches zero rows writes no parquet parts —
    the bus skips it; if EVERY sender is empty the error is clear."""
    specs = [
        {"id": "s1", "outputs": [{"pipeline": {"send_to": "bus"},
                                  "when": "[lang] == 'xx'"}]},   # matches nothing
        {"id": "s2", "outputs": [{"pipeline": {"send_to": "bus"}}]},
        {"id": "dst", "input": {"pipeline": {"address": "bus"}},
         "outputs": [{"name": "final"}]},
    ]
    inputs = {
        "s1": _df(spark, [("http://a/1", "en", 1)]),
        "s2": _df(spark, [("http://b/1", "fr", 2)]),
    }
    g = PipelineGraph(specs)
    run_dir = str(tmp_path / "g2")
    metrics = g.run(spark, inputs, run_dir, n_buckets=2)
    assert metrics["dst"].events_in == 1  # only s2's row arrived

    g3 = PipelineGraph([
        {"id": "s", "outputs": [{"pipeline": {"send_to": "b"},
                                 "when": "[lang] == 'xx'"}]},
        {"id": "d", "input": {"pipeline": {"address": "b"}},
         "outputs": [{"name": "o"}]},
    ])
    with pytest.raises(ValueError, match="zero rows from every sender"):
        g3.run(spark, {"s": _df(spark, [("http://a", "en", 1)])},
               str(tmp_path / "g3"), n_buckets=2)


def test_p2p_graph_resume_idempotent(spark, tmp_path):
    """Re-running a graph with resume=True replays completed pipelines
    from their checkpoint manifests — per-sink rows unchanged (each
    hop's address table is covered by its writer's manifest)."""
    specs = [
        {"id": "up", "outputs": [{"pipeline": {"send_to": "bus"}}]},
        {"id": "down", "input": {"pipeline": {"address": "bus"}},
         "outputs": [{"name": "final"}]},
    ]
    inputs = {"up": _df(spark, [("http://a/%d" % i, "en", i) for i in range(20)])}
    run_dir = str(tmp_path / "gr")
    g = PipelineGraph(specs)
    m1 = g.run(spark, inputs, run_dir, n_buckets=4)
    first = spark.read.parquet(f"{run_dir}/down/final").count()
    m2 = g.run(spark, inputs, run_dir, n_buckets=4, resume=True)
    assert spark.read.parquet(f"{run_dir}/down/final").count() == first == 20
    assert m2["down"].events_in == m1["down"].events_in == 20
