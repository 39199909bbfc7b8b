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
