"""Structured-Streaming execution mode: the same compiled pipeline DAG
run per micro-batch via ``foreachBatch``.

Reference counterparts:
* Logstash IS a streaming engine (input threads → queue → workers,
  SURVEY §3.2); this module is the engine's unbounded-source mode,
  while pipeline.py's bucket loop is the batch-over-table mode.
* micro-batch ≙ QueueBatch (execution/QueueBatch.java); the streaming
  checkpoint dir ≙ the PQ head/tail checkpoints
  (ackedqueue/Checkpoint.java) — source offsets are committed after a
  batch's sinks are written, giving the same at-least-once contract.
* per-batch metrics ≙ the node-stats events counters (§3.3), emitted
  as one JSON line per micro-batch (``metrics_stream.jsonl``).

Semantics notes (documented deviations, SURVEY §2.6):
* Logstash is processing-time only; event-time watermarking is an
  extension hook (``with_watermark``) not used by default.
* Sinks append per micro-batch (Logstash outputs append too);
  idempotent replay of a failed batch can duplicate — at-least-once,
  exactly like the reference's PQ acking.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from .pipeline import BUCKET_COL, Pipeline, _failure_census


def stream_from_directory(
    spark: SparkSession, path: str, schema: str, fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream (≙ logstash-input-file with sincedb tracking:
    the stream checkpoint's source offsets ARE the sincedb)."""
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)


def run_streaming(
    pipe: Pipeline,
    stream: DataFrame,
    run_dir: str,
    bucket_on: str = "url",
    n_buckets: int = 32,
    available_now: bool = True,
    timeout_sec: float | None = None,
):
    """Run the pipeline over an unbounded source; returns the query.

    ``available_now=True`` drains what exists and stops (the batch-test
    and backfill mode); False runs continuously.
    """
    os.makedirs(run_dir, exist_ok=True)
    metrics_path = f"{run_dir}/metrics_stream.jsonl"
    stage_tags = pipe._stage_failure_tags()

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        t0 = time.monotonic()
        bucketed = batch_df.withColumn(
            BUCKET_COL, F.pmod(F.xxhash64(F.col(bucket_on)), F.lit(n_buckets))
        )
        routed = (
            pipe.compile(bucketed)
            .repartition(n_buckets, F.col(BUCKET_COL))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        try:
            total, failures = _failure_census(routed, stage_tags)
            sink_counts = pipe.router.write_batch(
                routed, run_dir, mode="append"
            )
        finally:
            routed.unpersist()
        rec = {
            "batch_id": batch_id,
            "events": {
                "in": total,
                "filtered": total,
                "out": sum(sink_counts.values()),
                "duration_in_millis": int((time.monotonic() - t0) * 1000),
            },
            "sinks": sink_counts,
            "failures": failures,
        }
        with open(metrics_path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    writer = (
        stream.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", f"{run_dir}/_stream_checkpoint")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    query = writer.start()
    if available_now:
        query.awaitTermination(timeout_sec)
    return query
