"""Streaming state-store scale evidence (round-3 verdict item #10):
aggregate_stream (applyInPandasWithState, ProcessingTimeTimeout) at
1M distinct keys — 100× the toy-test cardinality.

Measures: ingest wall for N rows across K keys in availableNow batches,
then the timeout-flush wall until all K map-events are emitted, plus
the state-store file footprint on disk (HDFSBackedStateStore default).
Writes STATE_SCALE.json and prints one JSON line.

Usage: python scripts/state_scale_bench.py [n_keys] [rows_per_key] [provider]

provider: "hdfs" (HDFSBackedStateStore default — all state ON-HEAP, the
real 100x risk) or "rocksdb" (RocksDBStateStoreProvider — off-heap
native store, the documented 10M+-key deployment setting). Round-5 runs
write/merge into STATE_SCALE_r5.json keyed by provider.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    n_keys = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    rows_per_key = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    provider = sys.argv[3] if len(sys.argv) > 3 else "hdfs"

    from pyspark.sql import functions as F

    from logstash_spark.session import get_spark
    from logstash_spark.streaming import aggregate_stream, stream_from_directory

    extra = {"spark.ui.showConsoleProgress": "false"}
    if provider == "rocksdb":
        extra["spark.sql.streaming.stateStore.providerClass"] = (
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider"
        )
    spark = get_spark("state-scale", master="local[32]", extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")

    base = "/tmp/logstash_spark_state_scale"
    src, ckpt = f"{base}/src", f"{base}/ckpt"
    import shutil

    shutil.rmtree(base, ignore_errors=True)

    # n_keys * rows_per_key rows, deterministic values
    (
        spark.range(n_keys * rows_per_key)
        .select(
            F.concat(F.lit("task_"), (F.col("id") % n_keys).cast("string")).alias("k"),
            (F.col("id") % 97).alias("v"),
        )
        .repartition(32)
        .write.mode("append").parquet(src)
    )

    stream = stream_from_directory(spark, src, "k string, v long")
    out = aggregate_stream(
        stream,
        task_id="k",
        state_schema="n long, total long",
        output_schema="k string, n long, total long",
        init_state=(0, 0),
        update_fn=lambda st, pdf: (st[0] + len(pdf), st[1] + int(pdf["v"].sum())),
        emit_fn=lambda key, st: {"k": key[0], "n": st[0], "total": st[1]},
        timeout_ms=2000,
    )
    t0 = time.monotonic()
    q = (
        out.writeStream.format("memory").queryName("state_scale_q")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="2 seconds")
        .start()
    )
    ingest_wall = None
    emitted = 0
    deadline = time.monotonic() + 1800
    while time.monotonic() < deadline:
        time.sleep(2.0)
        prog = q.lastProgress
        if ingest_wall is None and prog and prog["numInputRows"] == 0 and (
            prog["stateOperators"]
            and prog["stateOperators"][0]["numRowsTotal"] >= n_keys
        ):
            ingest_wall = time.monotonic() - t0
        emitted = spark.sql("SELECT count(*) n FROM state_scale_q").collect()[0].n
        if emitted >= n_keys:
            break
    flush_wall = time.monotonic() - t0
    # sanity: every key's fold is exact
    bad = spark.sql(
        f"SELECT count(*) n FROM state_scale_q WHERE n != {rows_per_key}"
    ).collect()[0].n
    q.stop()

    state_bytes = 0
    for root, _dirs, files in os.walk(f"{ckpt}/state"):
        state_bytes += sum(os.path.getsize(os.path.join(root, f)) for f in files)

    result = {
        "n_keys": n_keys,
        "rows_per_key": rows_per_key,
        "emitted": int(emitted),
        "mis_folded_keys": int(bad),
        "ingest_wall_sec": round(ingest_wall, 1) if ingest_wall else None,
        "total_wall_sec": round(flush_wall, 1),
        "keys_per_sec_end_to_end": round(n_keys / flush_wall, 1),
        "state_store_disk_bytes": state_bytes,
        "state_bytes_per_key": round(state_bytes / n_keys, 1),
        "provider": ("RocksDBStateStoreProvider" if provider == "rocksdb"
                     else "HDFSBackedStateStore (default)"),
        "parallelism": 32,
    }
    out_path = os.path.join(REPO, "STATE_SCALE_r5.json")
    merged = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            merged = json.load(f)
    merged[provider] = result
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
