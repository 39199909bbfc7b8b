#!/usr/bin/env bash
# Cluster packaging/invocation (north rule: spark-submit --py-files).
# On the sandbox the session factory ships the same zip automatically
# (session._ship_package); this script is the real-cluster form.
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
ZIP="/tmp/logstash_spark_pkg.zip"

# fresh archive every build: zip -r into an existing file UPDATES it,
# so a module deleted from the tree would linger in the shipped zip
rm -f "$ZIP"
cd "$REPO" && zip -qr "$ZIP" logstash_spark

# Example: run an LSCL pipeline over an Iceberg/parquet pages table at
# two cluster sizes (the N->4N scaling criterion). Executor counts and
# the Iceberg catalog confs are deploy-specific. An Iceberg deployment
# adds the runtime jar + a catalog, e.g.:
#   --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0 \
#   --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog \
#   --conf spark.sql.catalog.lake.type=hadoop \
#   --conf spark.sql.catalog.lake.warehouse=s3a://bucket/warehouse \
# and the LSCL config reads/writes catalog tables directly:
#   input  { iceberg { table => "lake.web.pages" } }
#   output { iceberg { table => "lake.web.pages_en" } }
exec spark-submit \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version=2 \
  "$REPO/__main_submit__.py" "$@"
