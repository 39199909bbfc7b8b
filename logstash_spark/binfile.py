"""Shared front of every whole-file binary codec reader.

Every binary codec (avro, netflow, collectd, msgpack, fluent, edn,
nmap, protobuf, es_bulk) starts the same way: a ``binaryFile`` scan
projected to the ``content`` column, feeding a ``mapInPandas`` decode.
This helper is that one block — a schema/option fix lands HERE once
instead of in nine copies (the streaming path in particular must
declare binaryFile's fixed schema explicitly).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_BINARYFILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)


def binary_content(spark: SparkSession, path: str,
                   streaming: bool = False,
                   glob: str | None = None) -> DataFrame:
    """``binaryFile`` scan → DataFrame with the single ``content``
    column (one row per file / datagram). ``glob`` maps to
    ``pathGlobFilter``."""
    reader = spark.readStream if streaming else spark.read
    binf = reader.format("binaryFile")
    if streaming:
        # streaming binaryFile needs its (fixed) schema declared
        binf = binf.schema(_BINARYFILE_SCHEMA)
    if glob:
        binf = binf.option("pathGlobFilter", glob)
    return binf.load(path).select("content")
