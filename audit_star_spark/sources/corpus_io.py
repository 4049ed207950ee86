"""Corpus interchange I/O: sharded (optionally compressed) JSONL export
and read-back — the format training-data pipelines hand to tokenizer /
loader stages.

Scale notes: shard count controls downstream read parallelism AND file
size; at production scale pick shards so each gzip part lands ~100-500 MB.
The export is a plain distributed write — no driver involvement, no
collect. Schema is carried explicitly on read (JSONL is schemaless;
inference costs an extra pass and can widen types nondeterministically —
always pass the catalog schema in a pipeline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def export_jsonl(
    df: DataFrame,
    path: str,
    shards: int | None = None,
    compression: str = "gzip",
) -> None:
    """Write ``df`` as sharded JSONL. ``shards=None`` keeps the input
    partitioning (no extra shuffle); an explicit count repartitions
    round-robin for even shard sizes."""
    if shards is not None and shards < 1:
        raise ValueError(f"shards must be >= 1, got {shards}")
    out = df.repartition(shards) if shards is not None else df
    out.write.mode("overwrite").option("compression", compression).json(path)


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType | str | None = None
) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def shard_manifest(spark: SparkSession, path: str) -> DataFrame:
    """Release manifest for a sharded corpus export: one row per data
    shard with byte size and md5 — the checksum file a reproducible
    corpus release ships (a re-run of the byte-deterministic writers
    must reproduce it bit-for-bit, which is what makes snapshot
    releases auditable).

    Built from ``binaryFile`` (shard bytes never leave the executor
    that reads them; md5 computed JVM-side per file, one narrow pass —
    no driver collection of content)."""
    files = (
        spark.read.format("binaryFile")
        .load(path)
        .filter(~F.col("path").rlike(r"_SUCCESS$|\.crc$"))
    )
    return files.select(
        F.regexp_extract("path", r"([^/]+)$", 1).alias("shard"),
        F.col("length").cast("long").alias("n_bytes"),
        F.md5("content").alias("md5"),
    )
