"""Readers for the driver-generated parquet tables (TESTDATA.md).

Plain ``spark.read.parquet`` scans — declarative, so Catalyst keeps filter
pushdown / column pruning / partition pruning on the table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) read as long ns (legacy.parquet.nanosAsLong);
        # truncate to micros exactly like DuckDB's CAST(ts AS TIMESTAMP).
        # Integer div — a double division would lose precision at 1e18 ns.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif name == "events" and dict(df.dtypes).get("ts") == "timestamp_ntz":
        # TIMESTAMP(isAdjustedToUTC=false) infers NTZ on Spark >= 3.4; the
        # engine standardizes on LTZ with a UTC session timezone, which keeps
        # epoch values identical to DuckDB's reading of the same file.
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose every table to spark.sql(...) as a temp view."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
