"""SparkSession factory with scale-minded defaults.

Defaults target the driver's local[N] test rig but are chosen so the same
code is correct on a 1000-executor cluster: AQE on (runtime re-planning,
skew-join splitting, dynamic coalesce), modest auto-broadcast threshold,
Arrow enabled for the pandas-UDF analytics operators.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "audit_star_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("AUDIT_STAR_SHUFFLE_PARTITIONS", cpus)
    )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # floor for AQE-coalesced partitions: the 1 MiB default collapses
        # CPU-dense small shuffles (shingle windows, bucket self-joins) to
        # 2-3 tasks on 32 cores; at real scale partitions are >>64k and
        # coalescing behaves identically
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # events.parquet carries TIMESTAMP(NANOS); Spark has no ns timestamp
        # type — read as long ns and convert in the loader (testdata.py).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # local[N] puts every "executor" in the driver JVM: the heap must
        # be sized like N executors, not like a driver. Too small (8g, 32
        # cores of array-heavy stages) means constant GC; too large (32g)
        # means rare but multi-second full collections landing mid-query.
        # On a real cluster this maps to per-executor memory, not driver
        # memory.
        .config("spark.driver.memory", os.environ.get("AUDIT_STAR_DRIVER_MEM", "16g"))
        # Whole-stage codegen emits one or more classes per stage; a long
        # session running dozens of expression-heavy queries (higher-order
        # folds, wide literal arrays) overflows the JVM's default ~240 MB
        # reserved code cache, after which the JIT silently stops compiling
        # and every later query runs interpreted (measured: 10x+ inflation
        # on the queries that happened to run after the cliff). Reserve
        # enough to never hit it, and let the sweeper reclaim cold code.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing",
        )
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
