"""Mergeable HLL sketches (analytics/sketch.py): accuracy contract,
exact merge law, engine-differential registers/estimates, small-range
linear counting."""

import duckdb
import pytest
from pyspark.sql import functions as F

from audit_star_spark.analytics.sketch import (
    HLL_M,
    HLL_RSE,
    hll_distinct,
    hll_estimate,
    hll_merge,
    hll_partials,
    hll_sql,
)
from tests.conftest import SF_DIR


def test_estimate_within_contract_on_events(spark):
    """4-sigma HLL contract against the exact per-type distinct users."""
    from audit_star_spark.sources.testdata import load_table

    ev = load_table(spark, SF_DIR, "events")
    est = {
        r["event_type"]: r["est_distinct"]
        for r in hll_distinct(ev, ["event_type"], "user_id").collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for t, n in exact.items():
        assert abs(est[t] - n) <= max(4 * HLL_RSE * n, 8), (t, est[t], n)


def test_merge_equals_whole(spark):
    """HLL merge law: sketch(A) max-merged with sketch(B) is EXACTLY
    sketch(A ∪ B) — estimates equal to the last bit."""
    from audit_star_spark.sources.testdata import load_table

    ev = load_table(spark, SF_DIR, "events")
    a = hll_partials(ev.filter(F.col("event_id") % 2 == 0), ["event_type"], "user_id")
    b = hll_partials(ev.filter(F.col("event_id") % 2 == 1), ["event_type"], "user_id")
    merged = hll_estimate(hll_merge(a, b), ["event_type"])
    whole = hll_distinct(ev, ["event_type"], "user_id")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_duckdb_differential_bit_exact(spark):
    got = sorted(
        map(
            tuple,
            hll_distinct(
                spark.read.parquet(f"{SF_DIR}/documents.parquet"),
                ["source"],
                "doc_id",
            ).collect(),
        )
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    want = sorted(
        tuple(r) for r in con.sql(hll_sql("documents", ["source"], "doc_id")).fetchall()
    )
    assert got == want and got


def test_small_range_linear_counting(spark):
    """A handful of distinct values must take the linear-counting branch
    and land very close (LC is near-exact when zeros ~ m)."""
    df = spark.createDataFrame(
        [(1, f"v{i % 7}") for i in range(1000)], "g int, v string"
    )
    row = hll_distinct(df, ["g"], "v").collect()[0]
    assert row["zeros"] > 0
    assert abs(row["est_distinct"] - 7) < 0.5
    assert row["n_hit"] <= 7


def test_streaming_hll_equals_batch_across_batches(spark, tmp_path):
    """Multi-batch ingest + replay + compact + more batches: read()
    always equals the one-shot batch sketch of everything ingested."""
    import os

    from audit_star_spark.sources.testdata import load_table
    from audit_star_spark.streaming.sketch import StreamingHLL

    ev = load_table(spark, SF_DIR, "events")
    s = StreamingHLL(str(tmp_path / "hll"), ["event_type"], "user_id")
    b = [ev.filter(F.col("event_id") % 3 == i) for i in range(3)]
    s.apply_batch(b[0], 0)
    s.apply_batch(b[1], 1)
    want2 = sorted(
        map(
            tuple,
            hll_distinct(b[0].unionByName(b[1]), ["event_type"], "user_id").collect(),
        )
    )
    assert sorted(map(tuple, s.read(spark).collect())) == want2
    s.apply_batch(b[1], 1)  # replay: idempotent
    assert sorted(map(tuple, s.read(spark).collect())) == want2
    s.compact(spark)
    assert sorted(map(tuple, s.read(spark).collect())) == want2
    s.apply_batch(b[1], 1)  # replay AFTER compaction: pruned
    assert sorted(map(tuple, s.read(spark).collect())) == want2
    s.apply_batch(b[2], 2)
    want3 = sorted(
        map(tuple, hll_distinct(ev, ["event_type"], "user_id").collect())
    )
    assert sorted(map(tuple, s.read(spark).collect())) == want3
    parts = {p for p in os.listdir(s.store_path) if p.startswith("ingest_")}
    assert parts == {"ingest_batch_id=-1", "ingest_batch_id=1", "ingest_batch_id=2"}


def test_streaming_hll_end_to_end_stream(spark, tmp_path):
    from audit_star_spark.sources.testdata import load_table
    from audit_star_spark.streaming.sketch import StreamingHLL

    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "event_type", "user_id"
    )
    src = str(tmp_path / "src")
    ev.repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    s = StreamingHLL(str(tmp_path / "hll"), ["event_type"], "user_id")
    s.ingest(stream, str(tmp_path / "ck")).awaitTermination()
    want = sorted(
        map(tuple, hll_distinct(ev, ["event_type"], "user_id").collect())
    )
    assert sorted(map(tuple, s.read(spark).collect())) == want


# ---------------------------------------------------- KMV / theta sketch


def test_kmv_exact_regime_and_merge_law(spark):
    from audit_star_spark.analytics.sketch import (
        kmv_estimate_expr,
        kmv_merge_expr,
        kmv_partials,
    )
    from audit_star_spark.sources.testdata import load_table

    ev = load_table(spark, SF_DIR, "events")
    # 15 distinct users << k=256: sketch is the exact distinct hash set
    sk = kmv_partials(ev, ["event_type"], "user_id")
    got = {
        r["event_type"]: r["est"]
        for r in sk.select(
            "event_type", kmv_estimate_expr("hs").alias("est")
        ).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got == {t: float(n) for t, n in exact.items()}
    # merge law: sketch(A) ∪ sketch(B) == sketch(A ∪ B), bit-equal arrays
    a = kmv_partials(
        ev.filter(F.col("event_id") % 2 == 0), ["event_type"], "user_id", k=8
    ).withColumnRenamed("hs", "hs_a")
    b = kmv_partials(
        ev.filter(F.col("event_id") % 2 == 1), ["event_type"], "user_id", k=8
    ).withColumnRenamed("hs", "hs_b")
    merged = {
        r["event_type"]: list(r["m"])
        for r in a.join(b, "event_type")
        .select("event_type", kmv_merge_expr("hs_a", "hs_b", k=8).alias("m"))
        .collect()
    }
    whole = {
        r["event_type"]: list(r["hs"])
        for r in kmv_partials(ev, ["event_type"], "user_id", k=8).collect()
    }
    assert merged == whole


def test_kmv_estimator_accuracy_large_set(spark):
    """Estimator regime: 20k distinct values, k=256 -> relative error
    well inside 4/sqrt(k-1) (~25%); typical is a few percent."""
    from audit_star_spark.analytics.sketch import (
        kmv_estimate_expr,
        kmv_partials,
    )

    df = spark.range(20000).select(
        F.lit(1).alias("g"), F.concat(F.lit("u"), F.col("id")).alias("v")
    )
    row = kmv_partials(df, ["g"], "v").select(
        kmv_estimate_expr("hs").alias("est")
    ).collect()[0]
    assert abs(row["est"] - 20000) / 20000 < 0.25


def test_kmv_intersection_estimate(spark):
    """Theta intersection on planted overlap: A = 0..11999,
    B = 8000..19999 -> |A ∩ B| = 4000; estimate within 4-sigma-ish."""
    from audit_star_spark.analytics.sketch import (
        kmv_intersection_expr,
        kmv_partials,
    )

    mk = lambda lo, hi, g: spark.range(lo, hi).select(
        F.lit(g).alias("g"), F.concat(F.lit("u"), F.col("id")).alias("v")
    )
    a = kmv_partials(mk(0, 12000, "a"), ["g"], "v").select(
        F.col("hs").alias("hs_a")
    )
    b = kmv_partials(mk(8000, 20000, "b"), ["g"], "v").select(
        F.col("hs").alias("hs_b")
    )
    row = a.crossJoin(b).select(
        kmv_intersection_expr("hs_a", "hs_b").alias("est")
    ).collect()[0]
    assert abs(row["est"] - 4000) / 4000 < 0.5


def test_kmv_duckdb_partials_bit_exact(spark):
    from audit_star_spark.analytics.sketch import kmv_partials, kmv_sql_partials

    got = {
        r["source"]: list(r["hs"])
        for r in kmv_partials(
            spark.read.parquet(f"{SF_DIR}/documents.parquet"),
            ["source"],
            "doc_id",
            k=16,
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    want = {
        r[0]: list(r[1])
        for r in con.sql(
            kmv_sql_partials("documents", ["source"], "doc_id", k=16)
        ).fetchall()
    }
    assert got == want and got
