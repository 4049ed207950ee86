"""Parquet footer introspection: stats agree with the data, the pruning
estimate matches reality, and the z-order layout shows its skip ratio
through this surface too."""

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_footer_stats_match_data(spark, tmp_path):
    from audit_star_spark.plans.footer_stats import parquet_footer_stats
    from audit_star_spark.sources.testdata import load_table

    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    path = str(tmp_path / "o")
    orders.repartition(3).write.parquet(path)
    stats = parquet_footer_stats(spark, path)
    rows = stats.collect()
    assert {r["column"] for r in rows} == {"o_orderkey", "o_totalprice"}
    # per-column global min/max over groups == true min/max
    key = [r for r in rows if r["column"] == "o_orderkey"]
    true_min, true_max = orders.agg(
        F.min("o_orderkey"), F.max("o_orderkey")
    ).first()
    assert min(int(r["min_value"]) for r in key) == true_min
    assert max(int(r["max_value"]) for r in key) == true_max
    assert sum(r["n_rows"] for r in key) == orders.count()
    assert all(r["n_nulls"] == 0 for r in key)


def test_pruning_estimate_matches_actual_filter(spark, tmp_path):
    """hit_rows must upper-bound the true selection (stats are
    conservative) and prune a sorted layout to a strict subset."""
    from audit_star_spark.plans.footer_stats import (
        parquet_footer_stats,
        pruning_estimate,
    )
    from audit_star_spark.sources.testdata import load_table

    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    path = str(tmp_path / "sorted")
    orders.repartitionByRange(8, "o_orderkey").sortWithinPartitions(
        "o_orderkey"
    ).write.parquet(path)
    stats = parquet_footer_stats(spark, path)
    lo, hi = 1000, 2000
    est = pruning_estimate(stats, "o_orderkey", lo, hi).first()
    actual = orders.filter(
        (F.col("o_orderkey") >= lo) & (F.col("o_orderkey") <= hi)
    ).count()
    assert est["hit_rows"] >= actual
    assert est["hit_groups"] < est["total_groups"]  # sorted layout prunes
    assert est["total_rows"] == orders.count()


def test_unreadable_files_are_skipped(spark, tmp_path):
    from audit_star_spark.plans.footer_stats import parquet_footer_stats
    from audit_star_spark.sources.testdata import load_table

    load_table(spark, SF_DIR, "region").write.parquet(str(tmp_path / "ok"))
    (tmp_path / "ok" / "garbage.parquet").write_bytes(b"not parquet")
    rows = parquet_footer_stats(spark, str(tmp_path / "ok")).collect()
    assert rows and all("garbage" not in r["file"] for r in rows)
