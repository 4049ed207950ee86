"""Z-order layout (plans/zorder.py): Morton-key math, and the actual
data-skipping win measured from real parquet row-group statistics."""

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_morton_expr_interleaves_known_bits(spark):
    from audit_star_spark.plans.zorder import morton_expr

    df = spark.createDataFrame(
        [(0b1010, 0b0110), (0, 0), (0b1111, 0b0000)], "a long, b long"
    )
    got = [
        r["z"]
        for r in df.select(
            morton_expr(["a", "b"], width=4).alias("z")
        ).collect()
    ]
    # bit j of a -> position 2j; bit j of b -> position 2j+1
    def interleave(a, b):
        z = 0
        for j in range(4):
            z |= ((a >> j) & 1) << (2 * j)
            z |= ((b >> j) & 1) << (2 * j + 1)
        return z

    assert got == [interleave(0b1010, 0b0110), 0, interleave(0b1111, 0)]


def test_morton_validation(spark):
    from audit_star_spark.plans.zorder import morton_expr

    with pytest.raises(ValueError, match="1-4"):
        morton_expr([], width=8)
    with pytest.raises(ValueError, match="overflow|BIGINT"):
        morton_expr(["a", "b", "c", "d"], width=16)


def test_zorder_key_is_in_row_after_bounds(spark):
    """Beyond the 1-row bounds aggregate (broadcast), the key attach
    adds no shuffle."""
    from audit_star_spark.plans.zorder import zorder_key
    from audit_star_spark.sources.testdata import load_table

    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    df = zorder_key(orders, ["o_custkey", "o_totalprice"], width=8)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert plan.count("Exchange hashpartitioning") == 0, plan
    rows = df.limit(5).collect()
    assert all(r["__zkey"] >= 0 for r in rows)


def _box_hit_fraction(path, col_a, lo_a, hi_a, col_b, lo_b, hi_b):
    """Fraction of parquet row groups whose [min,max] box intersects the
    query box — what predicate pushdown would actually read."""
    total = hit = 0
    for piece in pq.ParquetDataset(path).files:
        md = pq.ParquetFile(piece).metadata
        sch = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            sa = g.column(sch[col_a]).statistics
            sb = g.column(sch[col_b]).statistics
            total += 1
            if (
                sa.min <= hi_a
                and sa.max >= lo_a
                and float(sb.min) <= hi_b
                and float(sb.max) >= lo_b
            ):
                hit += 1
    assert total > 0
    return hit / total


def test_zorder_layout_skips_more_rowgroups_than_single_sort(
    spark, tmp_path
):
    """The measurable claim: for a conjunctive range box on BOTH
    clustered columns, the z-ordered layout's row-group stats prune
    strictly more groups than a layout sorted by the first column only
    (which can never prune on the second)."""
    from audit_star_spark.plans.zorder import write_zordered
    from audit_star_spark.sources.testdata import load_table

    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    # many small files => many row groups at sf0.001, enough tiles on the
    # z-curve for the box to show differential pruning
    zpath = str(tmp_path / "z")
    spath = str(tmp_path / "s")
    write_zordered(
        orders, zpath, ["o_custkey", "o_totalprice"], n_files=32, width=16
    )
    (
        orders.repartitionByRange(32, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite")
        .parquet(spath)
    )

    # wide on the sort column, NARROW on the second: a custkey-only sort
    # cannot prune on price at all, so its hit fraction ~= the custkey
    # width; the z-layout prunes on both
    stats = orders.agg(
        F.expr("percentile(o_custkey, array(0.2, 0.8))").alias("c"),
        F.expr("percentile(o_totalprice, array(0.45, 0.55))").alias("p"),
    ).collect()[0]
    (lo_c, hi_c), (lo_p, hi_p) = stats["c"], stats["p"]

    z_frac = _box_hit_fraction(
        zpath, "o_custkey", lo_c, hi_c, "o_totalprice", lo_p, hi_p
    )
    s_frac = _box_hit_fraction(
        spath, "o_custkey", lo_c, hi_c, "o_totalprice", lo_p, hi_p
    )
    # single-column sort prunes on custkey only (~20% survive); z-order
    # must prune on both and read strictly fewer groups
    assert z_frac < s_frac, (z_frac, s_frac)
    assert z_frac < 0.6


def test_zordered_read_roundtrip_preserves_rows(spark, tmp_path):
    from audit_star_spark.plans.zorder import write_zordered
    from audit_star_spark.sources.testdata import load_table

    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    path = str(tmp_path / "rt")
    write_zordered(orders, path, ["o_custkey", "o_totalprice"], n_files=3)
    back = spark.read.parquet(path)
    assert back.columns == ["o_orderkey", "o_custkey", "o_totalprice"]
    assert back.count() == orders.count()
    assert back.agg(F.sum("o_orderkey")).first()[0] == orders.agg(
        F.sum("o_orderkey")
    ).first()[0]
