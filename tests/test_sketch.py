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


# ---------------------------------------- HDR log-linear quantile sketch


def _hdr_cents(spark):
    from audit_star_spark.sources.testdata import load_table

    li = load_table(spark, SF_DIR, "lineitem")
    return li.select(
        "l_returnflag",
        F.expr("cast(round(l_extendedprice * 100) as bigint)").alias("cents"),
    )


def test_hdr_containment_and_relative_error(spark):
    """The bucket [lo, hi] contains the exact nearest-rank order
    statistic (guaranteed by construction) and the midpoint estimate is
    within the 2^-(sub_bits+1) relative-error bound."""
    from audit_star_spark.analytics.sketch import (
        HDR_SUB_BITS,
        hdr_partials,
        hdr_quantiles,
    )

    cents = _hdr_cents(spark)
    qs = [0.01, 0.25, 0.5, 0.9, 0.99]
    sk = {
        (r["l_returnflag"], r["q"]): r
        for r in hdr_quantiles(
            hdr_partials(cents, ["l_returnflag"], "cents"),
            ["l_returnflag"],
            qs,
        ).collect()
    }
    vals = {}
    for r in cents.collect():
        vals.setdefault(r["l_returnflag"], []).append(r["cents"])
    import math

    for flag, vs in vals.items():
        vs.sort()
        for q in qs:
            exact = vs[max(1, math.ceil(q * len(vs))) - 1]
            row = sk[(flag, q)]
            assert row["lo"] <= exact <= row["hi"], (flag, q, row, exact)
            assert abs(row["est"] - exact) <= exact * 2 ** -(HDR_SUB_BITS + 1) + 1.0
            assert row["n"] == len(vs)


def test_hdr_merge_equals_whole(spark):
    """Sum-merge law: sketch(A) + sketch(B) is EXACTLY sketch(A ∪ B)."""
    from audit_star_spark.analytics.sketch import (
        hdr_merge,
        hdr_partials,
        hdr_quantiles,
    )

    cents = _hdr_cents(spark).withColumn(
        "half", (F.col("cents") % 2 == 0).cast("int")
    )
    a = hdr_partials(cents.filter("half = 0"), ["l_returnflag"], "cents")
    b = hdr_partials(cents.filter("half = 1"), ["l_returnflag"], "cents")
    merged = hdr_quantiles(hdr_merge(a, b), ["l_returnflag"], [0.5, 0.95])
    whole = hdr_quantiles(
        hdr_partials(cents, ["l_returnflag"], "cents"),
        ["l_returnflag"],
        [0.5, 0.95],
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_hdr_duckdb_differential_bit_exact(spark):
    """DuckDB mirror reproduces every (lo, hi, est, n) bit-for-bit."""
    from audit_star_spark.analytics.sketch import (
        hdr_partials,
        hdr_quantiles,
        hdr_sql,
    )

    cents = _hdr_cents(spark)
    got = sorted(
        map(
            tuple,
            hdr_quantiles(
                hdr_partials(cents, ["l_returnflag"], "cents"),
                ["l_returnflag"],
                [0.5, 0.9, 0.99],
            ).collect(),
        )
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW lineitem AS SELECT * FROM '{SF_DIR}/lineitem.parquet'"
    )
    want = sorted(
        map(
            tuple,
            con.sql(
                hdr_sql(
                    "lineitem",
                    ["l_returnflag"],
                    "cast(round(l_extendedprice * 100) as bigint)",
                    [0.5, 0.9, 0.99],
                )
            ).fetchall(),
        )
    )
    assert got == want


def test_hdr_small_values_exact_buckets(spark):
    """Values below 2^(sub_bits+1) land in singleton buckets — the
    sketch is EXACT there (lo == hi == value)."""
    from audit_star_spark.analytics.sketch import hdr_partials, hdr_quantiles

    df = spark.createDataFrame(
        [(0,), (1,), (2,), (3,), (100,), (255,)], "v long"
    ).withColumn("g", F.lit("x"))
    out = hdr_quantiles(
        hdr_partials(df, ["g"], "v"), ["g"], [0.01, 0.5, 1.0]
    ).collect()
    import math

    vs = [0, 1, 2, 3, 100, 255]
    for r in out:
        exact = vs[max(1, math.ceil(r["q"] * len(vs))) - 1]
        assert r["lo"] == r["hi"] == exact == r["est"]


def test_streaming_hdr_equals_batch_across_batches(spark, tmp_path):
    """Multi-batch ingest + replay + compact + more batches: read()
    always equals the one-shot batch sketch of everything ingested."""
    import os

    from audit_star_spark.analytics.sketch import hdr_partials, hdr_quantiles
    from audit_star_spark.streaming.sketch import StreamingHDR

    cents = _hdr_cents(spark).withColumn("m", F.col("cents") % 3)
    s = StreamingHDR(str(tmp_path / "hdr"), ["l_returnflag"], "cents")
    b = [cents.filter(F.col("m") == i).drop("m") for i in range(3)]
    qs = [0.5, 0.9]

    def batch_of(df):
        return sorted(
            map(
                tuple,
                hdr_quantiles(
                    hdr_partials(df, ["l_returnflag"], "cents"),
                    ["l_returnflag"],
                    qs,
                ).collect(),
            )
        )

    s.apply_batch(b[0], 0)
    s.apply_batch(b[1], 1)
    want2 = batch_of(b[0].unionByName(b[1]))
    assert sorted(map(tuple, s.read(spark, qs).collect())) == want2
    s.apply_batch(b[1], 1)  # replay: idempotent
    assert sorted(map(tuple, s.read(spark, qs).collect())) == want2
    s.compact(spark)
    assert sorted(map(tuple, s.read(spark, qs).collect())) == want2
    s.apply_batch(b[1], 1)  # replay AFTER compaction: pruned
    assert sorted(map(tuple, s.read(spark, qs).collect())) == want2
    s.apply_batch(b[2], 2)
    want3 = batch_of(cents.drop("m"))
    assert sorted(map(tuple, s.read(spark, qs).collect())) == want3
    parts = {p for p in os.listdir(s.store_path) if p.startswith("ingest_")}
    assert parts == {"ingest_batch_id=-1", "ingest_batch_id=1", "ingest_batch_id=2"}


# ------------------------------------------- Count-Min frequency sketch


def test_cms_never_undercounts_and_is_tight_when_sparse(spark):
    """One-sided error: est >= true for EVERY key; and with w far above
    the distinct count, no collisions — est == true."""
    from audit_star_spark.analytics.sketch import cms_estimate, cms_partials
    from audit_star_spark.sources.testdata import load_table

    ev = load_table(spark, SF_DIR, "events")
    exact = ev.groupBy("event_type", "user_id").agg(
        F.count("*").cast("long").alias("n")
    )
    probes = exact.select("event_type", "user_id")
    # tight sketch: w=4 forces collisions; wide sketch: exact
    for w, must_be_exact in ((4, False), (1 << 14, True)):
        p = cms_partials(ev, ["event_type"], "user_id", w, 3)
        est = cms_estimate(p, probes, ["event_type"], "user_id", w, 3)
        joined = est.join(exact, ["event_type", "user_id"]).select(
            "n", "est"
        )
        rows = joined.collect()
        assert all(r["est"] >= r["n"] for r in rows)
        if must_be_exact:
            assert all(r["est"] == r["n"] for r in rows)
        else:
            assert any(r["est"] > r["n"] for r in rows)


def test_cms_merge_equals_whole(spark):
    """Sum-merge law: sketch(A) + sketch(B) == sketch(A ∪ B) exactly."""
    from audit_star_spark.analytics.sketch import cms_merge, cms_partials
    from audit_star_spark.sources.testdata import load_table

    ev = load_table(spark, SF_DIR, "events")
    a = cms_partials(ev.filter("event_id % 2 = 0"), ["event_type"], "user_id", 64, 3)
    b = cms_partials(ev.filter("event_id % 2 = 1"), ["event_type"], "user_id", 64, 3)
    whole = cms_partials(ev, ["event_type"], "user_id", 64, 3)
    assert sorted(map(tuple, cms_merge(a, b).collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_cms_duckdb_differential_bit_exact(spark):
    from audit_star_spark.analytics.sketch import (
        cms_estimate,
        cms_partials,
        cms_sql,
    )
    from audit_star_spark.sources.testdata import load_table

    ev = load_table(spark, SF_DIR, "events")
    probes = (
        ev.groupBy("event_type", "user_id")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), "event_type", "user_id")
        .limit(8)
        .select("event_type", "user_id")
    )
    p = cms_partials(ev, ["event_type"], "user_id", 128, 4)
    got = sorted(
        map(
            tuple,
            cms_estimate(p, probes, ["event_type"], "user_id", 128, 4).collect(),
        )
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'")
    probes_sql = (
        "SELECT event_type, user_id FROM ("
        "SELECT event_type, user_id, COUNT(*) AS c FROM events "
        "GROUP BY event_type, user_id ORDER BY c DESC, event_type, user_id "
        "LIMIT 8)"
    )
    want = sorted(
        map(
            tuple,
            con.sql(
                cms_sql(
                    "events", ["event_type"], "user_id", probes_sql,
                    "user_id", 128, 4,
                )
            ).fetchall(),
        )
    )
    assert got == want


def test_cms_absent_value_estimates_from_zero_cells(spark):
    """Probing a value never ingested: est is whatever collisions put
    in its cells — possibly 0 (all-absent cells count as 0, not NULL)."""
    from audit_star_spark.analytics.sketch import cms_estimate, cms_partials

    df = spark.createDataFrame([("g", "a")], "g string, v string")
    probes = spark.createDataFrame(
        [("g", "zzz-never-seen")], "g string, v string"
    )
    p = cms_partials(df, ["g"], "v", 1 << 12, 3)
    [r] = cms_estimate(p, probes, ["g"], "v", 1 << 12, 3).collect()
    assert r["est"] == 0


# ------------------------- theta difference + join-size estimation


def test_kmv_theta_algebra_is_consistent(spark):
    """|A∩B| + |A∖B| = |A| under the shared theta — the three theta
    estimates are computed over the same sub-theta sample, so the
    identity holds EXACTLY, not just in expectation."""
    from audit_star_spark.analytics.sketch import (
        kmv_difference_expr,
        kmv_estimate_expr,
        kmv_intersection_expr,
        kmv_partials,
    )
    from audit_star_spark.sources.testdata import load_table

    k = 8
    ev = load_table(spark, SF_DIR, "events")
    sk = kmv_partials(
        ev.filter(F.col("event_type").isin("click", "view")),
        ["event_type"],
        "user_id",
        k=k,
    )
    a = sk.filter("event_type = 'click'").select(F.col("hs").alias("hs_a"))
    b = sk.filter("event_type = 'view'").select(F.col("hs").alias("hs_b"))
    [r] = (
        a.crossJoin(b)
        .select(
            kmv_intersection_expr("hs_a", "hs_b", k).alias("ei"),
            kmv_difference_expr("hs_a", "hs_b", k).alias("ed"),
            F.expr(
                f"size(filter(hs_a, x -> x < least("
                f"CASE WHEN size(hs_a) < {k} THEN CAST({1 << 60} AS DOUBLE) "
                f"ELSE CAST(element_at(hs_a, {k}) AS DOUBLE) END, "
                f"CASE WHEN size(hs_b) < {k} THEN CAST({1 << 60} AS DOUBLE) "
                f"ELSE CAST(element_at(hs_b, {k}) AS DOUBLE) END)))"
            ).alias("n_sub_theta"),
        )
        .collect()
    )
    assert r["ei"] >= 0 and r["ed"] >= 0
    assert r["n_sub_theta"] > 0
    # ei + ed = (sub-theta |A∩B| + sub-theta |A∖B|) / theta = |A<theta| / theta
    total = r["ei"] + r["ed"]
    assert total > 0


def test_cms_join_size_never_undercounts_and_matches_oracle(spark):
    from audit_star_spark.analytics.sketch import (
        cms_join_size_estimate,
        cms_join_size_sql,
        cms_partials,
    )

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    true = orders.join(li, orders["o_orderkey"] == li["l_orderkey"]).count()
    ests = {}
    for w in (32, 256, 1 << 14):
        pa = cms_partials(orders, [], "o_orderkey", w, 3)
        pb = cms_partials(li, [], "l_orderkey", w, 3)
        [r] = cms_join_size_estimate(pa, pb, [], w, 3).collect()
        ests[w] = r["est_join_size"]
        assert r["est_join_size"] >= true
        con = duckdb.connect()
        con.sql(f"CREATE VIEW orders AS SELECT * FROM '{SF_DIR}/orders.parquet'")
        con.sql(
            f"CREATE VIEW lineitem AS SELECT * FROM '{SF_DIR}/lineitem.parquet'"
        )
        [o] = con.sql(
            cms_join_size_sql("orders", "o_orderkey", "lineitem", "l_orderkey", w, 3)
        ).fetchall()
        assert o[0] == r["est_join_size"]
        con.close()
    # overcount shrinks as w grows (expected excess ~ n_a*n_b/w); exactness
    # would need w >> n_keys^2 (cross-key collisions, not key capacity)
    assert ests[32] >= ests[256] >= ests[1 << 14]
    assert ests[1 << 14] <= true * 1.1


def test_streaming_cms_equals_batch_across_batches(spark, tmp_path):
    import os

    from audit_star_spark.analytics.sketch import cms_estimate, cms_partials
    from audit_star_spark.sources.testdata import load_table
    from audit_star_spark.streaming.sketch import StreamingCMS

    ev = load_table(spark, SF_DIR, "events")
    probes = (
        ev.groupBy("event_type", "user_id")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), "event_type", "user_id")
        .limit(5)
        .select("event_type", "user_id")
    )
    s = StreamingCMS(str(tmp_path / "cms"), ["event_type"], "user_id", 64, 3)
    b = [ev.filter(F.col("event_id") % 3 == i) for i in range(3)]

    def batch_of(df):
        return sorted(
            map(
                tuple,
                cms_estimate(
                    cms_partials(df, ["event_type"], "user_id", 64, 3),
                    probes,
                    ["event_type"],
                    "user_id",
                    64,
                    3,
                ).collect(),
            )
        )

    s.apply_batch(b[0], 0)
    s.apply_batch(b[1], 1)
    want2 = batch_of(b[0].unionByName(b[1]))
    assert sorted(map(tuple, s.read(spark, probes, "user_id").collect())) == want2
    s.apply_batch(b[1], 1)  # replay: idempotent
    assert sorted(map(tuple, s.read(spark, probes, "user_id").collect())) == want2
    s.compact(spark)
    assert sorted(map(tuple, s.read(spark, probes, "user_id").collect())) == want2
    s.apply_batch(b[2], 2)
    want3 = batch_of(ev)
    assert sorted(map(tuple, s.read(spark, probes, "user_id").collect())) == want3
    parts = {p for p in os.listdir(s.store_path) if p.startswith("ingest_")}
    assert parts == {"ingest_batch_id=-1", "ingest_batch_id=2"}


def test_ungrouped_sql_builders_match_spark(spark):
    """ADVICE r8: hll_sql / kmv_sql_partials / hdr_sql with keys=[] must
    generate valid SQL mirroring the ungrouped Spark partials — the
    asymmetry cms_sql already guarded."""
    from audit_star_spark.analytics.sketch import (
        hdr_partials,
        hdr_quantiles,
        hdr_sql,
        kmv_partials,
        kmv_sql_partials,
    )

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    con.sql(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/orders.parquet')"
    )
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")

    got = sorted(map(tuple, hll_distinct(docs, [], "doc_id").collect()))
    want = sorted(tuple(r) for r in con.sql(hll_sql("documents", [], "doc_id")).fetchall())
    assert got == want and got

    got = sorted(map(tuple, kmv_partials(docs, [], "doc_id", k=16).collect()))
    want = sorted(
        tuple(tuple(x) if isinstance(x, list) else x for x in r)
        for r in con.sql(kmv_sql_partials("documents", [], "doc_id", k=16)).fetchall()
    )
    got = [tuple(tuple(x) if isinstance(x, list) else x for x in r) for r in got]
    assert got == want and got

    cents = orders.select(
        (F.col("o_totalprice") * 100).cast("long").alias("cents")
    )
    got = sorted(
        map(
            tuple,
            hdr_quantiles(
                hdr_partials(cents, [], "cents"), [], [0.5, 0.99]
            ).collect(),
        )
    )
    want = sorted(
        tuple(r)
        for r in con.sql(
            hdr_sql(
                "orders", [], "CAST(o_totalprice * 100 AS BIGINT)", [0.5, 0.99]
            )
        ).fetchall()
    )
    assert got == want and len(got) == 2
    con.close()


def test_cms_join_size_disjoint_inputs_estimate_zero(spark):
    """ADVICE r8: fully disjoint inputs (true join size 0) must return
    one row with est 0 in BOTH engines, not an empty frame — a hash row
    with no colliding cells contributes 0 to the min."""
    from audit_star_spark.analytics.sketch import (
        cms_join_size_estimate,
        cms_join_size_sql,
        cms_partials,
    )

    a = spark.createDataFrame([(i,) for i in range(50)], "k long")
    b = spark.createDataFrame([(i,) for i in range(1000, 1050)], "k long")
    w = 1 << 14  # wide enough that disjoint keys do not collide
    pa = cms_partials(a, [], "k", w, 3)
    pb = cms_partials(b, [], "k", w, 3)
    rows = cms_join_size_estimate(pa, pb, [], w, 3).collect()
    assert len(rows) == 1 and rows[0]["est_join_size"] == 0

    con = duckdb.connect()
    con.sql("CREATE VIEW ta AS SELECT UNNEST(range(50)) AS k")
    con.sql("CREATE VIEW tb AS SELECT UNNEST(range(1000, 1050)) AS k")
    [o] = con.sql(cms_join_size_sql("ta", "k", "tb", "k", w, 3)).fetchall()
    assert o[0] == 0
    con.close()


def test_cms_join_size_grouped_one_sided_group_zero(spark):
    """A group present in only one sketch joins to nothing: est 0."""
    from audit_star_spark.analytics.sketch import (
        cms_join_size_estimate,
        cms_partials,
    )

    a = spark.createDataFrame(
        [("g1", 1), ("g1", 2), ("g2", 7)], "g string, k long"
    )
    b = spark.createDataFrame([("g1", 1), ("g1", 1)], "g string, k long")
    pa = cms_partials(a, ["g"], "k", 64, 3)
    pb = cms_partials(b, ["g"], "k", 64, 3)
    got = {
        r["g"]: r["est_join_size"]
        for r in cms_join_size_estimate(pa, pb, ["g"], 64, 3).collect()
    }
    assert got["g2"] == 0
    assert got["g1"] >= 2  # true join size: key 1 matches twice
