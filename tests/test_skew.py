"""Skew helpers: salted join and two-phase aggregation must return exactly
the rows/values of their plain equivalents."""

from pyspark.sql import functions as F

from audit_star_spark.operators.skew import salted_join, two_phase_count


def _skewed(spark):
    # 10k rows of key 1 (hot) + 100 unique keys
    hot = spark.range(10_000).select(F.lit(1).alias("k"), F.col("id").alias("v"))
    cold = spark.range(100).select((F.col("id") + 2).alias("k"), F.col("id").alias("v"))
    return hot.unionByName(cold)


def test_salted_join_matches_plain_join(spark):
    big = _skewed(spark)
    small = spark.range(50).select((F.col("id") + 1).alias("k"), F.lit("x").alias("tag"))
    plain = big.join(small, "k").groupBy("k").count()
    salted = salted_join(big, small, "k").groupBy("k").count()
    assert {tuple(r) for r in plain.collect()} == {tuple(r) for r in salted.collect()}


def test_salted_left_join_keeps_unmatched(spark):
    big = _skewed(spark)
    small = spark.range(1).select((F.col("id") + 1).alias("k"), F.lit("x").alias("tag"))
    out = salted_join(big, small, "k", how="left")
    assert out.count() == big.count()
    assert out.filter(F.col("tag").isNull()).count() == 100


def test_two_phase_count_matches_plain_agg(spark):
    df = _skewed(spark)
    plain = {r["k"]: r["s"] for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()}
    two = {r["k"]: r["s"] for r in two_phase_count(df, "k", F.col("v"), "s").collect()}
    assert plain == two


def test_dedup_clusters_connected_components(spark):
    """Chain 1-2-3, pair 10-11, singleton edge 20-21: min-label components."""
    from audit_star_spark.analytics.dedup import dedup_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (3, 7)],
        "doc_a long, doc_b long",
    )
    want = {1: 1, 2: 1, 3: 1, 7: 1, 10: 10, 11: 10, 20: 20, 21: 20}
    # driver union-find fast path (default) AND the distributed
    # min-label-propagation fixpoint must produce identical labels
    got = {r["doc_id"]: r["cluster_id"] for r in dedup_clusters(pairs).collect()}
    assert got == want
    dist = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup_clusters(pairs, driver_cc_max_edges=0).collect()
    }
    assert dist == want
    # probe-then-fall-through: bound smaller than the edge count routes to
    # the distributed path AFTER the persist+count probe (r2 regression
    # surface: the probe cache must hand off cleanly)
    over = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup_clusters(pairs, driver_cc_max_edges=2).collect()
    }
    assert over == want


def test_label_nn_salted_matches_unsalted(spark):
    """Hot-label guard (VERDICT r01): the salted within-label self-join
    must return exactly the same nearest neighbors as salt_buckets=1, on a
    deliberately skewed label distribution (one label owns 80% of rows)."""
    import random

    from pyspark.sql import Row

    from audit_star_spark.analytics.similarity import label_nearest_neighbor

    rng = random.Random(7)
    rows = [
        Row(
            vec_id=i,
            label="hot" if i < 160 else f"cold_{i % 5}",
            embedding=[rng.uniform(-1, 1) for _ in range(8)],
        )
        for i in range(200)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, label string, embedding array<float>")
    plain = label_nearest_neighbor(emb, salt_buckets=1).collect()
    salted = label_nearest_neighbor(emb, salt_buckets=8).collect()
    assert {tuple(r) for r in plain} == {tuple(r) for r in salted}
    assert len(salted) == 200


def test_stratified_sample_nested_and_deterministic(spark):
    """Raising a language's keep rate must only ADD documents (nested
    buckets), and re-running must return the identical set."""
    from audit_star_spark.analytics.text import stratified_sample
    from audit_star_spark.sources.testdata import load_table
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    s20 = {r.doc_id for r in stratified_sample(docs, {"en": 20}).collect()}
    s50 = {r.doc_id for r in stratified_sample(docs, {"en": 50}).collect()}
    assert s20 <= s50 and len(s20) < len(s50)
    again = {r.doc_id for r in stratified_sample(docs, {"en": 20}).collect()}
    assert again == s20


def test_salted_join_rejects_zero_buckets(spark):
    import pytest as _pytest

    big = spark.range(4).withColumnRenamed("id", "k")
    small = spark.range(2).withColumnRenamed("id", "k")
    with _pytest.raises(ValueError):
        salted_join(big, small, on="k", salt_buckets=0)


def test_heavy_hitters_exact_counts_and_ratio(spark):
    import pytest
    from pyspark.sql import functions as F

    from audit_star_spark.operators.skew import heavy_hitters

    # key 1: 6 rows, key 2: 3 rows, keys 3..5: 1 row each -> 12 rows, 5 keys
    rows = [(1,)] * 6 + [(2,)] * 3 + [(3,), (4,), (5,)]
    df = spark.createDataFrame(rows, "k long")
    got = heavy_hitters(df, ["k"], k=2).collect()
    assert [(r["k"], r["n"]) for r in got] == [(1, 6), (2, 3)]
    assert got[0]["share"] == 6 / 12
    assert got[0]["skew_ratio"] == 6 * 5 / 12  # 2.5x the mean key
    # deterministic tie-break: equal counts order by key ascending
    ties = spark.createDataFrame([(9,), (7,), (8,)], "k long")
    got = heavy_hitters(ties, ["k"], k=3).collect()
    assert [r["k"] for r in got] == [7, 8, 9]
    assert all(r["skew_ratio"] == 1.0 for r in got)
    with pytest.raises(ValueError, match="k must be"):
        heavy_hitters(df, ["k"], k=0)


def test_heavy_hitters_sampled_contract_holds_on_real_events(spark):
    """The 4-sigma binomial contract must hold for every top-10 key on
    the real event stream, and the estimate must be in the right
    ballpark (not zero, not 10x off) for genuinely hot keys."""
    from audit_star_spark.operators.skew import heavy_hitters_sampled
    from audit_star_spark.sources.testdata import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    got = heavy_hitters_sampled(
        ev, ["user_id"], row_id="event_id", k=10, rate_pct=10
    ).collect()
    assert len(got) == 10
    assert all(r["within_contract"] for r in got), got
    for r in got:
        assert 0 < r["est_n"] < 3 * r["n"]


def test_heavy_hitters_sampled_full_rate_is_exact(spark):
    """rate_pct=100 samples everything: est must equal n exactly."""
    from audit_star_spark.operators.skew import heavy_hitters_sampled

    rows = [(i, i % 3) for i in range(60)]
    df = spark.createDataFrame(rows, "rid long, k long")
    got = heavy_hitters_sampled(df, ["k"], row_id="rid", k=3, rate_pct=100).collect()
    assert [(r["k"], r["n"], r["est_n"]) for r in got] == [
        (0, 20, 20.0),
        (1, 20, 20.0),
        (2, 20, 20.0),
    ]
    assert all(r["within_contract"] for r in got)


def test_heavy_hitters_sampled_validation(spark):
    import pytest

    from audit_star_spark.operators.skew import heavy_hitters_sampled

    df = spark.createDataFrame([(1, 1)], "rid long, k long")
    with pytest.raises(ValueError, match="rate_pct"):
        heavy_hitters_sampled(df, ["k"], row_id="rid", rate_pct=0)
    with pytest.raises(ValueError, match="k must be"):
        heavy_hitters_sampled(df, ["k"], row_id="rid", k=0)
