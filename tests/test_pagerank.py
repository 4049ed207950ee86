"""PageRank (analytics/graph.py): conservation, known closed forms,
dangling handling, convergence direction, and input validation."""

import pytest
from pyspark.sql import functions as F


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _ranks(df):
    return {r["node"]: r["rank"] for r in df.collect()}


def test_rank_mass_is_conserved(spark):
    """Total rank must stay exactly 1 every run — the dangling
    redistribution is what makes this hold."""
    from audit_star_spark.analytics.graph import pagerank

    # 0->1->2, 2 dangling; 3 links to 0 (cycle-ish with a sink)
    e = _edges(spark, [(0, 1), (1, 2), (3, 0)])
    for it in (1, 4):
        total = sum(_ranks(pagerank(e, n_iter=it)).values())
        assert total == pytest.approx(1.0, abs=1e-12)


def test_symmetric_cycle_is_uniform_fixed_point(spark):
    """A directed cycle is vertex-transitive: uniform 1/N is the exact
    fixed point at any damping, any iteration count."""
    from audit_star_spark.analytics.graph import pagerank

    n = 5
    e = _edges(spark, [(i, (i + 1) % n) for i in range(n)])
    got = _ranks(pagerank(e, n_iter=7))
    for v in got.values():
        assert v == pytest.approx(1 / n, abs=1e-12)


def test_star_graph_hand_computed_one_iteration(spark):
    """Hub-and-spoke, one iteration, d=0.85: spokes 1..3 each link to 0;
    0 is dangling. r0 = 1/4 each; dangling mass = 1/4.
    r1(0) = 0.15/4 + 0.85*(3*(1/4) + (1/4)/4)
    r1(spoke) = 0.15/4 + 0.85*((1/4)/4)."""
    from audit_star_spark.analytics.graph import pagerank

    e = _edges(spark, [(1, 0), (2, 0), (3, 0)])
    got = _ranks(pagerank(e, n_iter=1))
    hub = 0.15 / 4 + 0.85 * (3 * 0.25 + 0.25 / 4)
    spoke = 0.15 / 4 + 0.85 * (0.25 / 4)
    assert got[0] == pytest.approx(hub, abs=1e-12)
    for s in (1, 2, 3):
        assert got[s] == pytest.approx(spoke, abs=1e-12)


def test_authority_outranks_spokes_and_parallel_edges_weigh(spark):
    from audit_star_spark.analytics.graph import pagerank

    # 1,2,3 -> 0; 4 -> 0 twice (parallel) and -> 1 once: 4's mass splits
    # 2/3 to 0, 1/3 to 1
    e = _edges(spark, [(1, 0), (2, 0), (3, 0), (4, 0), (4, 0), (4, 1)])
    got = _ranks(pagerank(e, n_iter=5))
    assert got[0] > got[1] > got[2] == pytest.approx(got[3], abs=1e-12)


def test_zero_iterations_is_uniform_and_validation(spark):
    from audit_star_spark.analytics.graph import pagerank

    e = _edges(spark, [(0, 1), (1, 0)])
    got = _ranks(pagerank(e, n_iter=0))
    assert got == {0: pytest.approx(0.5), 1: pytest.approx(0.5)}
    with pytest.raises(ValueError, match="n_iter"):
        pagerank(e, n_iter=-1)
    with pytest.raises(ValueError, match="damping"):
        pagerank(e, damping=1.5)


def test_edge_layout_reused_across_iterations(spark):
    """The corpus-sized edge list must be shuffled into its src-keyed
    layout ONCE: the per-iteration loop must not add Exchanges over the
    edge relation (localCheckpoint truncates it to a scan), and the rank
    update must keep its joins on the checkpointed layout."""
    from audit_star_spark.analytics.graph import pagerank

    e = _edges(spark, [(i, (i + 1) % 10) for i in range(10)])
    r = pagerank(e, n_iter=2)
    plan = r._jdf.queryExecution().executedPlan().toString()
    # final iteration's plan: contribs agg exchange + the nodes-side join
    # exchanges; the edge scan itself appears as a checkpointed RDD scan
    assert "Scan ExistingRDD" in plan or "LocalTableScan" in plan, plan
