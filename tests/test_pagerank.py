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


def test_reliable_checkpoint_mode_matches_local(spark, tmp_path):
    """checkpoint_dir swaps localCheckpoint for reliable checkpoint():
    identical ranks, and round data actually lands in the directory."""
    import os

    from audit_star_spark.analytics.graph import pagerank

    e = _edges(spark, [(0, 1), (1, 2), (2, 0), (3, 0), (1, 3)])
    want = _ranks(pagerank(e, n_iter=5))
    ckpt = str(tmp_path / "ckpt")
    got = _ranks(pagerank(e, n_iter=5, checkpoint_dir=ckpt))
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)
    # reliable files exist on stable storage
    found = [
        f for root, _, fs in os.walk(ckpt) for f in fs if f.startswith("part-")
    ]
    assert found


def test_tol_stops_at_fixed_point_vs_unrolled_oracle(spark):
    """With tol, iteration stops at the FIRST round k whose L1 delta
    from round k-1 is below tol — and the result equals the unrolled-CTE
    DuckDB oracle evaluated at exactly that k."""
    import duckdb

    from audit_star_spark.analytics.graph import (
        pagerank,
        pagerank_sql_iterations,
    )

    pairs = [(0, 1), (1, 2), (2, 0), (3, 0), (1, 3), (4, 1)]
    cte = "edges(src, dst) AS (VALUES " + ", ".join(
        f"({a}, {b})" for a, b in pairs
    ) + ")"

    def oracle(k):
        rows = duckdb.sql(pagerank_sql_iterations(cte, k)).fetchall()
        return {int(n): float(r) for n, r in rows}

    tol = 2e-2
    # find the expected stop round from the oracle itself
    k, prev = 1, oracle(1)
    while True:
        cur = oracle(k + 1)
        delta = sum(abs(cur[n] - prev[n]) for n in cur)
        k, prev = k + 1, cur
        if delta < tol:
            break
    assert k < 25  # converges; n_iter=25 cap never binds
    got = _ranks(pagerank(_edges(spark, pairs), n_iter=25, tol=tol))
    assert set(got) == set(prev)
    for n in prev:
        assert got[n] == pytest.approx(prev[n], abs=1e-9)
    with pytest.raises(ValueError, match="tol"):
        pagerank(_edges(spark, pairs), n_iter=5, tol=0.0)


def test_tol_none_runs_all_iterations(spark):
    """Without tol the behavior is unchanged: exactly n_iter rounds
    (locked by equality with the unrolled oracle at n_iter)."""
    import duckdb

    from audit_star_spark.analytics.graph import (
        pagerank,
        pagerank_sql_iterations,
    )

    pairs = [(0, 1), (1, 0), (2, 0)]
    cte = "edges(src, dst) AS (VALUES " + ", ".join(
        f"({a}, {b})" for a, b in pairs
    ) + ")"
    want = {
        int(n): float(r)
        for n, r in duckdb.sql(pagerank_sql_iterations(cte, 6)).fetchall()
    }
    got = _ranks(pagerank(_edges(spark, pairs), n_iter=6))
    for n in want:
        assert got[n] == pytest.approx(want[n], abs=1e-12)


# ------------------------------------------------------ triangle counting


def test_triangle_count_known_graphs(spark):
    from audit_star_spark.analytics.graph import triangle_count

    # K4: every node is in C(3,2)=3 triangles
    k4 = [(i, j) for i in range(4) for j in range(4) if i < j]
    got = {
        r["node"]: r["n_triangles"]
        for r in triangle_count(_edges(spark, k4)).collect()
    }
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}
    # triangle + pendant + disjoint edge; duplicates/reverses/self-loops fold
    e = [(0, 1), (1, 0), (1, 2), (2, 0), (2, 3), (4, 5), (6, 6), (0, 1)]
    got = {
        r["node"]: r["n_triangles"]
        for r in triangle_count(_edges(spark, e)).collect()
    }
    assert got == {0: 1, 1: 1, 2: 1}
    # triangle-free (star) -> empty
    assert triangle_count(_edges(spark, [(0, i) for i in range(1, 6)])).count() == 0


def test_triangle_count_matches_duckdb_on_random_graph(spark):
    import random

    import duckdb

    from audit_star_spark.analytics.graph import triangle_count, triangle_sql

    rng = random.Random(41)
    pairs = sorted({(rng.randrange(30), rng.randrange(30)) for _ in range(160)})
    cte = "edges(src, dst) AS (VALUES " + ", ".join(
        f"({a}, {b})" for a, b in pairs
    ) + ")"
    got = sorted(map(tuple, triangle_count(_edges(spark, pairs)).collect()))
    want = sorted(tuple(r) for r in duckdb.sql(triangle_sql(cte)).fetchall())
    assert got == want and got


def test_ppr_restarts_to_seeds_and_sums_to_one(spark):
    """PPR invariants on a small closed-form graph: ranks are a
    probability distribution; an unreachable component scores 0; seeds
    dominate their own neighborhoods."""
    from audit_star_spark.analytics.graph import personalized_pagerank

    # 0 -> 1 -> 2 (chain), 3 <-> 4 disconnected island
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (3, 4), (4, 3)], "src long, dst long"
    )
    r = {
        int(x["node"]): float(x["rank"])
        for x in personalized_pagerank(edges, seeds=[0], n_iter=20).collect()
    }
    assert abs(sum(r.values()) - 1.0) < 1e-9
    assert r[3] == 0.0 and r[4] == 0.0          # unreachable from seed
    assert r[0] > r[1] > r[2] > 0               # proximity ordering
    # a seed outside the edge set still holds its restart mass
    r2 = {
        int(x["node"]): float(x["rank"])
        for x in personalized_pagerank(
            edges, seeds=[99], n_iter=5
        ).collect()
    }
    assert abs(sum(r2.values()) - 1.0) < 1e-9
    assert r2[99] == 1.0  # dangling seed: all mass restarts home


def test_ppr_validates_params(spark):
    import pytest as _pytest

    from audit_star_spark.analytics.graph import personalized_pagerank

    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    with _pytest.raises(ValueError, match="seed"):
        personalized_pagerank(edges, seeds=[])


# ------------------------------------------------- HITS hubs/authorities
class TestHits:
    def _run(self, spark, edges, n_iter=3):
        from audit_star_spark.analytics.graph import hits

        df = spark.createDataFrame(edges, "src long, dst long")
        return {
            r["node"]: (r["hub"], r["authority"])
            for r in hits(df, n_iter=n_iter).collect()
        }

    @staticmethod
    def _model(edges, n_iter):
        nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
        h = {n: 1.0 for n in nodes}
        a = {}
        for _ in range(n_iter):
            a = {n: 0.0 for n in nodes}
            for u, v in edges:
                a[v] += h[u]
            t = sum(a.values()) or 1.0
            a = {n: x / t for n, x in a.items()}
            h = {n: 0.0 for n in nodes}
            for u, v in edges:
                h[u] += a[v]
            t = sum(h.values()) or 1.0
            h = {n: x / t for n, x in h.items()}
        return {n: (h[n], a[n]) for n in nodes}

    def test_matches_reference_model(self, spark):
        edges = [(1, 2), (1, 3), (2, 3), (4, 3), (3, 5), (2, 5), (5, 1)]
        got = self._run(spark, edges, n_iter=4)
        want = self._model(edges, 4)
        assert set(got) == set(want)
        for n in want:
            assert got[n][0] == pytest.approx(want[n][0], rel=1e-9), n
            assert got[n][1] == pytest.approx(want[n][1], rel=1e-9), n

    def test_hub_authority_separation(self, spark):
        """A pure directory page (links out, never linked) must be all
        hub and zero authority; a pure reference (linked, never links)
        the reverse — the structure HITS exists to detect."""
        edges = [(1, 10), (1, 11), (2, 10), (2, 11), (3, 10)]
        got = self._run(spark, edges, n_iter=3)
        for src in (1, 2, 3):
            assert got[src][1] == 0.0  # never linked -> no authority
            assert got[src][0] > 0.0
        for dst in (10, 11):
            assert got[dst][0] == 0.0  # never links out -> no hub
            assert got[dst][1] > 0.0
        # 10 is cited by all three hubs, 11 by two: strictly more authority
        assert got[10][1] > got[11][1]
        # hubs 1 and 2 cite both top authorities, 3 only one
        assert got[1][0] == pytest.approx(got[2][0], rel=1e-12)
        assert got[1][0] > got[3][0]

    def test_scores_normalize_to_one(self, spark):
        edges = [(i, (i * 3 + 1) % 7) for i in range(7)]
        got = self._run(spark, edges, n_iter=5)
        assert sum(h for h, _ in got.values()) == pytest.approx(1.0, abs=1e-9)
        assert sum(a for _, a in got.values()) == pytest.approx(1.0, abs=1e-9)

    def test_parallel_edges_count_twice(self, spark):
        once = self._run(spark, [(1, 2), (3, 2), (3, 4)], n_iter=2)
        twice = self._run(spark, [(1, 2), (1, 2), (3, 2), (3, 4)], n_iter=2)
        assert twice[1][0] > once[1][0]  # duplicated link boosts the hub

    def test_validation(self, spark):
        from audit_star_spark.analytics.graph import hits

        df = spark.createDataFrame([(1, 2)], "src long, dst long")
        with pytest.raises(ValueError):
            hits(df, n_iter=0)
