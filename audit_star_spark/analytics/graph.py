"""Link-graph analytics: join-based PageRank over an edge DataFrame.

Web-scale corpus curation weights documents by the link structure of the
crawl (the original PageRank use, still the backbone of crawl-frontier
prioritization and per-domain quality priors). The operator takes any
(src, dst) edge DataFrame — e.g. ``html.extract_links`` output mapped to
doc or domain ids — and runs the classic damped iteration:

    rank(v) = (1-d)/N + d * (sum_{u -> v} rank(u)/out(u) + dangling/N)

with dangling-node mass (nodes with no outlinks) redistributed uniformly,
so total rank mass stays 1 every iteration (asserted in tests).

100 TB shape: the canonical join-based formulation — per iteration ONE
equi join of ranks against the (src-keyed) edge list and ONE dst-keyed
aggregation with map-side partial sums. The edge list with out-degrees is
computed once, repartitioned by src and lazily localCheckpoint-ed, so
every iteration's join reuses the same co-located partitioning without
re-shuffling the (corpus-sized) edges; only the (node-sized) rank table
moves. The dangling flag (node has no out-links) is folded into the
materialized node frame ONCE and carried through every rank frame, so
the per-round dangling probe is a 1-row broadcast aggregate over the
already-materialized ranks — no per-round re-derivation of out-degrees
and no node-sized broadcast anti-join side. N is a single bounded
driver read before the loop (the k-means shift-probe pattern);
per-iteration materialization bounds lineage depth exactly like the BPE
trainer (bpe.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from audit_star_spark.plans.iterate import iter_materialize


def pagerank(
    edges: DataFrame,
    n_iter: int = 10,
    damping: float = 0.85,
    tol: float | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Ranks after ``n_iter`` damped iterations from a uniform start.

    ``edges``: (src, dst) pairs; duplicate edges count as parallel links
    (weight 2), matching the multigraph the raw href explode produces.
    Returns (node, rank) for every node appearing as src or dst.

    ``tol``: optional convergence stop — iteration ends early once the
    L1 rank delta ``sum(|rank_t - rank_{t-1}|)`` drops below it (the
    probe is a 1-row aggregate over the already-materialized node-sized
    rank tables, same shape as the k-means shift probe; ``n_iter`` stays
    the hard cap). Without it a converged graph keeps paying full
    rounds.

    ``checkpoint_dir``: opt-in reliable fault tolerance — each round
    (and the reused node/edge layouts) checkpoints to this
    HDFS-compatible directory instead of executor-local storage, so an
    executor loss resumes from the last round rather than invalidating
    non-recomputable localCheckpoint blocks and restarting the whole
    iteration (plans/iterate.py has the full trade).

    Note: construction is EAGER — N is read once via ``nodes.count()``
    at call time (the bounded shift-probe pattern), which materializes
    the node frame even if the caller never collects the result. The
    iteration loop is driver-side anyway, so a lazy-until-collected
    pagerank was never on offer past n_iter=0."""
    if n_iter < 0:
        raise ValueError(f"n_iter must be >= 0, got {n_iter}")
    if not 0.0 <= damping <= 1.0:
        raise ValueError(f"damping must be in [0, 1], got {damping}")
    if tol is not None and tol <= 0.0:
        raise ValueError(f"tol must be positive, got {tol}")

    src = F.col("src")
    out_deg = edges.groupBy("src").agg(F.count("*").alias("out"))
    # node frame with the dangling flag folded in ONCE: every round's
    # dangling probe reads the flag off the (materialized) rank frame
    # instead of re-deriving out_deg and broadcasting a node-sized
    # anti-join side per round
    nodes = iter_materialize(
        edges.select(src.alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .join(
            out_deg.select(
                F.col("src").alias("node"), F.lit(True).alias("__o")
            ),
            "node",
            "left",
        )
        .select("node", F.coalesce(F.col("__o"), F.lit(False)).alias("has_out")),
        checkpoint_dir,
        eager=False,
    )
    # src-keyed layout reused by every iteration's join
    e = iter_materialize(
        edges.join(out_deg, "src").repartition("src"),
        checkpoint_dir,
        eager=False,
    )
    # bounded 1-row driver read, once before the loop (shift-probe
    # pattern); a long literal divides exactly like the long column did
    n = F.lit(nodes.count())

    ranks = nodes.select("node", "has_out", (F.lit(1.0) / n).alias("rank"))

    prev = None
    for _ in range(n_iter):
        rk = ranks.select("node", "rank")
        contribs = (
            e.join(rk, e["src"] == rk["node"])
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("out")).alias("contrib"))
        )
        # same addends as the old anti-join sum (when() skips has_out
        # rows as NULLs), read straight off the materialized rank frame
        dangling = ranks.agg(
            F.coalesce(
                F.sum(F.when(~F.col("has_out"), F.col("rank"))), F.lit(0.0)
            ).alias("dmass")
        )
        ranks = (
            nodes.join(contribs, nodes["node"] == contribs["dst"], "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                "has_out",
                (
                    (1.0 - damping) / n
                    + damping
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0.0))
                        + F.col("dmass") / n
                    )
                ).alias("rank"),
            )
        )
        # eager: the iteration IS execution (driver-side loop, like the
        # BPE trainer); materialization bounds lineage depth, and in the
        # default local mode the blocks release when the frame is
        # unreferenced, so repeated pagerank() calls don't accrete
        # session cache
        ranks = iter_materialize(ranks, checkpoint_dir, eager=True)
        if tol is not None:
            if prev is not None:
                # L1 delta over two materialized node-sized tables:
                # 1-row agg, bounded driver decision
                delta = (
                    ranks.join(
                        prev.withColumnRenamed("rank", "__prev_rank"), "node"
                    )
                    .agg(
                        F.sum(F.abs(F.col("rank") - F.col("__prev_rank"))).alias(
                            "d"
                        )
                    )
                    .collect()[0]["d"]
                )
                if delta is not None and delta < tol:
                    break
            prev = ranks
    return ranks.select("node", "rank")


def pagerank_sql_iterations(
    edges_cte: str, n_iter: int, damping: float = 0.85
) -> str:
    """DuckDB mirror: the SAME iteration unrolled as chained CTEs.

    ``edges_cte`` must define a relation ``edges(src, dst)``; the
    returned statement selects (node, rank) after ``n_iter`` rounds.
    Round CTEs are declared ``AS MATERIALIZED``: DuckDB otherwise
    inlines each CTE into its (multiple) consumers, making the unrolled
    chain exponential in ``n_iter`` (~3.5x per round, measured).
    """
    d = damping
    parts = [
        f"WITH {edges_cte}",
        """nodes AS (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM edges UNION SELECT dst FROM edges)
),
nn AS (SELECT count(*) AS n FROM nodes),
outdeg AS (SELECT src, count(*) AS out FROM edges GROUP BY src),
r0 AS MATERIALIZED (SELECT node, 1.0 / nn.n AS rank FROM nodes CROSS JOIN nn)""",
    ]
    for i in range(n_iter):
        parts.append(
            f"""c{i} AS MATERIALIZED (
  SELECT e.dst, sum(r.rank / o.out) AS contrib
  FROM edges e JOIN outdeg o USING (src) JOIN r{i} r ON r.node = e.src
  GROUP BY e.dst
),
dg{i} AS MATERIALIZED (
  SELECT coalesce(sum(r.rank), 0.0) AS dmass
  FROM r{i} r LEFT JOIN outdeg o ON r.node = o.src
  WHERE o.src IS NULL
),
r{i + 1} AS MATERIALIZED (
  SELECT n.node,
         (1.0 - {d}) / nn.n
           + {d} * (coalesce(c.contrib, 0.0) + dg{i}.dmass / nn.n) AS rank
  FROM nodes n
  LEFT JOIN c{i} c ON n.node = c.dst
  CROSS JOIN nn CROSS JOIN dg{i}
)"""
        )
    body = ",\n".join(parts[1:])
    return f"{parts[0]},\n{body}\nSELECT node, rank FROM r{n_iter}"


def triangle_count(edges: DataFrame) -> DataFrame:
    """Global + per-node triangle counts over an undirected view of the
    edge list (duplicate edges and directions fold; self-loops drop).
    Returns (node, n_triangles) — one row per node appearing in at
    least one triangle.

    The compact-forward orientation (Latapy 2008; the standard
    distributed formulation): orient every undirected edge from its
    lower-(degree, id) endpoint, so each node's out-degree is O(sqrt(E))
    on any graph — the wedge self-join is then bounded by sum(out_deg^2)
    = O(E^1.5) instead of the sum-of-squares-of-raw-degrees blowup a
    hub node causes. Every triangle is generated exactly once (its
    smallest-ordered vertex forms the wedge), then credited to all
    three corners. Three equi-joins, no all-pairs anywhere.
    """
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    ranked = (
        und.join(deg.withColumnRenamed("node", "a").withColumnRenamed("deg", "da"), "a")
        .join(deg.withColumnRenamed("node", "b").withColumnRenamed("deg", "db"), "b")
    )
    # orient low -> high in (deg, id) order
    low_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = ranked.select(
        F.when(low_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(low_first, F.col("b")).otherwise(F.col("a")).alias("v"),
    ).localCheckpoint(eager=False)
    e1 = oriented.alias("e1")
    e2 = oriented.alias("e2")
    wedges = e1.join(
        e2,
        (F.col("e1.u") == F.col("e2.u")) & (F.col("e1.v") < F.col("e2.v")),
    ).select(
        F.col("e1.u").alias("w0"),
        F.col("e1.v").alias("w1"),
        F.col("e2.v").alias("w2"),
    )
    # the closing edge may be oriented either way between w1 and w2
    closing = oriented.select(
        F.least("u", "v").alias("c1"), F.greatest("u", "v").alias("c2")
    )
    tri = wedges.join(
        closing,
        (F.least("w1", "w2") == F.col("c1"))
        & (F.greatest("w1", "w2") == F.col("c2")),
    ).select("w0", "w1", "w2")
    corners = (
        tri.select(F.col("w0").alias("node"))
        .unionByName(tri.select(F.col("w1").alias("node")))
        .unionByName(tri.select(F.col("w2").alias("node")))
    )
    return corners.groupBy("node").agg(
        F.count("*").cast("long").alias("n_triangles")
    )


def triangle_sql(edges_cte: str) -> str:
    """DuckDB mirror of :func:`triangle_count` over ``edges(src, dst)``
    — the same orientation and wedge-close joins."""
    return f"""
WITH {edges_cte},
und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM edges WHERE src <> dst
),
deg AS (
  SELECT node, COUNT(*) AS deg FROM (
    SELECT a AS node FROM und UNION ALL SELECT b FROM und
  ) GROUP BY node
),
oriented AS (
  SELECT CASE WHEN da < db OR (da = db AND a < b) THEN a ELSE b END AS u,
         CASE WHEN da < db OR (da = db AND a < b) THEN b ELSE a END AS v
  FROM und
  JOIN (SELECT node AS a, deg AS da FROM deg) USING (a)
  JOIN (SELECT node AS b, deg AS db FROM deg) USING (b)
),
wedges AS (
  SELECT e1.u AS w0, e1.v AS w1, e2.v AS w2
  FROM oriented e1 JOIN oriented e2 ON e1.u = e2.u AND e1.v < e2.v
),
tri AS (
  SELECT w0, w1, w2 FROM wedges
  JOIN (SELECT least(u, v) AS c1, greatest(u, v) AS c2 FROM oriented) c
    ON least(w1, w2) = c.c1 AND greatest(w1, w2) = c.c2
)
SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles FROM (
  SELECT w0 AS node FROM tri
  UNION ALL SELECT w1 FROM tri
  UNION ALL SELECT w2 FROM tri
) GROUP BY node
"""


def personalized_pagerank(
    edges: DataFrame,
    seeds: list[int],
    n_iter: int = 10,
    damping: float = 0.85,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Personalized PageRank: restart mass goes to the SEED set instead
    of uniformly everywhere — rank becomes proximity to the seeds, the
    standard crawl-frontier / related-content prioritizer (seed pages
    you trust; PPR scores what they endorse transitively).

        rank'(v) = (1-d)·s(v) + d·(Σ_in contrib + dangling·s(v))

    with s(v) = 1/|seeds| on seeds, else 0 (dangling mass restarts to
    the seeds too — the convention that keeps ranks a probability
    distribution). Start vector = s. Nodes = graph nodes ∪ seeds.

    Same execution shape as :func:`pagerank` (src-keyed edge layout
    reused per round, broadcast 1-row dangling probe, eager per-round
    materialization with the reliable-checkpoint opt-in)."""
    if n_iter < 0:
        raise ValueError(f"n_iter must be >= 0, got {n_iter}")
    if not 0.0 <= damping <= 1.0:
        raise ValueError(f"damping must be in [0, 1], got {damping}")
    if not seeds:
        raise ValueError("personalized_pagerank needs at least one seed")
    spark = edges.sparkSession
    sw = 1.0 / len(set(seeds))
    seed_df = spark.createDataFrame(
        [(int(s), sw) for s in sorted(set(seeds))], "node long, swt double"
    )

    out_deg = edges.groupBy("src").agg(F.count("*").alias("out"))
    e = iter_materialize(
        edges.join(out_deg, "src").repartition("src"),
        checkpoint_dir,
        eager=False,
    )
    swt = F.coalesce(F.col("swt"), F.lit(0.0))
    # node frame with restart weight AND the dangling flag folded in
    # ONCE (see pagerank: no per-round out_deg re-derivation, no
    # node-sized broadcast anti-join side)
    based = iter_materialize(
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .unionByName(seed_df.select("node"))
        .distinct()
        .join(F.broadcast(seed_df), "node", "left")
        .join(
            out_deg.select(
                F.col("src").alias("node"), F.lit(True).alias("__o")
            ),
            "node",
            "left",
        )
        .select(
            "node",
            swt.alias("swt"),
            F.coalesce(F.col("__o"), F.lit(False)).alias("has_out"),
        ),
        checkpoint_dir,
        eager=False,
    )
    ranks = based.select("node", "has_out", F.col("swt").alias("rank"))

    for _ in range(n_iter):
        rk = ranks.select("node", "rank")
        contribs = (
            e.join(rk, e["src"] == rk["node"])
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("out")).alias("contrib"))
        )
        dangling = ranks.agg(
            F.coalesce(
                F.sum(F.when(~F.col("has_out"), F.col("rank"))), F.lit(0.0)
            ).alias("dmass")
        )
        ranks = (
            based.join(contribs, based["node"] == contribs["dst"], "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                "has_out",
                (
                    (1.0 - damping) * F.col("swt")
                    + damping
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0.0))
                        + F.col("dmass") * F.col("swt")
                    )
                ).alias("rank"),
            )
        )
        ranks = iter_materialize(ranks, checkpoint_dir, eager=True)
    return ranks.select("node", "rank")


def ppr_sql_iterations(
    edges_cte: str, seeds: list[int], n_iter: int, damping: float = 0.85
) -> str:
    """DuckDB mirror of :func:`personalized_pagerank` — the identical
    iteration unrolled as MATERIALIZED CTEs (see pagerank_sql_iterations
    for why MATERIALIZED)."""
    d = damping
    sw = 1.0 / len(set(seeds))
    seed_rows = ", ".join(f"({int(s)})" for s in sorted(set(seeds)))
    parts = [
        f"WITH {edges_cte}",
        f"""seeds(node) AS (VALUES {seed_rows}),
nodes AS (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM edges UNION SELECT dst FROM edges
    UNION SELECT node FROM seeds)
),
based AS (
  SELECT n.node,
         CASE WHEN s.node IS NULL THEN 0.0 ELSE {sw!r} END AS swt
  FROM nodes n LEFT JOIN seeds s ON s.node = n.node
),
outdeg AS (SELECT src, count(*) AS out FROM edges GROUP BY src),
r0 AS MATERIALIZED (SELECT node, swt AS rank FROM based)""",
    ]
    for i in range(n_iter):
        parts.append(
            f"""c{i} AS MATERIALIZED (
  SELECT e.dst, sum(r.rank / o.out) AS contrib
  FROM edges e JOIN outdeg o USING (src) JOIN r{i} r ON r.node = e.src
  GROUP BY e.dst
),
dg{i} AS MATERIALIZED (
  SELECT coalesce(sum(r.rank), 0.0) AS dmass
  FROM r{i} r LEFT JOIN outdeg o ON r.node = o.src
  WHERE o.src IS NULL
),
r{i + 1} AS MATERIALIZED (
  SELECT b.node,
         (1.0 - {d}) * b.swt
           + {d} * (coalesce(c.contrib, 0.0) + dg{i}.dmass * b.swt) AS rank
  FROM based b
  LEFT JOIN c{i} c ON b.node = c.dst
  CROSS JOIN dg{i}
)"""
        )
    body = ",\n".join(parts[1:])
    return f"{parts[0]},\n{body}\nSELECT node, rank FROM r{n_iter}"


def hits(
    edges: DataFrame,
    n_iter: int = 10,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999) after ``n_iter``
    mutual-reinforcement rounds: per round, authority(v) = sum of hub
    scores over in-links, then hub(u) = sum of (new) authority scores
    over out-links, each L1-normalized (sum-to-1 — the NetworkX-style
    convention; L2 would drag a cross-engine sqrt into every round).
    Duplicate edges count as parallel links, matching pagerank.

    Returns (node, hub, authority) for every node appearing as src or
    dst; a node with no in-links has authority 0, no out-links hub 0.

    Scale shape — same class as :func:`pagerank`: TWO edge layouts
    materialize once (src-keyed for the authority half-round, dst-keyed
    for the hub half-round — one layout would re-shuffle the
    corpus-sized edges by the other key EVERY round); each round is two
    keyed aggregations joined against the node-sized score frame (no
    broadcast of anything corpus-sized; normalization is a 1-row
    broadcast aggregate over the MATERIALIZED raw scores, so the
    corpus-sized join+agg runs once per half-round, not once more per
    total); every round re-materializes to cut lineage
    (``checkpoint_dir`` for reliable checkpoints, the plans/iterate.py
    trade)."""
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    nodes = iter_materialize(
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct(),
        checkpoint_dir,
        eager=False,
    )
    e_src = iter_materialize(
        edges.repartition("src"), checkpoint_dir, eager=False
    )
    e_dst = iter_materialize(
        edges.repartition("dst"), checkpoint_dir, eager=False
    )
    hubs = nodes.select("node", F.lit(1.0).alias("h"))
    auths = None
    for _ in range(n_iter):
        # materialize the raw half-round scores: the 1-row total and
        # the node join both read the SAME computed frame instead of
        # re-executing the corpus-sized join+agg once per consumer
        a_raw = iter_materialize(
            e_src.join(hubs, e_src["src"] == hubs["node"])
            .groupBy("dst")
            .agg(F.sum("h").alias("a")),
            checkpoint_dir,
            eager=False,
        )
        a_tot = a_raw.agg(F.coalesce(F.sum("a"), F.lit(1.0)).alias("t"))
        auths = iter_materialize(
            nodes.join(a_raw, nodes["node"] == a_raw["dst"], "left")
            .crossJoin(F.broadcast(a_tot))
            .select(
                "node",
                (F.coalesce(F.col("a"), F.lit(0.0)) / F.col("t")).alias("a"),
            ),
            checkpoint_dir,
        )
        h_raw = iter_materialize(
            e_dst.join(auths, e_dst["dst"] == auths["node"])
            .groupBy("src")
            .agg(F.sum("a").alias("h")),
            checkpoint_dir,
            eager=False,
        )
        h_tot = h_raw.agg(F.coalesce(F.sum("h"), F.lit(1.0)).alias("t"))
        hubs = iter_materialize(
            nodes.join(h_raw, nodes["node"] == h_raw["src"], "left")
            .crossJoin(F.broadcast(h_tot))
            .select(
                "node",
                (F.coalesce(F.col("h"), F.lit(0.0)) / F.col("t")).alias("h"),
            ),
            checkpoint_dir,
        )
    return (
        hubs.join(auths, "node")
        .select("node", F.col("h").alias("hub"), F.col("a").alias("authority"))
    )


def hits_sql_iterations(edges_cte: str, n_iter: int) -> str:
    """DuckDB mirror of :func:`hits`: the same rounds unrolled as
    MATERIALIZED CTEs (see pagerank_sql_iterations for why)."""
    parts = [
        f"WITH {edges_cte}",
        """nodes AS (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM edges UNION SELECT dst FROM edges)
),
h0 AS MATERIALIZED (SELECT node, 1.0 AS h FROM nodes)""",
    ]
    for i in range(n_iter):
        parts.append(
            f"""ar{i} AS MATERIALIZED (
  SELECT e.dst, sum(h.h) AS a FROM edges e JOIN h{i} h ON h.node = e.src
  GROUP BY e.dst
),
at{i} AS MATERIALIZED (SELECT coalesce(sum(a), 1.0) AS t FROM ar{i}),
a{i + 1} AS MATERIALIZED (
  SELECT n.node, coalesce(r.a, 0.0) / at{i}.t AS a
  FROM nodes n LEFT JOIN ar{i} r ON n.node = r.dst CROSS JOIN at{i}
),
hr{i} AS MATERIALIZED (
  SELECT e.src, sum(a.a) AS h FROM edges e JOIN a{i + 1} a ON a.node = e.dst
  GROUP BY e.src
),
ht{i} AS MATERIALIZED (SELECT coalesce(sum(h), 1.0) AS t FROM hr{i}),
h{i + 1} AS MATERIALIZED (
  SELECT n.node, coalesce(r.h, 0.0) / ht{i}.t AS h
  FROM nodes n LEFT JOIN hr{i} r ON n.node = r.src CROSS JOIN ht{i}
)"""
        )
    body = ",\n".join(parts[1:])
    return (
        f"{parts[0]},\n{body}\n"
        f"SELECT h.node, h.h AS hub, a.a AS authority "
        f"FROM h{n_iter} h JOIN a{n_iter} a USING (node)"
    )
