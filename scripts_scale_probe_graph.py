"""Round-15 scale probe for the graph family (the suffix-probe pattern):
replicate the doc_pagerank link graph R times with DISJOINT node id
spaces (block-diagonal graph, so node and edge counts both grow with R),
measure pagerank / personalized_pagerank / hits at R in {1, 3, 10, 30}
(x30 ~ 300k edges), and report wall time + observed scaling exponent
log(t_R/t_1)/log(R).

Also times the PRE-c071116 hits shape (single src-keyed edge layout,
un-materialized half-round scores consumed twice) inline as `hits_old`,
to convert round 14's fixed-cost-vs-corpus-proportional argument for the
hits rewrite into a measured crossover: the rewrite costs two extra
per-round materializations (fixed) and saves one duplicated corpus-sized
join+agg per half-round plus one full-edge exchange per round
(proportional). If the rewrite is right, new-vs-old flips from slower to
faster as R grows.

Single JSON line to stdout + SCALEPROBE_r15_graph.json.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from audit_star_spark.analytics.graph import (  # noqa: E402
    hits,
    pagerank,
    personalized_pagerank,
)
from audit_star_spark.plans.iterate import iter_materialize  # noqa: E402
from audit_star_spark.session import get_spark  # noqa: E402
from audit_star_spark.sources.testdata import load_table  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
SCALES = [1, 3, 10, 30]
N_ITER = 3  # PAGERANK_ITERS: what the gate queries run


def hits_old(edges, n_iter=10, checkpoint_dir=None):
    """The pre-c071116 hits shape, verbatim (modulo formatting)."""
    nodes = iter_materialize(
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct(),
        checkpoint_dir,
        eager=False,
    )
    e = iter_materialize(edges.repartition("src"), checkpoint_dir, eager=False)
    hubs = nodes.select("node", F.lit(1.0).alias("h"))
    auths = None
    for _ in range(n_iter):
        a_raw = (
            e.join(hubs, e["src"] == hubs["node"])
            .groupBy("dst")
            .agg(F.sum("h").alias("a"))
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
        h_raw = (
            e.join(auths, e["dst"] == auths["node"])
            .groupBy("src")
            .agg(F.sum("a").alias("h"))
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
    return hubs.join(auths, "node").select(
        "node", F.col("h").alias("hub"), F.col("a").alias("authority")
    )


def replicated_edges(spark, r: int):
    """doc_pagerank's closed-form link graph, replicated into r disjoint
    blocks (node ids offset per replica)."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id")
    nd = docs.agg(F.count("*").alias("n"))
    linkers = docs.filter(F.col("doc_id") % 17 != 0).crossJoin(F.broadcast(nd))
    base = linkers.select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * 7 + 1) % F.col("n")).alias("dst"),
        F.col("n"),
    ).unionByName(
        linkers.select(
            F.col("doc_id").alias("src"),
            ((F.col("doc_id") * 13 + 3) % F.col("n")).alias("dst"),
            F.col("n"),
        )
    )
    reps = base.sparkSession.range(r).select(F.col("id").alias("rep"))
    return (
        base.crossJoin(reps)
        .select(
            (F.col("src") + F.col("rep") * F.col("n")).alias("src"),
            (F.col("dst") + F.col("rep") * F.col("n")).alias("dst"),
        )
        .localCheckpoint()  # pin the input; measure the operator
    )


def timed(fn):
    t0 = time.time()
    fn()
    return round(time.time() - t0, 2)


def main():
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    results = {}
    for r in SCALES:
        edges = replicated_edges(spark, r)
        row = {"n_edges": edges.count()}
        row["pagerank_sec"] = timed(
            lambda: pagerank(edges, n_iter=N_ITER).count()
        )
        row["ppr_sec"] = timed(
            lambda: personalized_pagerank(
                edges, seeds=[1, 2, 3], n_iter=N_ITER
            ).count()
        )
        row["hits_sec"] = timed(lambda: hits(edges, n_iter=N_ITER).count())
        row["hits_old_sec"] = timed(
            lambda: hits_old(edges, n_iter=N_ITER).count()
        )
        results[f"x{r}"] = row
        print(json.dumps({f"x{r}": row}), flush=True)

    def exponent(key, r):
        import math

        return round(
            math.log(results[f"x{r}"][key] / results["x1"][key]) / math.log(r), 3
        )

    for key in ("pagerank_sec", "ppr_sec", "hits_sec", "hits_old_sec"):
        results.setdefault("exponents", {})[key] = {
            f"x{r}": exponent(key, r) for r in SCALES[1:]
        }
    out = json.dumps(results)
    print(out, flush=True)
    dest = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/SCALEPROBE_r15_graph.json"
    with open(dest, "w") as f:
        f.write(out + "\n")


if __name__ == "__main__":
    main()
