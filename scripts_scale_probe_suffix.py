"""Round-13 scale probe for the suffix family (the SimHash precedent,
ARCHITECTURE.md round-2 note): replicate sf0.1 documents R times with
per-replica-distinct content (a replica tag token appended, so suffixes
do NOT collapse across replicas and the distinct-rank frames grow with
the corpus), measure suffix_ranks / suffix_dedup_rewrite /
longest_repeated_run at R in {1, 3, 10}, and report per-op wall time +
the observed scaling exponent log(t_R/t_1)/log(R). 10x sf0.1 is ~50k
docs ~ sf1 row count. Single JSON line to stdout + SCALEPROBE_r13.json.

An O(n log n) operator should show exponent ~1.0-1.15 (the log factor
plus fixed per-round scheduling); anything >= 1.5 means a stage is
super-linear and needs fixing this round.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from audit_star_spark.analytics.dedup import suffix_dedup_rewrite  # noqa: E402
from audit_star_spark.analytics.suffix import (  # noqa: E402
    longest_repeated_run,
    suffix_ranks,
)
from audit_star_spark.session import get_spark  # noqa: E402
from audit_star_spark.sources.testdata import load_table  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
SCALES = [1, 3, 10]


def replicated(spark, r: int):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    n_docs = 5000  # sf0.1 documents rows (id remap spacing)
    reps = spark.range(r).select(F.col("id").alias("rep"))
    return (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("rep") * n_docs * 10).alias("doc_id"),
            # replica tag token: replicas share almost all content but
            # every suffix stays distinct, so rank frames grow with R
            F.concat(F.col("text"), F.lit(" zrep"), F.col("rep").cast("string")).alias(
                "text"
            ),
        )
        .localCheckpoint()  # pin the input; measure the operator, not the scan
    )


def timed(fn):
    t0 = time.time()
    out = fn()
    return out, round(time.time() - t0, 1)


def main():
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    results = {}
    for r in SCALES:
        docs = replicated(spark, r)
        n = docs.count()
        row = {"n_docs": n}
        _, row["suffix_ranks_sec"] = timed(
            lambda: suffix_ranks(docs, mode="distributed").count()
        )
        _, row["suffix_dedup_rewrite_sec"] = timed(
            lambda: suffix_dedup_rewrite(docs, min_len=8, mode="distributed").count()
        )
        lrr, row["longest_repeated_run_sec"] = timed(
            lambda: longest_repeated_run(docs, mode="distributed").collect()
        )
        row["lrr_run_len"] = int(lrr[0]["run_len"]) if lrr else None
        results[f"x{r}"] = row
        print(json.dumps({f"x{r}": row}), flush=True)

    def exponent(key, r):
        import math

        return round(
            math.log(results[f"x{r}"][key] / results["x1"][key]) / math.log(r), 3
        )

    for key in (
        "suffix_ranks_sec",
        "suffix_dedup_rewrite_sec",
        "longest_repeated_run_sec",
    ):
        results.setdefault("exponents", {})[key] = {
            f"x{r}": exponent(key, r) for r in SCALES[1:]
        }
    out = json.dumps(results)
    print(out, flush=True)
    dest = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/SCALEPROBE_r14_suffix.json"
    with open(dest, "w") as f:
        f.write(out + "\n")


if __name__ == "__main__":
    main()
