"""Round-14 scale probe for margin-based bitext mining (the suffix-probe
precedent, SCALEPROBE_r13.json): replicate sf0.1 embeddings R times with
per-replica-distinct DIRECTIONS (a deterministic rep-dependent jitter —
pure rescaling would leave cosine, and therefore the candidate structure,
unchanged), mine at R in {1, 4, 16}, and report wall time + the observed
scaling exponent log(t_R/t_1)/log(R).

The operator's scale contract is that ``n_cells`` scales with the corpus
so the CELL POPULATION stays bounded (offline k-means with
k ~ N / target_cell_size — the IVF convention): pairs-per-cell is then
constant and total candidate work is LINEAR in N. The probe holds cell
population at ~250 by setting n_cells = 8 * R. A separate leg at R=16
keeps n_cells FIXED at 8 to measure the documented anti-pattern (cell
population grows with N, pair count grows quadratically: ~32M candidate
pairs vs the scaled leg's ~2M) — the number that tells a 100 TB
operator why the parameter must scale. An untimed warmup run precedes
the timed legs (the first Spark job of a session pays JVM/codegen
startup, which inverted the x4 exponent in a warmup-less run).

16x sf0.1 = 32k vectors of dim 64. Expected exponent ~1.0-1.2 with
scaled cells (linear candidate work + fixed per-stage scheduling);
anything >= 1.5 means a stage is super-linear and needs fixing.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from audit_star_spark.analytics.similarity import bitext_mine  # noqa: E402
from audit_star_spark.session import get_spark  # noqa: E402
from audit_star_spark.sources.testdata import load_table  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
SCALES = [1, 4, 16]
N_EMB = 2000  # sf0.1 embeddings rows (id remap spacing)


def replicated(spark, r: int):
    emb = load_table(spark, SF_DIR, "embeddings")
    reps = spark.range(r).select(F.col("id").alias("rep"))
    return (
        emb.crossJoin(reps)
        .select(
            (F.col("vec_id") + F.col("rep") * N_EMB * 10).alias("vec_id"),
            # deterministic DIRECTIONAL jitter per replica: cosine-visible
            # (a scalar rescale would be invisible to cosine), no RNG
            F.expr(
                "transform(embedding, (x, i) -> CAST(x + 0.05 * rep * sin(i + rep) AS FLOAT))"
            ).alias("embedding"),
            "label",
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
    # untimed warmup: JVM + codegen + shuffle-service startup lands here,
    # not on the x1 leg
    bitext_mine(replicated(spark, 1), n_cells=8, k=4).collect()
    results = {}
    for r in SCALES:
        emb = replicated(spark, r)
        n = emb.count()
        row = {"n_vectors": n, "n_cells": 8 * r}
        mined, row["bitext_mine_sec"] = timed(
            lambda: bitext_mine(emb, n_cells=8 * r, k=4).collect()
        )
        row["n_mined"] = len(mined)
        results[f"x{r}"] = row
        print(json.dumps({f"x{r}": row}), flush=True)

    # anti-pattern leg: corpus grew 16x but n_cells stayed 8 -> cell
    # population 16x, candidate pairs ~256x (~32M); records WHY n_cells
    # must scale with the corpus
    emb16 = replicated(spark, 16)
    mined, t_fixed = timed(
        lambda: bitext_mine(emb16, n_cells=8, k=4).collect()
    )
    results["x16_fixed_cells"] = {
        "n_vectors": 16 * N_EMB,
        "n_cells": 8,
        "bitext_mine_sec": t_fixed,
        "n_mined": len(mined),
    }
    print(
        json.dumps({"x16_fixed_cells": results["x16_fixed_cells"]}), flush=True
    )

    import math

    results["exponents"] = {
        "bitext_mine_sec": {
            f"x{r}": round(
                math.log(
                    results[f"x{r}"]["bitext_mine_sec"]
                    / results["x1"]["bitext_mine_sec"]
                )
                / math.log(r),
                3,
            )
            for r in SCALES[1:]
        }
    }
    out = json.dumps(results)
    print(out, flush=True)
    with open("/root/repo/SCALEPROBE_r14.json", "w") as f:
        f.write(out + "\n")


if __name__ == "__main__":
    main()
