"""One-off: time named queries in isolation at a given SF (noop sink,
min of N runs — the bench methodology), optionally dumping
explain('formatted') to plans/<out>. Usage:
    python scripts_isolate.py sf_dir q1,q2[,q3...] [n_runs] [plans_out_dir]
"""
import os
import sys
import time

sys.path.insert(0, '/root/repo')
import __spark_entry__ as entry
from audit_star_spark.session import get_spark

sf_dir = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.1'
names = sys.argv[2].split(',')
n_runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
plans_dir = sys.argv[4] if len(sys.argv) > 4 else None

spark = get_spark()
spark.sparkContext.setLogLevel("ERROR")
qs = entry.queries()
missing = [n for n in names if n not in qs]
assert not missing, f"unknown: {missing}"

# same warmup as bench.py
spark.range(1_000_000).selectExpr("sum(id)").collect()
spark.range(spark.sparkContext.defaultParallelism * 10).repartition(
    spark.sparkContext.defaultParallelism
).mapInPandas(lambda it: it, "id long").write.format("noop").mode("overwrite").save()

for name in names:
    spark.sparkContext.setJobDescription(name)
    best = float("inf")
    for _ in range(n_runs):
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
    print(f"ISOLATED {name} {best:.2f}s", flush=True)
    if plans_dir:
        os.makedirs(plans_dir, exist_ok=True)
        df = qs[name](spark, sf_dir)
        with open(os.path.join(plans_dir, f"{name}.txt"), "w") as f:
            f.write(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))
