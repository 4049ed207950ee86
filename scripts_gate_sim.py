"""One-off: simulate the driver's 50-slot correctness gate at a given SF."""
import sys, time, traceback
sys.path.insert(0, '/root/repo')
import __spark_entry__ as entry
from audit_star_spark.session import get_spark
from audit_star_spark.testing import compare, duckdb_connection

sf_dir = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
only = sys.argv[2].split(',') if len(sys.argv) > 2 else None
spark = get_spark()
con = duckdb_connection(sf_dir)
qs, oracles = entry.queries(), entry.oracle_sql()
# explicit names may target ANY query (incl. EXTRA, beyond the window);
# default = the driver's 50-slot window
names = [n for n in qs if n in only] if only else list(qs)[:50]
if only:
    missing = [n for n in only if n not in qs]
    assert not missing, f"unknown query names: {missing}"
fails = []
for i, name in enumerate(names):
    t0 = time.time()
    try:
        df = qs[name](spark, sf_dir)
        if name in oracles:
            compare(df, con, oracles[name], name=name)
            status = 'OK'
        else:
            df.count(); status = 'OK(rows-only)'
    except Exception as ex:
        status = f'FAIL: {type(ex).__name__}: {str(ex)[:300]}'
        fails.append(name)
    print(f"{i+1:3d} {name:32s} {status} ({time.time()-t0:.1f}s)", flush=True)
print("FAILS:", fails)
sys.exit(1 if fails else 0)
