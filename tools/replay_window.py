"""Driver-faithful window replay: run registry queries in order in ONE
local[32] session at sf0.01 and hash-compare each against its DuckDB
oracle with the driver's exact canonicalization (column-name sort, row
sort, typed value tags — mirrors tests/test_oracle_parity.py).

Usage:
    python tools/replay_window.py                 # first 50 (the window)
    python tools/replay_window.py q1 q2 ...       # named queries only

Run from the repo root (executor workers unpickle package functions).
"""
import datetime, decimal, math, os, sys, time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")

import duckdb
from pyspark.sql import SparkSession

SF = "/root/testdata/sf0.01"


def canon(v):
    if v is None: return "null"
    if isinstance(v, bool): return f"bool:{v}"
    if isinstance(v, float):
        return "nan" if math.isnan(v) else f"{v:.10g}"
    if isinstance(v, decimal.Decimal): return f"dec:{v}"
    if isinstance(v, int): return f"int:{v}"
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return f"ts:{v.isoformat()}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def rows_of(table):
    cols = table.schema.names
    pyd = table.to_pylist()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(cols), sorted(
        tuple(canon(r[cols[i]]) for i in order) for r in pyd)


spark = (SparkSession.builder.master("local[32]").appName("replay")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.driver.memory", "64g")
         .getOrCreate())

import __spark_entry__ as em

Q, O = em.queries(), em.oracle_sql()
con = duckdb.connect()
for t in em.TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

fails = 0
for i, name in enumerate(([a for a in sys.argv[1:]] or list(Q)[:50])):
    t0 = time.time()
    try:
        table = Q[name](spark, SF).toArrow()
        sc, sr = rows_of(table)
        if name not in O:
            print(f"{i+1:2d} {name}: ROWS_ONLY rows={len(sr)} "
                  f"({time.time()-t0:.1f}s)", flush=True)
            continue
        dc, dr = rows_of(con.sql(O[name]).arrow())
        ok = (sc == dc) and (sr == dr)
        if not ok:
            fails += 1
            diffs = [(a, b) for a, b in zip(sr, dr) if a != b][:2]
            print(f"{i+1:2d} {name}: MISMATCH cols={sc==dc} "
                  f"rows={len(sr)}/{len(dr)} diffs={diffs}", flush=True)
        else:
            print(f"{i+1:2d} {name}: OK rows={len(sr)} "
                  f"({time.time()-t0:.1f}s)", flush=True)
    except Exception as e:
        fails += 1
        print(f"{i+1:2d} {name}: ERROR {type(e).__name__}: {str(e)[:200]}",
              flush=True)
print(f"DONE fails={fails}")
spark.stop()
