"""Drive named queries() entries at sf0.01 and compare to oracle_sql()
via DuckDB (verify skill #2). Usage: python drive_queries.py q1 q2 ..."""
import math
import sys
from pathlib import Path

HERE = __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__)))
sys.path.insert(0, HERE)

import duckdb

import __spark_entry__ as entry
from glue_hudi_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.01"


def canon(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in sorted(cols):
            v = r[c]
            if isinstance(v, float):
                v = round(v, 6)
            vals.append((c, str(v)))
        out.append(tuple(vals))
    return sorted(out)


def close(a, b):
    if a == b:
        return True
    try:
        fa, fb = float(a), float(b)
        return math.isclose(fa, fb, rel_tol=1e-6, abs_tol=1e-9)
    except (TypeError, ValueError):
        return False


def main(names):
    spark = get_spark(app_name="verify-queries", master="local[4]")
    qs, oracles = entry.queries(), entry.oracle_sql()
    con = duckdb.connect()
    for p in Path(SF_DIR).glob("*.parquet"):
        con.execute(
            f"CREATE VIEW {p.stem} AS SELECT * FROM read_parquet('{p}')")
    for p in Path(SF_DIR).iterdir():
        if p.is_dir():
            con.execute(
                f"CREATE VIEW {p.name} AS SELECT * "
                f"FROM read_parquet('{p}/*.parquet')")
    failed = []
    for name in names:
        if name not in qs:
            print(f"{name}: UNKNOWN"); failed.append(name); continue
        sdf = qs[name](spark, SF_DIR)
        scols = sdf.columns
        srows = canon([r.asDict() for r in sdf.collect()], scols)
        if name not in oracles or oracles[name] is None:
            print(f"{name}: spark rows={len(srows)} (no oracle)"); continue
        ocur = con.execute(oracles[name])
        ocols = [d[0] for d in ocur.description]
        orows = canon([dict(zip(ocols, t)) for t in ocur.fetchall()], ocols)
        ok = len(srows) == len(orows)
        if ok:
            for sr, orow in zip(srows, orows):
                for (sc, sv), (oc, ov) in zip(sr, orow):
                    if sc != oc or not close(sv, ov):
                        ok = False; break
                if not ok:
                    break
        print(f"{name}: {'OK' if ok else 'MISMATCH'} "
              f"(spark {len(srows)} rows, oracle {len(orows)})")
        if not ok:
            failed.append(name)
            for i, (sr, orow) in enumerate(zip(srows, orows)):
                if sr != orow:
                    print("  first diff row", i); print("   s:", sr[:4])
                    print("   o:", orow[:4]); break
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main(sys.argv[1:])
