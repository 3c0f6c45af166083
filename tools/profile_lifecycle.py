"""Phase/driver profile of a lifecycle bench query.

Runs one warm pass of a named query under cProfile (construction is the
query; the noop write executes it), printing the top cumulative driver
functions plus the Spark job count. Driver-side hotspots (manifest JSON,
globs, py4j expression building) show here; executor time shows as
socket waits.

Usage: python tools/profile_lifecycle.py <query> [topN]
"""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import __spark_entry__ as entry_mod  # noqa: E402
from glue_hudi_spark.session import get_spark  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    top = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ghs-profile")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    fn = entry_mod.queries()[name]
    tracker = spark.sparkContext.statusTracker()

    # cold pass (codegen/page cache), untimed
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()

    j0 = len(tracker.getJobIdsForGroup(None) or [])
    pr = cProfile.Profile()
    t0 = time.perf_counter()
    pr.enable()
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    pr.disable()
    wall = time.perf_counter() - t0
    j1 = len(tracker.getJobIdsForGroup(None) or [])

    s = io.StringIO()
    ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
    ps.print_stats(top)
    print(s.getvalue())
    print(f"== {name}: wall {wall:.2f}s, spark jobs {j1 - j0}")
    spark.stop()


if __name__ == "__main__":
    main()
