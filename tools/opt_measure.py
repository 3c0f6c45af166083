"""Round-13 optimization measurement harness.

Times a named subset of the bench queries EXACTLY the way ``bench.py``
does (one cold pass, then median of N warm passes into the noop sink,
``local[$SPARK_GRAFT_CPUS]``) and optionally captures
``.explain("formatted")`` for each into ``plans/r14/<q>_<tag>.txt``.

Usage:
    python tools/opt_measure.py q1 q2 ...            # time queries
    python tools/opt_measure.py --plans before q1 …  # also dump plans
    python tools/opt_measure.py --runs 5 q1          # more samples
    python tools/opt_measure.py --jobs q1            # report Spark job count

Never run concurrently with pytest or another bench (BASELINE.md rule:
bench only ever runs alone).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import __spark_entry__ as entry_mod  # noqa: E402
from glue_hudi_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans", metavar="TAG", default=None,
                    help="dump explain('formatted') to plans/r14/<q>_<TAG>.txt")
    ap.add_argument("--jobs", action="store_true",
                    help="report Spark job count per timed pass")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    spark = get_spark(app_name="ghs-opt-measure")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warmup
    queries = entry_mod.queries()
    tracker = spark.sparkContext.statusTracker()

    out: dict[str, dict] = {}
    for name in args.names:
        if name not in queries:
            print(f"!! unknown query: {name}", file=sys.stderr)
            continue
        fn = queries[name]
        spark.sparkContext.setJobDescription(f"opt:{name}")
        t0 = time.perf_counter()
        fn(spark, args.sf_dir).write.mode("overwrite").format("noop").save()
        cold = time.perf_counter() - t0
        samples, jobcounts = [], []
        for _ in range(args.runs):
            j0 = len(tracker.getJobIdsForGroup(None)) if args.jobs else 0
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).write.mode("overwrite").format("noop").save()
            samples.append(time.perf_counter() - t0)
            if args.jobs:
                jobcounts.append(len(tracker.getJobIdsForGroup(None)) - j0)
        rec = {"cold": round(cold, 3),
               "warm": round(statistics.median(samples), 3),
               "samples": [round(s, 3) for s in samples]}
        if args.jobs:
            rec["jobs_per_pass"] = jobcounts
        if args.plans:
            os.makedirs(os.path.join(HERE, "plans", "r14"), exist_ok=True)
            df = fn(spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(
                    HERE, "plans", "r14",
                    f"{name}_{args.plans}.txt"), "w") as fh:
                fh.write(plan)
        out[name] = rec
        print(f"{name}: cold={rec['cold']} warm={rec['warm']} "
              f"samples={rec['samples']}"
              + (f" jobs={jobcounts}" if args.jobs else ""), flush=True)

    probe_t = []
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(0, 200_000_000, 1, 32).selectExpr(
            "sum(id % 1000003)").collect()
        probe_t.append(time.perf_counter() - t0)
    print(json.dumps({"queries": out,
                      "spark_sum_200m_sec": round(
                          statistics.median(probe_t), 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
