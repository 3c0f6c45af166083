"""Dump .explain('formatted') for named queries to plans/r14/<q>_<tag>.txt.

Driver-side planning only — no action is executed, so this is safe to run
while other workloads own the machine (unlike timing runs).
"""

from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import __spark_entry__ as entry_mod  # noqa: E402
from glue_hudi_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ghs-dump-plans", master="local[2]")
    queries = entry_mod.queries()
    os.makedirs(os.path.join(HERE, "plans", "r14"), exist_ok=True)
    for name in names:
        df = queries[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(HERE, "plans", "r14", f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
