"""VERDICT_r13 item 9: confirm the round-13 frame-sharing fixes (lazy
localCheckpoints of sub-corpus shared frames) convert plan wins into
wall wins once the corpus is big enough that a re-scan+re-tokenize pass
costs real CPU.

Interleaved A/B in one session at a synthesized large SF
(documents x300, events x100 under /tmp/sfbig — measurement only, the
bench contract is untouched): the CONTROL arm no-ops every LAZY
localCheckpoint (``eager=False`` returns the frame unchanged — exactly
the pre-sharing plan that re-derives the shared frame per reference);
eager checkpoints keep their semantics (graph/sampling correctness
depends on them). Median of N alternated passes per arm, noop sink.

Usage: python tools/ab_sharing_bigsf.py [rounds] [query ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from pyspark.sql import DataFrame  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from glue_hudi_spark.session import get_spark  # noqa: E402

SF_DIR = "/tmp/sfbig"
QUERIES = ["dedup_incremental", "events_kmv_intersection",
           "corpus_dsir_weights", "events_psi_drift"]

_orig_ckpt = DataFrame.localCheckpoint


def _noop_lazy_ckpt(self, eager=True):
    if eager:
        return _orig_ckpt(self, eager=True)
    return self


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    queries = sys.argv[2:] or QUERIES
    spark = get_spark(app_name="ghs-ab-sharing")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    fns = entry_mod.queries()
    results: dict[str, dict[str, list[float]]] = {
        q: {"shared": [], "control": []} for q in queries}
    for q in queries:  # untimed warm pass (codegen + page cache)
        fns[q](spark, SF_DIR).write.mode("overwrite").format("noop").save()
    for _ in range(rounds):
        for arm in ("shared", "control"):
            DataFrame.localCheckpoint = (
                _orig_ckpt if arm == "shared" else _noop_lazy_ckpt)
            for q in queries:
                spark.sparkContext.setJobDescription(f"{arm}:{q}")
                t0 = time.perf_counter()
                fns[q](spark, SF_DIR).write.mode(
                    "overwrite").format("noop").save()
                results[q][arm].append(time.perf_counter() - t0)
    DataFrame.localCheckpoint = _orig_ckpt
    for q in queries:
        s = statistics.median(results[q]["shared"])
        c = statistics.median(results[q]["control"])
        print(f"{q}: shared={s:.2f}s control={c:.2f}s "
              f"speedup={c / s:.2f}x  "
              f"(shared={[round(x, 2) for x in results[q]['shared']]}, "
              f"control={[round(x, 2) for x in results[q]['control']]})")
    spark.stop()


if __name__ == "__main__":
    main()
