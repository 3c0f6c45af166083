"""Physical-plan regression guards.

Correctness tests can't catch a silently-degraded plan (a lost filter
pushdown or a cartesian product still returns right answers — 100× slower
at scale). These tests pin the plan shapes the engine's scale story
depends on.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q1_pushes_filter_and_prunes_columns(spark):
    plan = _plan(entry_mod.q1_pricing_summary(spark, SF_DIR))
    assert re.search(r"PushedFilters: \[.*LessThanOrEqual\(l_shipdate", plan), (
        "shipdate filter must reach the parquet scan"
    )
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    read_cols = m.group(1).count(":")
    assert read_cols <= 7, f"lineitem scan reads {read_cols} columns; pruning lost"


def test_revenue_joins_broadcast_dims(spark):
    plan = _plan(entry_mod.revenue_by_nation(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_asof_join_is_window_not_join(spark):
    plan = _plan(entry_mod.events_asof_join(spark, SF_DIR))
    for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
              "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert j not in plan, f"asof must be a window plan, found {j}"
    assert "Window" in plan


@pytest.mark.parametrize(
    "name",
    ["dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_embedding_cosine",
     "ann_lsh_bucketed"],
)
def test_candidate_generation_never_cartesian(spark, name):
    plan = _plan(entry_mod.queries()[name](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan, (
        f"{name} candidates must come from an equi-join, not a cross product"
    )


def test_no_python_udfs_in_jvm_operators(spark):
    """Everything except the multimodal path must stay JVM-side (no
    BatchEvalPython / ArrowEvalPython in the plan)."""
    for name in ["dedup_exact", "dedup_simhash", "text_quality", "text_lang_id",
                 "text_fingerprint", "ann_cosine_topk", "cdc_window_dedup",
                 "events_sessionization"]:
        plan = _plan(entry_mod.queries()[name](spark, SF_DIR))
        assert "EvalPython" not in plan, f"{name} fell off the JVM fast path"
