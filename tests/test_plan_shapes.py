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
    # single source of truth with the user-facing lint module
    from glue_hudi_spark.plans import lint

    return lint.plan_text(df)


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
    ["dedup_ngram_jaccard", "dedup_embedding_cosine", "ann_lsh_bucketed"],
)
def test_candidate_generation_never_cartesian(spark, name):
    plan = _plan(entry_mod.queries()[name](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan, (
        f"{name} candidates must come from an equi-join, not a cross product"
    )


def test_minhash_candidate_generation_never_cartesian(spark):
    """The entry query checkpoints its (tiny) result to release the shingle
    cache, so the guard inspects the underlying LAZY plan directly."""
    from glue_hudi_spark.operators import dedup

    docs = entry_mod._t(spark, SF_DIR, "documents")
    lazy = dedup.minhash_lsh_pairs(docs, verify_threshold=0.5, materialize=False)
    plan = _plan(lazy)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_minhash_releases_shingle_cache(spark):
    """materialize=True (the entry-query default) must leave no cached RDDs
    behind — the round-2 persist leak."""
    from glue_hudi_spark.operators import dedup

    docs = entry_mod._t(spark, SF_DIR, "documents")
    spark.catalog.clearCache()
    dedup.minhash_lsh_pairs(docs, verify_threshold=0.5).count()
    # localCheckpoint blocks of the small pair RESULT are freed by GC; the
    # O(corpus) shingle persist was a CacheManager entry, pinned forever.
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_no_python_udfs_in_jvm_operators(spark):
    """Everything except the multimodal path must stay JVM-side (no
    BatchEvalPython / ArrowEvalPython in the plan)."""
    for name in ["dedup_exact", "dedup_simhash", "text_quality", "text_lang_id",
                 "text_fingerprint", "ann_cosine_topk", "cdc_window_dedup",
                 "events_sessionization"]:
        plan = _plan(entry_mod.queries()[name](spark, SF_DIR))
        assert "EvalPython" not in plan, f"{name} fell off the JVM fast path"


@pytest.mark.parametrize("name", ["ann_cosine_topk", "ann_lsh_bucketed", "ann_ivf_topk"])
def test_ann_topk_has_no_per_query_window(spark, name):
    """Final top-k must be the two-stage partial aggregation, not a window
    partitioned only by query_id (≤|Q| reducers over the full candidate
    set — a straggler by construction at scale)."""
    plan = _plan(entry_mod.queries()[name](spark, SF_DIR))
    assert "Window" not in plan, f"{name} still funnels through a window"
    # partial top-k must combine map-side: both aggregation stages present
    assert plan.count("HashAggregate") >= 2 or "ObjectHashAggregate" in plan


def test_mor_rt_read_never_shuffles_base(spark, tmp_path):
    """The _rt view must resolve deltas with a window over the DELTA set
    only and anti-join the base against the (broadcast) delta keys — a
    whole-table window partitioned by record key shuffles 100 TB of base
    on every read between compactions."""
    from pyspark.sql import Row

    from glue_hudi_spark.storage.native import NativeTable

    t = NativeTable(spark, tmp_path / "tbl", record_keys=["id"],
                    precombine="seq", storage_type="mor", compact_every=100)
    base = spark.createDataFrame([Row(id=i, v=f"v{i}", seq=1) for i in range(50)])
    t.bulk_insert(base)
    t.upsert(spark.createDataFrame([Row(id=1, v="new", seq=2)]))
    t.delete(spark.createDataFrame([Row(id=2, v="x", seq=3)]))

    df = t.read_snapshot()
    plan = _plan(df)
    # base joins the delta keys via broadcast — never a shuffled join
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    # correctness of the merge itself
    rows = {r["id"]: r["v"] for r in df.collect()}
    assert rows[1] == "new" and 2 not in rows and len(rows) == 49


def test_ivf_assignment_is_shuffle_free(spark):
    """ivf_assign must be a per-row argmax over an inlined centroid literal:
    no join, no window, no exchange beyond the scan."""
    from glue_hudi_spark.operators import similarity

    emb = entry_mod._t(spark, SF_DIR, "embeddings")
    from pyspark.sql import functions as F
    assigned = similarity.ivf_assign(emb, emb.filter(F.col("vec_id") < 8))
    plan = _plan(assigned)
    for op in ("Join", "Window", "Exchange", "CartesianProduct"):
        assert op not in plan, f"ivf_assign plan contains {op}"


def test_line_dedup_no_window_no_cartesian(spark):
    """line_dedup must be explode -> hash-keyed aggregate -> equi-join ->
    reassembly aggregate: no corpus-wide window (single-reducer at scale),
    no cartesian, and shuffle keys are the md5 of the line, not raw bytes."""
    from glue_hudi_spark.operators import dedup as _dedup

    plan = _plan(_dedup.line_dedup(entry_mod._t(spark, SF_DIR, "documents")))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" not in plan, "line dedup must not window the corpus"


def test_tokenize_vocab_is_take_ordered_not_global_window(spark):
    """corpus_tokenize_ids' vocabulary ranking: the top-64 selection must be
    TakeOrderedAndProject (per-partition partial top-k) — at web-corpus
    scale the distinct-token table is 10^7-10^8 rows and a global
    row_number window over it funnels everything through one reducer.
    The only Window allowed in the plan is the one over the 64 survivors.
    """
    plan = _plan(entry_mod.corpus_tokenize_ids(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan, (
        "vocab top-64 must be orderBy().limit() -> TakeOrderedAndProject"
    )
    # exactly one Window may remain (ranking the 64 survivors); a second
    # one would mean the global ranking crept back in beside the limit
    # formatted explain lists each operator twice (tree + detail section),
    # so count distinct "(n) Window" detail headers
    n_windows = len(re.findall(r"^\(\d+\) Window", plan, re.M))
    assert n_windows <= 1, f"expected <=1 Window (survivor rank), got {n_windows}"


def test_q9_product_profit_no_cartesian_broadcasts_dims(spark):
    """q9 is the heaviest TPC-H shape (5-way join): part/supplier/nation
    must broadcast; no cartesian/nested-loop anywhere."""
    plan = _plan(entry_mod.q9_product_profit(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_q21_waiting_suppliers_semi_anti_broadcast(spark):
    """q21's existence/absence self-joins on l_orderkey must stay
    hash-based (semi/anti), never nested-loop."""
    plan = _plan(entry_mod.q21_waiting_suppliers(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_zipf_top200_is_take_ordered(spark):
    """corpus_zipf_fit's token selection must be TakeOrderedAndProject —
    never a global sort/window of the full distinct-token table."""
    from glue_hudi_spark.plans import lint

    df = entry_mod.corpus_zipf_fit(spark, SF_DIR)
    plan = lint.plan_text(df)
    assert "TakeOrderedAndProject" in plan
    lint.assert_no_cartesian(df)


def test_triangles_edges_capped_and_equi_joined(spark):
    """copurchase_triangles: the wedge/closing joins must be hash equi-
    joins over the capped edge backbone — no cartesian, no nested loop
    (the uncapped wedge join measured 30-50 s at sf0.1)."""
    from glue_hudi_spark.plans import lint

    df = entry_mod.copurchase_triangles(spark, SF_DIR)
    lint.assert_no_cartesian(df)
    lint.assert_no_python_eval(df)


def test_hybrid_fusion_stays_rank_list_sized(spark):
    """corpus_hybrid_search: fusion operates on two k-sized rank lists;
    the only corpus-wide work is each retriever's own (already-guarded)
    pipeline — no cartesian, no python."""
    from glue_hudi_spark.plans import lint

    df = entry_mod.corpus_hybrid_search(spark, SF_DIR)
    lint.assert_no_python_eval(df)
    # the one sanctioned BNLJ is the broadcast 1-row query-vector cross
    # inside cosine_topk; an unhinted CartesianProduct is still a bug
    assert "CartesianProduct" not in lint.plan_text(df)


def test_q9_pushes_like_broadcasts_dims_prunes_columns(spark):
    """q9_product_profit: the %red% part filter must reach the scan as
    StringContains, every dimension joins as broadcast hash (the fact
    table shuffles only for the aggregate), and no scan reads wider than
    its projection."""
    from glue_hudi_spark.plans import lint

    df = entry_mod.q9_product_profit(spark, SF_DIR)
    lint.assert_no_cartesian(df)
    lint.assert_no_python_eval(df)
    lint.assert_pushed_filter(df, "StringContains(p_name,red)")
    lint.assert_max_read_columns(df, 6)
    assert lint.count_ops(df, "BroadcastHashJoin") >= 2  # nation+supplier min
    # at this SF all four joins broadcast: only partial-agg exchange + sort
    lint.assert_max_shuffles(df, 2)


def test_q21_correlations_compile_to_equi_semi_anti_joins(spark):
    """q21_waiting_suppliers: the EXISTS / NOT-EXISTS double correlation
    must compile to semi/anti joins EQUI-keyed on l_orderkey (the <>
    supplier condition rides along as a join residual) — never a nested
    loop — and the LIMIT 20 must be TakeOrderedAndProject, not a global
    sort."""
    from glue_hudi_spark.plans import lint

    df = entry_mod.q21_waiting_suppliers(spark, SF_DIR)
    lint.assert_no_cartesian(df)
    lint.assert_no_python_eval(df)
    plan = lint.plan_text(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "TakeOrderedAndProject" in plan
    lint.assert_pushed_filter(df, "EqualTo(o_orderstatus,F)")
    lint.assert_pushed_filter(df, "EqualTo(n_name,NATION_4)")


def test_span_dedup_shuffles_hashes_not_text(spark):
    """corpus_span_dedup: the shingle groupBy/join must move 16-byte md5
    hashes, never text; the shingle expansion is transform+explode (no
    positional self-join); no cartesian, no python."""
    from glue_hudi_spark.plans import lint

    df = entry_mod.corpus_span_dedup(spark, SF_DIR)
    lint.assert_no_cartesian(df)
    lint.assert_no_python_eval(df)
    plan = lint.plan_text(df)
    assert "Generate" in plan            # explode of the shingle transform
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan


def test_kmv_sketch_is_take_ordered_not_global_window(spark):
    """events_kmv_intersection: every k-smallest sketch must compile to
    TakeOrderedAndProject (per-partition top-k, k-row driver merge) —
    a global row_number window would single-partition-sort the distinct
    hash set at scale."""
    from glue_hudi_spark.plans import lint

    df = entry_mod.events_kmv_intersection(spark, SF_DIR)
    plan = lint.plan_text(df)
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan
    lint.assert_no_cartesian(df)
    lint.assert_no_python_eval(df)


def test_dsir_scores_join_on_token_never_collect(spark):
    """corpus_dsir_weights: both LM scores are token equi-joins; no
    cartesian beyond the sanctioned scalar appends, no python, and the
    model side never materializes driver-side."""
    from glue_hudi_spark.plans import lint

    df = entry_mod.corpus_dsir_weights(spark, SF_DIR)
    lint.assert_no_cartesian(df)
    lint.assert_no_python_eval(df)


def test_image_dedup_is_bucketed_equi_joined(spark):
    """multimodal_image_dedup: band+fingerprint bucketing → group-rep
    edges → components — all equi-joins over bucket keys, never a
    pairwise image comparison (no cartesian anywhere in the final
    plan; the mapInPandas decode is the sanctioned python stage)."""
    from glue_hudi_spark.plans import lint

    df = entry_mod.multimodal_image_dedup(spark, SF_DIR)
    lint.assert_no_cartesian(df)
    assert "BroadcastNestedLoopJoin" not in lint.plan_text(df)


def test_matjoin_clustered_state_scan_reads_only_admitting_files(
        spark, tmp_path):
    """The clustered MaterializedJoin layout's scale contract: with
    sort_order/stats/secondary-bloom on the join column, a join-key
    probe of the state reads a strict SUBSET of the state files (the
    value ladder prunes at the manifest, before Spark ever plans the
    scan) — the same candidate set the dim-churn merge rewrites. An
    unclustered state would admit every file and this pin would fail."""
    from pyspark.sql import functions as F

    from glue_hudi_spark.storage.native import NativeTable
    from glue_hudi_spark.streaming.materialized import MaterializedJoin

    fact = NativeTable(spark, tmp_path / "fact", record_keys=["oid"],
                       precombine="seq")
    fact.bulk_insert(spark.range(64).select(
        F.col("id").alias("oid"), (F.col("id") % 8).alias("ckey"),
        F.col("id").cast("double").alias("amt"), F.lit(1).alias("seq")))
    dim = NativeTable(spark, tmp_path / "dim", record_keys=["ckey"],
                      precombine="seq")
    dim.bulk_insert(spark.range(8).select(
        F.col("id").alias("ckey"),
        F.concat(F.lit("c"), F.col("id")).alias("name"),
        F.lit(1).alias("seq")))
    mj = MaterializedJoin(spark, fact, dim, tmp_path / "mv",
                          join_col="ckey", dim_cols=["name"],
                          cluster_by="ckey")
    mj.refresh()
    head = mj.state.timeline.latest()
    assert len(head.files) >= 3
    probe = mj.state.read_by_value("ckey", [0])
    touched = {f for f in probe.inputFiles()}
    assert 0 < len(touched) <= 2  # strict subset: layout + ladder work
    assert probe.filter(F.col("ckey") == 0).count() == 8


def test_classifier_curation_screen_is_codegen_filter(spark):
    """corpus_classifier_curation's apply side: the learned screen must
    be a plain dot-product filter (codegen'd column arithmetic) — no
    cartesian, no Python eval, no window — so pushdown/pruning around
    it survive at 100 TB."""
    from glue_hudi_spark.plans import lint

    df = entry_mod.corpus_classifier_curation(spark, SF_DIR)
    lint.assert_no_cartesian(df)
    lint.assert_no_python_eval(df)
    assert "Window" not in lint.plan_text(df)
