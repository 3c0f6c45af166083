"""Checkpoint storage hygiene (round-13 optimization).

Iterative operators localCheckpoint per round; without explicit release
every superseded label/vocab table stays in block-manager memory until
the ContextCleaner's periodic GC (default 30 min) — measured +6
persistent RDDs per corpus_curation pass, accumulating across a
122-query bench session. These tests pin that the operators now leave
at most their RESULT checkpoint behind, and that results are unchanged.
"""

from __future__ import annotations

import time

import pyspark.sql.functions as F

from glue_hudi_spark import checkpoints
from glue_hudi_spark.checkpoints import (
    release_checkpoint,
    release_checkpoint_leaves,
)
from glue_hudi_spark.operators import dedup, lm, sampling


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def _settle(spark) -> int:
    """Wait out in-flight async unpersists (release uses blocking=False)
    so a previous test's drains can't skew this test's before/after."""
    n = _n_persistent(spark)
    for _ in range(20):
        time.sleep(0.1)
        m = _n_persistent(spark)
        if m == n:
            return m
        n = m
    return n


def test_release_checkpoint_frees_storage(spark):
    before = _settle(spark)
    released_before = checkpoints.stats["released"]
    df = spark.range(100).localCheckpoint(eager=True)
    assert _settle(spark) <= before + 1
    assert release_checkpoint(df) is True
    assert _settle(spark) == before
    # the private-API path actually fired (rot guard: a Spark upgrade
    # that breaks the reflection turns this into a failing test, not a
    # silent storage leak)
    assert checkpoints.stats["released"] == released_before + 1


def test_release_checkpoint_leaves_frees_derived_frames(spark):
    """A frame DERIVED from a checkpoint (global_row_number's output)
    releases through the leaf walk; plain release_checkpoint is a no-op
    on it (the ADVICE-pinned bug this API fixes)."""
    before = _settle(spark)
    leaves_before = checkpoints.stats["leaves_released"]
    ranked, total = sampling.global_row_number(
        spark.range(500).select(F.col("id")), [F.col("id").asc()])
    assert total == 500
    assert ranked.count() == 500  # consume it fully
    assert _settle(spark) >= before + 1
    assert release_checkpoint(ranked) is False  # derived: not releasable
    assert _settle(spark) >= before + 1
    assert release_checkpoint_leaves(ranked) >= 1
    assert _settle(spark) == before
    assert checkpoints.stats["leaves_released"] > leaves_before


def test_release_checkpoint_harmless_on_plain_frames(spark):
    df = spark.range(10).select((F.col("id") * 2).alias("x"))
    release_checkpoint(df)  # not checkpoint-backed: must not raise
    assert df.count() == 10


def test_resolve_clusters_leaves_only_result_checkpoint(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22)],
        "id_a long, id_b long",
    )
    before = _settle(spark)
    out = dedup.resolve_clusters(pairs)
    rows = {(r["member_id"], r["cluster_id"]) for r in out.collect()}
    # chain 1-2-3-4 resolves to 1; 10-11 to 10; 20-21-22 to 20
    assert rows == {(1, 1), (2, 1), (3, 1), (4, 1),
                    (10, 10), (11, 10),
                    (20, 20), (21, 20), (22, 20)}
    # every superseded round table and the edge list were released;
    # only the final label checkpoint (the result) may remain
    assert _settle(spark) <= before + 1


def test_bpe_train_leaves_no_checkpoints(spark):
    docs = spark.createDataFrame(
        [("low low lower",), ("lowest low",), ("newer new",)],
        "text string",
    )
    before = _settle(spark)
    merges = lm.bpe_train(docs, rounds=4, min_count=2)
    assert merges, "fixture must produce at least one merge"
    # bpe_train returns a Python list — every vocab checkpoint is dead
    assert _settle(spark) <= before
