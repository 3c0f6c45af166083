"""Change feed (CDF shape) + incremental view maintenance: the
maintained-equals-recomputed invariant across a sequence of commits,
group birth and death, pre/post image pairing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from glue_hudi_spark.operators import ivm
from glue_hudi_spark.storage.native import NativeTable


def _mk(spark, path):
    return NativeTable(spark, path, record_keys=["id"], precombine="seq",
                       partition_keys=[])


def _rows(spark, rows):
    return spark.createDataFrame(
        rows, "id string, grp string, value double, seq int")


def _state_dict(df):
    return {r["grp"]: (r["cnt"], float(r["total"])) for r in df.collect()}


def test_change_feed_emits_both_update_images(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    t.bulk_insert(_rows(spark, [("a", "g1", 1.0, 1), ("b", "g1", 2.0, 1)]))
    t.upsert(_rows(spark, [("b", "g2", 5.0, 2), ("c", "g2", 7.0, 2)]))
    feed = {(r["_change_type"], r["id"]): r["value"]
            for r in t.change_feed(1).collect()}
    assert feed == {
        ("update_preimage", "b"): 2.0,
        ("update_postimage", "b"): 5.0,
        ("insert", "c"): 7.0,
    }


def test_maintained_state_equals_recompute_across_commits(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    t.bulk_insert(_rows(spark, [
        ("a", "g1", 1.5, 1), ("b", "g1", 2.5, 1), ("c", "g2", 10.0, 1)]))
    state = ivm.aggregate_state(t.read_snapshot(as_of=1), ["grp"], "value")

    # commit 2: move b to g2, add d in new group g3
    t.upsert(_rows(spark, [("b", "g2", 3.0, 2), ("d", "g3", 4.0, 2)]))
    state = ivm.apply_change_feed(
        state, t.change_feed(1, 2), ["grp"], "value")
    assert _state_dict(state) == _state_dict(
        ivm.aggregate_state(t.read_snapshot(as_of=2), ["grp"], "value"))

    # commit 3: delete every g2 member → the group must die
    t.delete(_rows(spark, [("b", "g2", 3.0, 3), ("c", "g2", 10.0, 3)]))
    state = ivm.apply_change_feed(
        state, t.change_feed(2, 3), ["grp"], "value")
    d = _state_dict(state)
    assert "g2" not in d
    assert d == _state_dict(
        ivm.aggregate_state(t.read_snapshot(), ["grp"], "value"))


def test_unchanged_rows_never_appear_in_feed(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    t.bulk_insert(_rows(spark, [("a", "g1", 1.0, 1), ("b", "g1", 2.0, 1)]))
    # rewrite a with IDENTICAL data (every column, precombine included —
    # a changed seq is a changed row and WOULD rightly appear in the feed)
    t.upsert(_rows(spark, [("a", "g1", 1.0, 1)]))
    assert t.change_feed(1).count() == 0
    assert t.diff_snapshots(1).count() == 0


def test_bad_commit_order_rejected(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    t.bulk_insert(_rows(spark, [("a", "g1", 1.0, 1)]))
    with pytest.raises(ValueError):
        t.diff_snapshots(1, 1)
    with pytest.raises(ValueError):
        t.change_feed(2, 1)
