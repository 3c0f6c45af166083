"""Write-audit-publish: bad batches can never remain visible — the
write is applied, audited against the POST-merge snapshot, and restored
away on violation."""

from __future__ import annotations

import pytest

from glue_hudi_spark.operators import expectations as EX
from glue_hudi_spark.storage.native import NativeTable


def _mk(spark, path):
    return NativeTable(spark, path, record_keys=["id"], precombine="seq",
                       partition_keys=[])


def _rows(spark, rows):
    return spark.createDataFrame(rows, "id string, v int, seq int")


RULES = [EX.in_range("v_range", "v", 0, 100), EX.not_null("v_nn", "v")]


def test_wap_publishes_clean_batch(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    t.bulk_insert(_rows(spark, [("a", 1, 1), ("b", 2, 1)]))
    commit, report = t.write_audit_publish(
        _rows(spark, [("b", 50, 2), ("c", 3, 2)]), RULES)
    assert commit is not None
    assert all(v == 0 for _, v, _ in report)
    assert {(r["id"], r["v"]) for r in t.read_snapshot().collect()} == {
        ("a", 1), ("b", 50), ("c", 3)}


def test_wap_restores_on_violation(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    t.bulk_insert(_rows(spark, [("a", 1, 1)]))
    n_commits = len(t.timeline.history())
    with pytest.raises(EX.QualityGateError) as ei:
        t.write_audit_publish(_rows(spark, [("b", 999, 2)]), RULES)
    assert "v_range" in str(ei.value)
    # the staged commit is GONE — timeline and snapshot as before
    assert len(t.timeline.history()) == n_commits
    assert {(r["id"], r["v"]) for r in t.read_snapshot().collect()} == {("a", 1)}
    assert t.validate()["ok"]
    # the table still accepts writes afterwards
    t.upsert(_rows(spark, [("c", 7, 3)]))
    assert t.read_snapshot().count() == 2


def test_wap_catches_merge_created_violations(spark, tmp_table_dir):
    """The audit sees the post-merge state: the batch alone is clean, but
    merging it nulls a required field via partial update."""
    t = _mk(spark, tmp_table_dir)
    t.bulk_insert(_rows(spark, [("a", 5, 1)]))
    bad = spark.createDataFrame([("a", None, 2)], "id string, v int, seq int")
    with pytest.raises(EX.QualityGateError):
        t.write_audit_publish(bad, RULES)
    assert [r["v"] for r in t.read_snapshot().collect()] == [5]


def test_wap_first_write_failure_empties_table(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    with pytest.raises(EX.QualityGateError):
        t.write_audit_publish(
            _rows(spark, [("a", -1, 1)]), RULES, op="bulk_insert")
    assert not t.exists()
    # and a good first write then succeeds
    commit, _ = t.write_audit_publish(
        _rows(spark, [("a", 1, 1)]), RULES, op="bulk_insert")
    assert commit.commit_id >= 1
    assert t.read_snapshot().count() == 1
