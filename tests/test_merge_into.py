"""Conditional MERGE INTO (NativeTable.merge_into).

Delta/Hudi spark-sql MERGE parity: whenMatchedDelete(condition),
whenMatchedUpdate(condition, set), whenNotMatchedInsert(condition) —
the general form of the reference's unconditional CDC routing
(processData.py:357-381)."""

from __future__ import annotations

import pytest

from glue_hudi_spark.storage.native import NativeTable


def _seed(spark, path, storage_type="cow"):
    t = NativeTable(
        spark, str(path), record_keys=["id"], precombine="ver",
        partition_keys=[], storage_type=storage_type,
    )
    base = spark.createDataFrame(
        [(1, 1, "a", 10.0), (2, 1, "b", 20.0), (3, 1, "c", 30.0),
         (4, 1, "d", 40.0)],
        "id int, ver int, tag string, value double",
    )
    t.bulk_insert(base)
    return t


def _src(spark):
    # id=1 matched, higher value -> update; id=2 matched, tag 'drop' ->
    # delete; id=3 matched, lower value -> falls through both clauses
    # (untouched); id=9 unmatched, positive -> insert; id=10 unmatched,
    # negative -> insert_condition filters it out.
    return spark.createDataFrame(
        [(1, 2, "a2", 99.0), (2, 2, "drop", 0.0), (3, 2, "c2", 1.0),
         (9, 1, "new", 5.0), (10, 1, "neg", -5.0)],
        "id int, ver int, tag string, value double",
    )


@pytest.mark.parametrize("storage_type", ["cow", "mor"])
def test_conditional_clauses(spark, tmp_path, storage_type):
    t = _seed(spark, tmp_path / "t", storage_type)
    t.merge_into(
        _src(spark),
        when_matched_delete="src.tag = 'drop'",
        when_matched_update={"value": "src.value", "tag": "src.tag",
                             "ver": "src.ver"},
        update_condition="src.value > tgt.value",
        when_not_matched_insert=True,
        insert_condition="src.value > 0",
    )
    got = {r.id: (r.tag, r.value) for r in t.read_snapshot().collect()}
    assert got == {
        1: ("a2", 99.0),   # updated (condition held)
        3: ("c", 30.0),    # matched, neither clause fired: untouched
        4: ("d", 40.0),    # not in source: untouched
        9: ("new", 5.0),   # inserted
    }                      # 2 deleted, 10 filtered by insert_condition


def test_partial_set_keeps_other_columns(spark, tmp_path):
    t = _seed(spark, tmp_path / "t")
    t.merge_into(
        _src(spark).filter("id = 1"),
        when_matched_update={"value": "tgt.value + src.value"},
        when_not_matched_insert=False,
    )
    row = t.read_snapshot().filter("id = 1").first()
    assert row.value == 109.0 and row.tag == "a"  # tag NOT overwritten


def test_star_replaces_whole_row(spark, tmp_path):
    t = _seed(spark, tmp_path / "t")
    t.merge_into(_src(spark).filter("id = 3"), when_matched_update="*",
                 when_not_matched_insert=False)
    row = t.read_snapshot().filter("id = 3").first()
    assert (row.tag, row.value, row.ver) == ("c2", 1.0, 2)


def test_insert_only_and_empty_table(spark, tmp_path):
    t = NativeTable(spark, str(tmp_path / "t"), record_keys=["id"],
                    precombine="ver", partition_keys=[])
    c = t.merge_into(_src(spark), insert_condition="src.value > 0")
    assert c is not None
    assert t.read_snapshot().count() == 3  # ids 1, 3, 9 (0 and -5 filtered)
    # second pass: survivors all match, no matched clauses -> no-op
    t.merge_into(_src(spark), when_not_matched_insert=True,
                 insert_condition="src.value > 0")
    assert t.read_snapshot().count() == 3


def test_schema_evolution_via_insert(spark, tmp_path):
    t = _seed(spark, tmp_path / "t")
    src = spark.createDataFrame(
        [(9, 1, "new", 5.0, "web")],
        "id int, ver int, tag string, value double, source string")
    t.merge_into(src, when_not_matched_insert=True)
    snap = t.read_snapshot()
    assert "source" in snap.columns
    by_id = {r.id: r.source for r in snap.collect()}
    assert by_id[9] == "web" and by_id[1] is None


def test_no_clauses_raises(spark, tmp_path):
    t = _seed(spark, tmp_path / "t")
    with pytest.raises(ValueError):
        t.merge_into(_src(spark), when_not_matched_insert=False)


def test_delete_precedes_update(spark, tmp_path):
    # a row satisfying BOTH clauses deletes (documented precedence)
    t = _seed(spark, tmp_path / "t")
    t.merge_into(
        _src(spark).filter("id = 1"),
        when_matched_delete="src.value > tgt.value",
        when_matched_update={"value": "src.value"},
        when_not_matched_insert=False,
    )
    assert t.read_snapshot().filter("id = 1").count() == 0


@pytest.mark.parametrize("storage_type", ["cow", "mor"])
def test_by_source_delete_full_sync(spark, tmp_path, storage_type):
    """Nightly full-snapshot reconciliation in ONE merge: upsert the
    snapshot, retire rows that left it."""
    t = _seed(spark, tmp_path / "t", storage_type)
    snap = spark.createDataFrame(
        [(1, 2, "a2", 11.0), (2, 2, "b2", 22.0), (9, 1, "new", 5.0)],
        "id int, ver int, tag string, value double",
    )
    t.merge_into(snap, when_matched_update="*",
                 when_not_matched_by_source_delete=True)
    rows = {r["id"]: r for r in t.read_snapshot().collect()}
    assert set(rows) == {1, 2, 9}            # 3 and 4 left the snapshot
    assert rows[1]["value"] == 11.0 and rows[2]["tag"] == "b2"


def test_by_source_delete_condition_and_update(spark, tmp_path):
    """Conditional by-source clauses: delete only stale rows, flag the
    rest — precedence is delete first, then update (Delta order)."""
    t = _seed(spark, tmp_path / "t")
    src = spark.createDataFrame([(1, 2, "a2", 99.0)],
                                "id int, ver int, tag string, value double")
    t.merge_into(
        src, when_matched_update="*",
        when_not_matched_by_source_delete="tgt.value >= 40.0",
        when_not_matched_by_source_update={"tag": "'orphan'"},
    )
    rows = {r["id"]: r for r in t.read_snapshot().collect()}
    assert set(rows) == {1, 2, 3}            # 4 (value 40) deleted
    assert rows[1]["value"] == 99.0          # matched update
    assert rows[2]["tag"] == "orphan" and rows[3]["tag"] == "orphan"
    assert rows[2]["value"] == 20.0          # by-source update keeps others


def test_by_source_with_empty_source_is_meaningful(spark, tmp_path):
    """With a by-source clause an empty source means EVERY row is
    unmatched — the merge must not silently no-op."""
    t = _seed(spark, tmp_path / "t")
    empty = spark.createDataFrame(
        [], "id int, ver int, tag string, value double")
    t.merge_into(empty, when_not_matched_insert=False,
                 when_not_matched_by_source_delete="tgt.value > 25.0")
    assert {r["id"] for r in t.read_snapshot().collect()} == {1, 2}


def test_duplicate_source_matches_raise_by_default(spark, tmp_path):
    """Delta parity: several source rows matching one target row is an
    error under update/delete clauses; duplicate_matches='precombine'
    opts into the keyed-table resolution (max precombine wins)."""
    t = _seed(spark, tmp_path / "t")
    dup = spark.createDataFrame(
        [(1, 2, "x", 50.0), (1, 3, "y", 60.0)],
        "id int, ver int, tag string, value double")
    with pytest.raises(ValueError, match="multiple source rows"):
        t.merge_into(dup, when_matched_update="*")
    t.merge_into(dup, when_matched_update="*",
                 duplicate_matches="precombine")
    rows = {r["id"]: r for r in t.read_snapshot().collect()}
    assert rows[1]["tag"] == "y" and rows[1]["value"] == 60.0  # ver 3 wins


def test_duplicate_unmatched_inserts_do_not_raise(spark, tmp_path):
    """The multiple-match error is about MATCHED ambiguity; duplicate
    brand-new keys collapse via precombine like any keyed insert."""
    t = _seed(spark, tmp_path / "t")
    dup_new = spark.createDataFrame(
        [(9, 1, "n1", 1.0), (9, 2, "n2", 2.0)],
        "id int, ver int, tag string, value double")
    t.merge_into(dup_new, when_matched_update="*")
    rows = {r["id"]: r for r in t.read_snapshot().collect()}
    assert rows[9]["tag"] == "n2"
