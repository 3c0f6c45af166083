"""OCC retry-with-rebase: two concurrent same-table writers touching
disjoint files both commit without manual retry; genuinely overlapping
writers still raise ConcurrentWriteError.

The race is driven deterministically: writer B's ``timeline.publish`` is
wrapped so the WINNING writer A runs its entire upsert in the window
between B's data write and B's manifest publish — exactly the interval an
optimistic writer is exposed in.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from glue_hudi_spark.storage.commits import ConcurrentWriteError
from glue_hudi_spark.storage.native import NativeTable


def _rows(spark, rows):
    return spark.createDataFrame([Row(**r) for r in rows])


def _race(loser: NativeTable, winner_write):
    """Arrange for ``winner_write()`` to land between the loser's data
    write and its manifest publish (first publish attempt only)."""
    orig = loser.timeline.publish
    fired = []

    def racing_publish(commit):
        if not fired:
            fired.append(True)
            winner_write()
        return orig(commit)

    loser.timeline.publish = racing_publish
    return fired


def _seed_partitioned(spark, path):
    t = NativeTable(spark, path, record_keys=["id"], precombine="seq",
                    partition_keys=["pt"])
    t.bulk_insert(_rows(spark, [
        dict(id=f"a{i}", pt="p1", v=i, seq=1) for i in range(5)
    ] + [dict(id=f"b{i}", pt="p2", v=i, seq=1) for i in range(5)]))
    return t


def test_disjoint_partition_writers_both_commit(spark, tmp_path):
    path = tmp_path / "t"
    _seed_partitioned(spark, path)
    wa = NativeTable(spark, path, record_keys=["id"], precombine="seq",
                     partition_keys=["pt"])
    wb = NativeTable(spark, path, record_keys=["id"], precombine="seq",
                     partition_keys=["pt"])

    fired = _race(wb, lambda: wa.upsert(_rows(spark, [
        dict(id="a0", pt="p1", v=100, seq=2)])))
    wb.upsert(_rows(spark, [dict(id="b0", pt="p2", v=200, seq=2)]))
    assert fired, "race did not fire"

    latest = wb.timeline.latest()
    assert latest.commit_id == 3                      # seed, A=2, B rebased->3
    assert latest.stats["occ_rebased_from"] == 2
    assert latest.stats["occ_rebased_onto"] == 2
    snap = {r["id"]: r["v"] for r in wb.read_snapshot().collect()}
    assert len(snap) == 10
    assert snap["a0"] == 100 and snap["b0"] == 200    # neither write lost

    # incremental correctness after restamp: "since A's commit" returns
    # ONLY B's rows — B's rows must NOT be stamped with A's commit id
    inc = {r["id"] for r in wb.read_incremental(2).collect()}
    assert inc == {"b0"}
    inc_all = {r["id"] for r in wb.read_incremental(1).collect()}
    assert inc_all == {"a0", "b0"}

    rep = wb.validate()
    assert not rep["missing_files"] and not rep["unreadable_manifests"]


def test_same_file_writers_conflict(spark, tmp_path):
    """Both writers rewrite partition p1's files — rebase must refuse."""
    path = tmp_path / "t"
    _seed_partitioned(spark, path)
    wa = NativeTable(spark, path, record_keys=["id"], precombine="seq",
                     partition_keys=["pt"])
    wb = NativeTable(spark, path, record_keys=["id"], precombine="seq",
                     partition_keys=["pt"])
    _race(wb, lambda: wa.upsert(_rows(spark, [
        dict(id="a0", pt="p1", v=100, seq=2)])))
    with pytest.raises(ConcurrentWriteError, match="rewrote files"):
        wb.upsert(_rows(spark, [dict(id="a1", pt="p1", v=200, seq=2)]))
    # winner's write intact, loser's rows absent
    snap = {r["id"]: r["v"] for r in wa.read_snapshot().collect()}
    assert snap["a0"] == 100 and snap["a1"] == 1


def test_overlapping_insert_key_ranges_conflict(spark, tmp_path):
    """Unpartitioned concurrent INSERTS of interleaved keys touch no
    common existing file, but the key-range check must still refuse —
    silently committing both could publish duplicate record keys."""
    path = tmp_path / "t"
    t = NativeTable(spark, path, record_keys=["id"], precombine="seq")
    t.bulk_insert(_rows(spark, [dict(id=f"k{i:03d}", v=i, seq=1)
                                for i in range(10)]))
    wa = NativeTable(spark, path, record_keys=["id"], precombine="seq")
    wb = NativeTable(spark, path, record_keys=["id"], precombine="seq")
    _race(wb, lambda: wa.upsert(_rows(spark, [
        dict(id="x500", v=1, seq=2)])))
    with pytest.raises(ConcurrentWriteError, match="overlapping key"):
        wb.upsert(_rows(spark, [dict(id="x500", v=2, seq=2)]))


def test_mor_delta_append_rebases(spark, tmp_path):
    """Two MoR writers appending deltas share no files at all — both
    land; the loser's delta entry re-keys to the rebased commit id."""
    path = tmp_path / "t"
    t = NativeTable(spark, path, record_keys=["id"], precombine="seq",
                    partition_keys=["pt"], storage_type="mor",
                    compact_every=100)
    t.bulk_insert(_rows(spark, [
        dict(id="a0", pt="p1", v=1, seq=1),
        dict(id="b0", pt="p2", v=1, seq=1)]))
    wa = NativeTable(spark, path, record_keys=["id"], precombine="seq",
                     partition_keys=["pt"], storage_type="mor",
                     compact_every=100)
    wb = NativeTable(spark, path, record_keys=["id"], precombine="seq",
                     partition_keys=["pt"], storage_type="mor",
                     compact_every=100)
    _race(wb, lambda: wa.upsert(_rows(spark, [
        dict(id="a0", pt="p1", v=100, seq=2)])))
    wb.upsert(_rows(spark, [dict(id="b0", pt="p2", v=200, seq=2)]))

    latest = wb.timeline.latest()
    assert latest.commit_id == 3
    assert [d["commit_id"] for d in latest.deltas] == [2, 3]
    snap = {r["id"]: r["v"] for r in wb.read_snapshot().collect()}
    assert snap == {"a0": 100, "b0": 200}
    inc = {r["id"] for r in wb.read_incremental(2).collect()}
    assert inc == {"b0"}


def test_double_race_rebases_twice(spark, tmp_path):
    """TWO winners land inside the loser's publish window — the bounded
    rebase loop must re-rebase onto each new head and still publish."""
    path = tmp_path / "t"
    _seed_partitioned(spark, path)
    mk = lambda: NativeTable(spark, path, record_keys=["id"],
                             precombine="seq", partition_keys=["pt"])
    wa, wb, wc = mk(), mk(), mk()

    orig = wc.timeline.publish
    step = []

    def racing_publish(commit):
        if len(step) == 0:
            step.append(1)
            wa.upsert(_rows(spark, [dict(id="a0", pt="p1", v=100, seq=2)]))
        elif len(step) == 1:
            # fires on wc's FIRST rebase retry: a second winner lands
            step.append(2)
            wb.upsert(_rows(spark, [dict(id="a1", pt="p1", v=150, seq=2)]))
        return orig(commit)

    wc.timeline.publish = racing_publish
    wc.upsert(_rows(spark, [dict(id="b0", pt="p2", v=200, seq=2)]))
    assert len(step) == 2, "second race did not fire"

    latest = wc.timeline.latest()
    assert latest.commit_id == 4          # seed, A=2, B=3, C rebased -> 4
    snap = {r["id"]: r["v"] for r in wc.read_snapshot().collect()}
    assert snap["a0"] == 100 and snap["a1"] == 150 and snap["b0"] == 200
    assert len(snap) == 10
    # each writer's rows attribute to its own commit
    assert {r["id"] for r in wc.read_incremental(3).collect()} == {"b0"}
    assert {r["id"] for r in wc.read_incremental(2).collect()} == {"a1", "b0"}


def test_insert_overwrite_never_rebases(spark, tmp_path):
    """REPLACE semantics: 'the table is exactly df'. Carrying a concurrent
    winner's rows through a rebase would silently violate that intent, so
    an overwrite that loses the race must surface the conflict."""
    path = tmp_path / "t"
    t = NativeTable(spark, path, record_keys=["id"], precombine="seq")
    t.bulk_insert(_rows(spark, [dict(id="a", v=1, seq=1)]))
    wa = NativeTable(spark, path, record_keys=["id"], precombine="seq")
    wb = NativeTable(spark, path, record_keys=["id"], precombine="seq")
    _race(wb, lambda: wa.bulk_insert(_rows(spark, [dict(id="zz", v=9, seq=1)])))
    with pytest.raises(ConcurrentWriteError):
        wb.insert_overwrite(_rows(spark, [dict(id="only", v=5, seq=1)]))
    # winner's append survives; the overwrite landed nothing
    snap = {r["id"] for r in wa.read_snapshot().collect()}
    assert snap == {"a", "zz"}
