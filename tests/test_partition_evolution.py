"""Partition-spec evolution (Iceberg partition-evolution class).

``evolve_partition_spec`` is a metadata-only commit: zero data files
move. Old files stay in their old-spec dirs and are handled
conservatively (never partition-pruned, always merge-affected); new
writes lay out under the new spec; compact() migrates the whole table.
The persisted spec is authoritative on open, survives rollback, and a
concurrent evolve conflicts with an in-flight write's rebase.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from glue_hudi_spark.storage.native import NativeTable


def _ts(day, hour=0):
    return dt.datetime(2024, 1, day, hour)


def _events(spark, lo, hi):
    rows = [dict(id=f"e{i:03d}", ts=_ts(1 + i // 24, i % 24), v=float(i))
            for i in range(lo, hi)]
    return spark.createDataFrame(rows)


def test_unpartitioned_to_days(spark, tmp_path):
    t = NativeTable(spark, tmp_path / "t", record_keys=["id"],
                    precombine="v", files_per_partition=1)
    t.bulk_insert(_events(spark, 0, 24))          # day 1, no partition dirs
    c = t.evolve_partition_spec(["days(ts)"])
    assert c.action == "evolve_partition" and c.files == \
        t.timeline.at(c.commit_id - 1).files      # zero data movement
    t.upsert(_events(spark, 24, 48))              # day 2, new layout
    head = t.timeline.latest()
    day2 = [f for f in head.files if "_pp_ts_day=2024-01-02" in f]
    old = [f for f in head.files if "_pp_" not in f]
    assert day2 and old                           # mixed layout
    assert t.read_snapshot().count() == 48
    # pruning: day-2 dirs are pruned exactly; old-spec files kept
    out = t.read_snapshot(prune={"ts": (_ts(2), None)})
    assert out.count() == 24
    assert set(out.inputFiles()) >= {f for f in out.inputFiles()
                                     if "2024-01-02" in f}


def test_old_spec_files_always_merge_affected(spark, tmp_path):
    t = NativeTable(spark, tmp_path / "t", record_keys=["id"],
                    precombine="v", files_per_partition=1)
    t.bulk_insert(_events(spark, 0, 24))
    t.evolve_partition_spec(["days(ts)"])
    # the patched key lives in an OLD-spec file; the batch's partition
    # tuple (day 1) matches no current-spec dir — the old file must
    # still flow through the merge
    c = t.upsert(spark.createDataFrame([dict(id="e005", ts=_ts(1, 5),
                                             v=555.0)]))
    got = {r["id"]: r["v"] for r in t.read_snapshot().collect()}
    assert got["e005"] == 555.0 and len(got) == 24
    assert c.stats["files_rewritten"] == 1


def test_compact_migrates_layout(spark, tmp_path):
    t = NativeTable(spark, tmp_path / "t", record_keys=["id"],
                    precombine="v", files_per_partition=1)
    t.bulk_insert(_events(spark, 0, 48))
    t.evolve_partition_spec(["days(ts)"])
    t.compact()
    head = t.timeline.latest()
    assert all("_pp_ts_day=" in f for f in head.files)
    # after migration, pruning drops out-of-range dirs completely
    out = t.read_snapshot(prune={"ts": (_ts(2), None)})
    assert all("2024-01-02" in f for f in out.inputFiles())
    assert out.count() == 24


def test_spec_persisted_and_authoritative_on_open(spark, tmp_path):
    t = NativeTable(spark, tmp_path / "t", record_keys=["id"],
                    precombine="v", partition_keys=["days(ts)"])
    t.bulk_insert(_events(spark, 0, 24))
    t.evolve_partition_spec(["months(ts)"])
    # reopen with a STALE constructor spec: the manifest wins
    t2 = NativeTable(spark, tmp_path / "t", record_keys=["id"],
                     precombine="v", partition_keys=["days(ts)"])
    assert t2.partition_keys == ["months(ts)"]
    t2.upsert(_events(spark, 24, 48))
    assert any("_pp_ts_month=2024-01" in f
               for f in t2.timeline.latest().files)


def test_rebucket_widths_never_collide(spark, tmp_path):
    t = NativeTable(spark, tmp_path / "t", record_keys=["id"],
                    precombine="v", partition_keys=["bucket(2, id)"])
    t.bulk_insert(spark.createDataFrame(
        [dict(id=f"k{i}", v=float(i)) for i in range(20)]))
    t.evolve_partition_spec(["bucket(4, id)"])
    t.upsert(spark.createDataFrame(
        [dict(id=f"k{i}", v=float(i) + 0.5) for i in range(20, 30)]))
    head = t.timeline.latest()
    # width-tagged field names keep the two layouts distinguishable
    assert any("_pp_id_bucket2=" in f for f in head.files)
    assert any("_pp_id_bucket4=" in f for f in head.files)
    # updating a key in an old-width file still merges correctly
    t.upsert(spark.createDataFrame([dict(id="k3", v=333.0)]))
    got = {r["id"]: r["v"] for r in t.read_snapshot().collect()}
    assert got["k3"] == 333.0 and len(got) == 30


def test_rollback_restores_spec(spark, tmp_path):
    t = NativeTable(spark, tmp_path / "t", record_keys=["id"],
                    precombine="v", partition_keys=["days(ts)"])
    t.bulk_insert(_events(spark, 0, 24))
    t.evolve_partition_spec(["months(ts)"])
    t.rollback()
    assert t.partition_keys == ["days(ts)"]
    assert t.timeline.latest().partition_spec == ["days(ts)"]
    t.upsert(_events(spark, 24, 48))
    assert any("_pp_ts_day=2024-01-02" in f
               for f in t.timeline.latest().files)


def test_evolve_validation(spark, tmp_path):
    t = NativeTable(spark, tmp_path / "t", record_keys=["id"],
                    precombine="v", partition_keys=["days(ts)"])
    t.bulk_insert(_events(spark, 0, 4))
    with pytest.raises(ValueError, match="not in table schema"):
        t.evolve_partition_spec(["days(nope)"])
    with pytest.raises(ValueError, match="duplicate"):
        t.evolve_partition_spec(["days(ts)", "days(ts)"])
    # same field name, different definition vs the previous spec: a
    # column literally named like the old transform's field
    t2 = NativeTable(spark, tmp_path / "t2", record_keys=["id"],
                     precombine="v", partition_keys=["days(ts)"])
    t2.bulk_insert(spark.createDataFrame(
        [dict(id="a", ts=_ts(1), ts_day="x", v=1.0)]))
    with pytest.raises(ValueError, match="collides"):
        t2.evolve_partition_spec(["ts_day"])


def test_concurrent_evolve_conflicts_with_write(spark, tmp_path):
    """A writer that loses the commit race to a spec evolution must NOT
    rebase (its pruning decisions were made under the old spec)."""
    from glue_hudi_spark.storage.commits import ConcurrentWriteError

    t = NativeTable(spark, tmp_path / "t", record_keys=["id"],
                    precombine="v", partition_keys=["days(ts)"])
    t.bulk_insert(_events(spark, 0, 24))
    writer = NativeTable(spark, tmp_path / "t", record_keys=["id"],
                         precombine="v", partition_keys=["days(ts)"])
    orig = writer.timeline.publish
    raced = {}

    def race_once(commit):
        if not raced:
            raced["x"] = True
            t.evolve_partition_spec(["months(ts)"])
        return orig(commit)

    writer.timeline.publish = race_once
    with pytest.raises(ConcurrentWriteError, match="partition spec"):
        writer.upsert(_events(spark, 24, 30))


def test_evolve_to_unpartitioned(spark, tmp_path):
    t = NativeTable(spark, tmp_path / "t", record_keys=["id"],
                    precombine="v", partition_keys=["days(ts)"])
    t.bulk_insert(_events(spark, 0, 24))
    t.evolve_partition_spec([])
    assert t.partition_keys == []
    t.upsert(_events(spark, 24, 48))
    assert t.read_snapshot().count() == 48
    # reopen adopts the empty (recorded) spec over the constructor's
    t2 = NativeTable(spark, tmp_path / "t", record_keys=["id"],
                     precombine="v", partition_keys=["days(ts)"])
    assert t2.partition_keys == []
