"""Bounded/scoped file rewrite (Iceberg rewrite_data_files class).

compact()/cluster() rewrite the whole table; rewrite_data_files is the
incremental maintenance primitive a 100-TB table needs: rewrite only a
partition range, only legacy-spec files, or only N files per pass —
everything else carries by manifest reference.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from glue_hudi_spark.storage.native import NativeTable


def _ts(day, hour=0):
    return dt.datetime(2024, 1, day, hour)


def _events(spark, lo, hi):
    rows = [dict(id=f"e{i:03d}", ts=_ts(1 + i // 24, i % 24), v=float(i))
            for i in range(lo, hi)]
    return spark.createDataFrame(rows)


def test_bounded_legacy_spec_migration(spark, tmp_path):
    t = NativeTable(spark, tmp_path / "t", record_keys=["id"],
                    precombine="v", partition_keys=["days(ts)"],
                    files_per_partition=1)
    t.bulk_insert(_events(spark, 0, 72))          # 3 day files
    t.evolve_partition_spec(["months(ts)"])

    def legacy():
        return [f for f in t.timeline.latest().files
                if "" in t._file_partition(f)]

    assert len(legacy()) == 3
    c1 = t.rewrite_data_files(only_legacy_spec=True, max_files=1)
    assert c1.stats["rewritten_files"] == 1
    assert c1.stats["carried_files"] == 2
    assert len(legacy()) == 2                      # bounded pass converges
    c2 = t.rewrite_data_files(only_legacy_spec=True)
    assert c2.stats["rewritten_files"] == 2
    assert legacy() == []
    assert all("_pp_ts_month=2024-01" in f
               for f in t.timeline.latest().files)
    assert t.read_snapshot().count() == 72
    # fully migrated → nothing more to do
    assert t.rewrite_data_files(only_legacy_spec=True) is None


def test_prune_scoped_rewrite(spark, tmp_path):
    t = NativeTable(spark, tmp_path / "t", record_keys=["id"],
                    precombine="v", partition_keys=["days(ts)"],
                    files_per_partition=2)
    t.bulk_insert(_events(spark, 0, 72))          # 3 day dirs
    before = t.timeline.latest().files
    n_day2 = len([f for f in before if "ts_day=2024-01-02" in f])
    c = t.rewrite_data_files(prune={"ts": (_ts(2), _ts(2, 23))})
    assert c.stats["rewritten_files"] == n_day2   # only day 2's files
    after = t.timeline.latest().files
    day1 = [f for f in after if "ts_day=2024-01-01" in f]
    assert set(day1) <= set(before)               # day 1 carried untouched
    assert t.read_snapshot().count() == 72


def test_preserves_commit_time_and_change_feed(spark, tmp_path):
    t = NativeTable(spark, tmp_path / "t", record_keys=["id"],
                    precombine="v", partition_keys=["days(ts)"],
                    files_per_partition=1)
    t.bulk_insert(_events(spark, 0, 48))
    head = t.timeline.latest().commit_id
    t.rewrite_data_files(prune={"ts": (_ts(2), None)})
    # the rewrite must NOT surface as changed rows in the incremental feed
    assert t.read_incremental(since_commit=head).count() == 0


def test_rewrite_materializes_deletion_vectors(spark, tmp_path):
    t = NativeTable(spark, tmp_path / "t", record_keys=["id"],
                    precombine="v", files_per_partition=4,
                    deletion_vectors=True)
    df = spark.createDataFrame(
        [dict(id=f"k{i:03d}", v=float(i)) for i in range(100)])
    t.bulk_insert(df)
    t.delete(df.filter(F.col("v") < 10).select("id"))
    assert t.timeline.latest().dvs                 # marks exist
    c = t.rewrite_data_files()                     # full rewrite (no scope)
    assert c.dvs == {}                             # materialized
    assert t.read_snapshot().count() == 90
    assert t.count_rows() == 90
