"""Secondary-column bloom index: file pruning on non-key equality
lookups, sidecar lifecycle through clean/vacuum/restore."""

from __future__ import annotations

from pyspark.sql import functions as F

from glue_hudi_spark.storage.native import NativeTable


def _mk(spark, path, **kw):
    kw.setdefault("record_keys", ["id"])
    kw.setdefault("precombine", None)
    kw.setdefault("partition_keys", [])
    kw.setdefault("files_per_partition", 4)
    kw.setdefault("secondary_bloom_cols", ["cat"])
    return NativeTable(spark, path, **kw)


def _seed(spark, t, n=400):
    # record keys sort by id, cat correlates with id → each of the 4
    # files carries ~1 cat value, the case the index is for
    df = spark.createDataFrame(
        [(f"{i:04d}", f"c{i // 100}", i) for i in range(n)],
        "id string, cat string, v int")
    t.bulk_insert(df)
    return df


def _files_read(df):
    # the SCAN set (files the plan will read), not post-filter provenance
    return len(df.inputFiles())


def test_lookup_prunes_files_and_matches_filter(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    _seed(spark, t)
    hit = t.read_by_value("cat", ["c2"])
    assert hit.count() == 100
    assert {r["cat"] for r in hit.collect()} == {"c2"}
    # value set admits 1 of 4 files (bloom FP could admit one more)
    assert _files_read(hit) <= 2
    # full snapshot reads all 4
    assert _files_read(t.read_snapshot()) == 4


def test_absent_value_reads_zero_files(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    _seed(spark, t)
    miss = t.read_by_value("cat", ["zzz"])
    assert miss.count() == 0
    assert _files_read(miss) == 0


def test_without_index_falls_back_to_exact_filter(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, secondary_bloom_cols=[])
    _seed(spark, t)
    hit = t.read_by_value("cat", ["c1"])
    assert hit.count() == 100
    assert _files_read(hit) == 4  # no sidecars → no pruning, still correct


def test_sidecars_follow_file_lifecycle(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    _seed(spark, t)
    n_sidecars = len(list((t.root / "_index" / "bloom").rglob("*.bloom")))
    assert n_sidecars == 4  # one per file for 'cat' (bloom_index off)

    # upsert rewrites a slice → new files get sidecars; restore erases them
    t.upsert(spark.createDataFrame(
        [("0001", "c9", 999)], "id string, cat string, v int"))
    assert t.read_by_value("cat", ["c9"]).count() == 1
    t.restore(1)
    assert t.read_by_value("cat", ["c9"]).count() == 0
    rels = {p.name for p in (t.root / "_index" / "bloom").rglob("*.bloom")}
    assert len(rels) == 4
    assert t.validate()["ok"]


def test_mor_delta_falls_back_to_snapshot(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, storage_type="mor", compact_every=100)
    _seed(spark, t, n=40)
    t.upsert(spark.createDataFrame(
        [("0001", "c9", 999)], "id string, cat string, v int"))
    hit = t.read_by_value("cat", ["c9"])
    assert [r["id"] for r in hit.collect()] == ["0001"]


def test_probe_value_rendering_matches_spark_cast(spark, tmp_table_dir):
    """Bloom sidecars hash CAST(col AS STRING); the probe side must render
    Python values identically (str(True)='True' vs Spark 'true' would
    false-negative and silently prune files that DO contain matches)."""
    import datetime as dt

    t = NativeTable(
        spark, tmp_table_dir, record_keys=["id"], precombine=None,
        partition_keys=[], files_per_partition=2,
        secondary_bloom_cols=["flag", "ts"],
    )
    rows = [
        (f"{i:03d}", i % 2 == 0, dt.datetime(2024, 1, 1 + i % 5, 12, 30, i % 60))
        for i in range(40)
    ]
    t.bulk_insert(spark.createDataFrame(
        rows, "id string, flag boolean, ts timestamp"))
    # boolean probe: must not be pruned away by the 'True' vs 'true' gap
    assert t.read_by_value("flag", [True]).count() == 20
    assert t.read_by_value("flag", [False]).count() == 20
    # timestamp probe: isoformat 'T' separator vs Spark's space
    want = dt.datetime(2024, 1, 3, 12, 30, 2)
    got = t.read_by_value("ts", [want]).collect()
    assert [r["id"] for r in got] == ["002"]


def test_unrenderable_probe_values_keep_files_not_crash(spark, tmp_table_dir):
    """A probe value the stats/bloom layers can't canonicalize (None, a
    huge float) must disable pruning for the lookup — never TypeError,
    never a silently-empty result."""
    t = NativeTable(
        spark, tmp_table_dir, record_keys=["id"], precombine=None,
        partition_keys=[], files_per_partition=2,
        secondary_bloom_cols=["x"], stats_cols=["x"],
    )
    t.bulk_insert(spark.createDataFrame(
        [(f"{i:03d}", float(i)) for i in range(20)], "id string, x double"))
    # None probe: matches nothing (NULL equality) but must not crash the
    # stats prune (None is not orderable against [min, max])
    assert t.read_by_value("x", [None]).count() == 0
    # scientific-notation float: rendering declined -> bloom skipped,
    # exact filter still answers correctly
    assert t.read_by_value("x", [1e20]).count() == 0
    assert t.read_by_value("x", [1e20, 7.0]).count() == 1


def test_multi_column_lookup_intersects_indexes(spark, tmp_table_dir):
    """read_by_values: each column's index prunes independently; a file
    must survive ALL of them, so the composite scan set is the
    intersection — tighter than either column alone."""
    t = NativeTable(
        spark, tmp_table_dir, record_keys=["id"], precombine=None,
        partition_keys=[], files_per_partition=4,
        secondary_bloom_cols=["cat", "region"],
    )
    # cat correlates with file 0-3; region splits each cat differently
    rows = [(f"{i:04d}", f"c{i // 100}", f"r{(i // 50) % 2}", i)
            for i in range(400)]
    t.bulk_insert(spark.createDataFrame(
        rows, "id string, cat string, region string, v int"))

    both = t.read_by_values({"cat": ["c2"], "region": ["r0"]})
    got = {r["id"] for r in both.collect()}
    assert got == {f"{i:04d}" for i in range(200, 250)}
    assert len(both.inputFiles()) <= 2  # at most cat's file + 1 bloom FP
    # single-column path still routes through the same ladder
    assert t.read_by_value("cat", ["c2"]).count() == 100
    # empty probe dict rejected
    import pytest as _pytest
    with _pytest.raises(ValueError):
        t.read_by_values({})
