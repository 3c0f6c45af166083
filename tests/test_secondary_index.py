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
