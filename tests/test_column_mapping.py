"""Column rename/drop schema evolution (Delta column-mapping class).

Rename and drop are METADATA-ONLY commits: a manifest-carried
logical→physical mapping serves renamed columns from unmodified files,
and hides dropped ones; compact()/cluster() materialize the mapping
back into file schemas. Time travel renders each commit's own mapping,
so history reads with the names that were current then.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from glue_hudi_spark.storage.native import NativeTable


def _seed(spark, path, **kw):
    t = NativeTable(spark, path, record_keys=["id"], precombine="seq", **kw)
    t.bulk_insert(spark.createDataFrame(
        [(f"k{i}", 1, float(i), f"tag{i % 3}") for i in range(10)],
        "id string, seq int, v double, tag string"))
    return t


def test_rename_is_metadata_only_and_time_travel_sees_both(spark, tmp_path):
    t = _seed(spark, tmp_path / "t")
    files_before = set(t.timeline.latest().files)
    t.rename_column("v", "val")
    c = t.timeline.latest()
    assert c.action == "rename_column"
    assert set(c.files) == files_before          # zero data rewrite
    snap = t.read_snapshot()
    assert "val" in snap.columns and "v" not in snap.columns
    assert {r["val"] for r in snap.filter("id = 'k3'").collect()} == {3.0}
    # a merge AFTER the rename writes through the mapping
    t.upsert(spark.createDataFrame([("k3", 2, 99.0, "tagX")],
                                   "id string, seq int, val double, tag string"))
    assert t.read_snapshot().filter("id = 'k3'").first()["val"] == 99.0
    # time travel BEFORE the rename serves the old name
    old = t.read_snapshot(as_of=1)
    assert "v" in old.columns and "val" not in old.columns
    assert old.filter("id = 'k3'").first()["v"] == 3.0


def test_drop_hides_column_and_compact_materializes(spark, tmp_path):
    t = _seed(spark, tmp_path / "t")
    t.drop_column("tag")
    snap = t.read_snapshot()
    assert "tag" not in snap.columns
    # writes may omit the dropped column
    t.upsert(spark.createDataFrame([("k0", 2, 50.0)],
                                   "id string, seq int, v double"))
    assert t.read_snapshot().filter("id = 'k0'").first()["v"] == 50.0
    # time travel before the drop still serves it
    assert t.read_snapshot(as_of=1).filter("id = 'k1'").first()["tag"] == "tag1"
    # re-adding the retired name is rejected with a pointer to compact()
    with pytest.raises(ValueError, match="dropped"):
        t.upsert(spark.createDataFrame([("k9", 3, 1.0, "boom")],
                                       "id string, seq int, v double, tag string"))
    t.compact()
    c = t.timeline.latest()
    assert c.column_mapping == {} and c.retired_cols == []
    assert "tag" not in t.read_snapshot().columns
    # after materialization the name is free again (schema evolution)
    t.upsert(spark.createDataFrame([("k9", 3, 1.0, "fresh")],
                                   "id string, seq int, v double, tag string"))
    assert t.read_snapshot().filter("id = 'k9'").first()["tag"] == "fresh"


def test_rename_then_compact_materializes_physical_names(spark, tmp_path):
    t = _seed(spark, tmp_path / "t")
    t.rename_column("v", "val")
    t.compact()
    c = t.timeline.latest()
    assert c.column_mapping == {} and c.retired_cols == []
    import pyarrow.parquet as pq
    phys = set()
    for rel in c.files:
        phys |= set(pq.read_schema(str(t.root / rel)).names)
    assert "val" in phys and "v" not in phys
    assert t.read_snapshot().filter("id = 'k2'").first()["val"] == 2.0


def test_structural_columns_cannot_be_renamed_or_dropped(spark, tmp_path):
    t = _seed(spark, tmp_path / "t")
    for col, verb in [("id", "rename"), ("seq", "rename")]:
        with pytest.raises(ValueError, match="cannot"):
            (t.rename_column(col, "x") if verb == "rename"
             else t.drop_column(col))
    with pytest.raises(ValueError, match="cannot"):
        t.drop_column("id")
    with pytest.raises(ValueError, match="already exists"):
        t.rename_column("v", "tag")
    with pytest.raises(ValueError, match="no such column"):
        t.rename_column("ghost", "x")


def test_merge_into_on_renamed_table(spark, tmp_path):
    t = _seed(spark, tmp_path / "t")
    t.rename_column("v", "val")
    src = spark.createDataFrame([("k1", 2, 1000.0, "t"), ("new", 1, 7.0, "t")],
                                "id string, seq int, val double, tag string")
    t.merge_into(src, when_matched_update="*", when_not_matched_insert=True)
    rows = {r["id"]: r["val"] for r in t.read_snapshot().collect()}
    assert rows["k1"] == 1000.0 and rows["new"] == 7.0 and len(rows) == 11


def test_rollback_restores_mapping(spark, tmp_path):
    t = _seed(spark, tmp_path / "t")
    t.rename_column("v", "val")
    t.rollback()  # undo the rename
    snap = t.read_snapshot()
    assert "v" in snap.columns and "val" not in snap.columns


def test_ghs_table_reads_renamed_table(spark, tmp_path):
    """The data source serves the logical schema (batch + pushdown)."""
    from glue_hudi_spark.sources import datasource as DS

    DS.register(spark)
    t = _seed(spark, tmp_path / "t", stats_cols=["v"])
    # stats_cols protect 'v'; rename an unindexed column instead
    t.rename_column("tag", "label")
    df = (spark.read.format("ghs_table").option("path", str(t.root)).load())
    assert "label" in df.columns and "tag" not in df.columns
    got = {r["label"] for r in df.filter(F.col("label") == "tag1").collect()}
    assert got == {"tag1"}
    assert df.count() == 10


def test_strict_schema_rejects_unknown_columns(spark, tmp_path):
    """Delta-style schema enforcement: strict_schema=True fails a write
    that would silently evolve the schema; renamed names stay allowed,
    dropped names stay rejected."""
    t = NativeTable(spark, tmp_path / "t", record_keys=["id"],
                    precombine="seq", strict_schema=True)
    t.bulk_insert(spark.createDataFrame(
        [("a", 1, 1.0)], "id string, seq int, v double"))
    with pytest.raises(ValueError, match="strict_schema"):
        t.upsert(spark.createDataFrame(
            [("a", 2, 2.0, "oops")], "id string, seq int, v double, extra string"))
    # subset batches are fine (missing columns read NULL per usual)
    t.upsert(spark.createDataFrame([("b", 1, 5.0)],
                                   "id string, seq int, v double"))
    assert t.read_snapshot().count() == 2
    # after a rename the LOGICAL name is the allowed one
    t.rename_column("v", "val")
    t.upsert(spark.createDataFrame([("c", 1, 9.0)],
                                   "id string, seq int, val double"))
    with pytest.raises(ValueError, match="strict_schema"):
        t.upsert(spark.createDataFrame([("d", 1, 9.0)],
                                       "id string, seq int, v double"))
    assert t.read_snapshot().count() == 3
