"""Metadata-only ADD COLUMN with DEFAULT values (Delta ADD COLUMN ...
DEFAULT class): pre-add files serve the default (they cannot hold real
values), post-add writes serve stored values — an explicit NULL stays
NULL. Zero rewrites; compaction materializes."""

from __future__ import annotations

import pytest

from glue_hudi_spark.sources import datasource as DS
from glue_hudi_spark.storage.native import NativeTable


def _rows(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def _mk(spark, path, **kw):
    t = NativeTable(spark, path, record_keys=["id"], precombine="seq", **kw)
    t.bulk_insert(_rows(spark, [(f"k{i:02d}", float(i), 1) for i in range(20)],
                        "id string, v double, seq int"))
    return t


def test_add_column_nullable_no_default(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    c = t.add_column("note", "string")
    assert c.action == "add_column" and c.files  # zero rewrite
    snap = t.read_snapshot()
    assert dict(snap.dtypes)["note"] == "string"
    assert snap.filter("note is not null").count() == 0


def test_add_column_default_backfills_only_pre_add_rows(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", files_per_partition=4)
    prev_files = set(t.timeline.latest().files)
    t.add_column("tier", "string", default="legacy")
    assert set(t.timeline.latest().files) == prev_files  # metadata-only
    # all pre-add rows read the default
    snap = {r["id"]: r["tier"] for r in t.read_snapshot().collect()}
    assert set(snap.values()) == {"legacy"} and len(snap) == 20
    # post-add writer: explicit value AND explicit NULL both stored
    t.upsert(_rows(spark, [("k00", 0.0, 2, "gold"), ("k01", 1.0, 2, None)],
                   "id string, v double, seq int, tier string"))
    snap = {r["id"]: r["tier"] for r in t.read_snapshot().collect()}
    assert snap["k00"] == "gold"
    assert snap["k01"] is None          # NOT backfilled: post-add null
    assert snap["k05"] == "legacy"      # untouched pre-add row
    # rows of pre-add files REWRITTEN by the merge materialized their
    # default (they rode through the defaults-applied read)
    assert snap["k02"] == "legacy"


def test_add_column_time_travel_and_compaction(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.add_column("tier", "string", default="legacy")
    # VERSION AS OF before the add: no such column
    old = t.read_snapshot(as_of=1)
    assert "tier" not in old.columns
    # compaction materializes the default into file bytes + clears entry
    t.compact()
    assert t.timeline.latest().column_defaults == {}
    snap = {r["id"]: r["tier"] for r in t.read_snapshot().collect()}
    assert set(snap.values()) == {"legacy"}


def test_add_column_int_default_and_point_lookup(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", files_per_partition=4)
    t.add_column("score", "bigint", default=7)
    row = t.read_keys(["k13"]).collect()[0]
    assert row["score"] == 7
    got = {r["id"]: r["score"] for r in t.read_snapshot().collect()}
    assert all(v == 7 for v in got.values())


def test_add_column_validation(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    with pytest.raises(ValueError, match="already exists"):
        t.add_column("v", "double")
    t.add_column("x", "int")
    t.drop_column("x")
    with pytest.raises(ValueError, match="dropped column"):
        t.add_column("x", "int")
    with pytest.raises(ValueError, match="JSON scalar"):
        t.add_column("y", "string", default={"a": 1})


def test_drop_column_clears_its_default(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.add_column("tier", "string", default="legacy")
    t.drop_column("tier")
    assert t.timeline.latest().column_defaults == {}
    assert "tier" not in t.read_snapshot().columns


def test_ghs_table_reads_serve_defaults(spark, tmp_path):
    """Both datasource tiers agree with the engine read: pre-add files
    fill the default, post-add explicit NULL stays NULL."""
    DS.register(spark)
    t = _mk(spark, tmp_path / "t", files_per_partition=4)
    t.add_column("tier", "string", default="legacy")
    t.upsert(_rows(spark, [("k00", 0.0, 2, "gold"), ("k01", 1.0, 2, None)],
                   "id string, v double, seq int, tier string"))
    want = {r["id"]: r["tier"] for r in t.read_snapshot().collect()}
    # batch tier
    df = spark.read.format("ghs_table").option("path", str(t.root)).load()
    got = {r["id"]: r["tier"] for r in df.collect()}
    assert got == want and got["k05"] == "legacy" and got["k01"] is None
    # partitioned stream tier (full-history drain = one version per key)
    out = tmp_path / "out"
    q = (spark.readStream.format("ghs_table")
         .option("path", str(t.root)).load()
         .writeStream.format("parquet").option("path", str(out))
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    srows = {r["id"]: r["tier"]
             for r in spark.read.parquet(str(out)).collect()}
    assert srows == want
    # simple stream tier
    out2 = tmp_path / "out2"
    q = (spark.readStream.format("ghs_table")
         .option("path", str(t.root))
         .option("simpleStream", "true").load()
         .writeStream.format("parquet").option("path", str(out2))
         .option("checkpointLocation", str(tmp_path / "ck2"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    s2 = {r["id"]: r["tier"]
          for r in spark.read.parquet(str(out2)).collect()}
    assert s2 == want
