"""Metadata-only bootstrap: adopt existing parquet without rewriting;
all read/write paths work immediately on the adopted files."""

from __future__ import annotations

from pathlib import Path

import pytest

from glue_hudi_spark.storage.native import NativeTable


def _mk(spark, path, **kw):
    kw.setdefault("record_keys", ["id"])
    kw.setdefault("precombine", "seq")
    kw.setdefault("partition_keys", [])
    return NativeTable(spark, path, **kw)


def _src(spark, tmp_path, n=50):
    src = tmp_path / "existing"
    spark.createDataFrame(
        [(f"{i:03d}", float(i), 1) for i in range(n)],
        "id string, v double, seq int",
    ).coalesce(2).write.mode("overwrite").parquet(str(src))
    return src


def test_bootstrap_adopts_without_rewrite(spark, tmp_path):
    src = _src(spark, tmp_path)
    t = _mk(spark, tmp_path / "tbl")
    c = t.bootstrap(src)
    assert c.action == "bootstrap" and c.commit_id == 1
    assert c.stats["files_adopted"] >= 1
    # adopted files are hardlinks of the originals (same inode → no copy)
    adopted = [t.root / f for f in c.files]
    src_inodes = {p.stat().st_ino for p in Path(src).rglob("*.parquet")}
    assert all(p.stat().st_ino in src_inodes for p in adopted)
    snap = t.read_snapshot()
    assert snap.count() == 50
    assert set(snap.columns) == {"id", "v", "seq"}
    # meta available on demand despite the files carrying none
    meta = t.read_snapshot(with_meta=True)
    row = meta.filter("id = '007'").collect()[0]
    assert row["_ghs_record_key"] == "007"
    assert row["_ghs_commit_time"] == f"{1:020d}"


def test_bootstrap_then_upsert_and_lookup(spark, tmp_path):
    src = _src(spark, tmp_path)
    t = _mk(spark, tmp_path / "tbl")
    t.bootstrap(src)
    t.upsert(spark.createDataFrame(
        [("007", 777.0, 2), ("999", 1.0, 2)], "id string, v double, seq int"))
    snap = {r["id"]: r["v"] for r in t.read_snapshot().collect()}
    assert snap["007"] == 777.0 and snap["999"] == 1.0 and len(snap) == 51
    assert [r["v"] for r in t.read_keys(["003"]).collect()] == [3.0]
    # time travel back to the adopted state
    assert t.read_snapshot(as_of=1).count() == 50
    assert t.validate()["ok"]


def test_bootstrap_guards(spark, tmp_path):
    src = _src(spark, tmp_path)
    t = _mk(spark, tmp_path / "tbl")
    t.bootstrap(src)
    with pytest.raises(ValueError):
        t.bootstrap(src)  # already has commits
    tp = _mk(spark, tmp_path / "tblp", partition_keys=["v"])
    with pytest.raises(ValueError):
        tp.bootstrap(src)  # partitioned not supported
    te = _mk(spark, tmp_path / "tble")
    with pytest.raises(ValueError):
        te.bootstrap(tmp_path / "nothing_here")
