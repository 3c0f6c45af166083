"""Global index semantics (Hudi GLOBAL_BLOOM / record-level-index class,
``update.partition.path=true``): record keys are unique table-wide, and
an upsert carrying a NEW partition value RELOCATES the record instead of
duplicating it under the new dir.

Scale contract: skipping the partition-pruning level must not mean
"rewrite the world" — the per-file key-range (and bloom) indexes still
bound the affected set, exactly how Hudi's global bloom keeps global
uniqueness affordable at table scale.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from glue_hudi_spark.storage.native import NativeTable


def _rows(spark, rows):
    return spark.createDataFrame(rows)


def _seed(spark, path, global_index, **kw):
    t = NativeTable(spark, path, record_keys=["id"], precombine="seq",
                    partition_keys=["region"], files_per_partition=2,
                    global_index=global_index, **kw)
    t.bulk_insert(_rows(spark, [
        dict(id=f"k{i:03d}", region=("EU" if i % 2 else "US"),
             v=float(i), seq=1)
        for i in range(40)
    ]))
    return t


def test_global_upsert_relocates_record(spark, tmp_path):
    t = _seed(spark, tmp_path / "t", global_index=True)
    # k004 lives in US; move it to EU with a new value
    t.upsert(_rows(spark, [dict(id="k004", region="EU", v=999.0, seq=2)]))
    got = t.read_snapshot().filter("id = 'k004'").collect()
    assert len(got) == 1  # relocated, NOT duplicated
    assert got[0]["region"] == "EU" and got[0]["v"] == 999.0
    assert t.read_snapshot().count() == 40


def test_nonglobal_upsert_duplicates_across_partitions(spark, tmp_path):
    # the Hudi DEFAULT (identity = (partition, key)), pinned as the
    # documented contrast: same op on a non-global table duplicates
    t = _seed(spark, tmp_path / "t", global_index=False)
    t.upsert(_rows(spark, [dict(id="k004", region="EU", v=999.0, seq=2)]))
    got = t.read_snapshot().filter("id = 'k004'").collect()
    assert len(got) == 2
    assert {r["region"] for r in got} == {"EU", "US"}


def test_global_upsert_still_prunes_by_key_range(spark, tmp_path):
    t = _seed(spark, tmp_path / "t", global_index=True)
    before = len(t.timeline.latest().files)
    c = t.upsert(_rows(spark, [dict(id="k000", region="EU", v=1.0, seq=2)]))
    # partition pruning is off, but the key-range index still bounds
    # the rewrite: one narrow key must not rewrite all partitions' files
    assert c.stats["files_rewritten"] < before
    assert c.stats["files_carried"] > 0
    assert t.read_snapshot().filter("id = 'k000'").count() == 1


def test_global_merge_cdc_relocation(spark, tmp_path):
    t = _seed(spark, tmp_path / "t", global_index=True)
    batch = _rows(spark, [
        dict(id="k001", region="US", v=100.0, seq=2, op="U"),  # EU → US
        dict(id="k777", region="EU", v=7.0, seq=2, op="I"),
        dict(id="k002", region="ZZ", v=0.0, seq=2, op="D"),    # key-only hit
    ])
    t.merge(batch)
    snap = t.read_snapshot()
    assert snap.count() == 40  # +1 insert, -1 delete
    moved = snap.filter("id = 'k001'").collect()
    assert len(moved) == 1 and moved[0]["region"] == "US"
    # the delete found the record even under a WRONG partition value
    assert snap.filter("id = 'k002'").count() == 0


def test_global_precombine_across_partitions(spark, tmp_path):
    t = _seed(spark, tmp_path / "t", global_index=True)
    # two versions of one key in ONE batch, different partitions:
    # precombine (max seq) decides the surviving location
    t.upsert(_rows(spark, [
        dict(id="k006", region="EU", v=1.0, seq=2),
        dict(id="k006", region="US", v=2.0, seq=3),
    ]))
    got = t.read_snapshot().filter("id = 'k006'").collect()
    assert len(got) == 1
    assert got[0]["region"] == "US" and got[0]["seq"] == 3


def test_global_index_with_bloom_pruning(spark, tmp_path):
    t = _seed(spark, tmp_path / "bt", global_index=True, bloom_index=True)
    c = t.upsert(_rows(spark, [dict(id="k013", region="US", v=-1.0, seq=2)]))
    got = t.read_snapshot().filter("id = 'k013'").collect()
    assert len(got) == 1 and got[0]["region"] == "US"
    assert c.stats["files_carried"] > 0


def test_global_semantics_on_mor_through_compaction(spark, tmp_path):
    # MoR is key-global by construction (_rt merges deltas by record key
    # and compact() materializes through that same merge) — a partition-
    # moving delta must survive compaction as ONE relocated record
    t = NativeTable(spark, tmp_path / "m", record_keys=["id"],
                    precombine="seq", partition_keys=["region"],
                    storage_type="mor", files_per_partition=2,
                    compact_every=100)
    t.bulk_insert(_rows(spark, [
        dict(id=f"k{i:03d}", region=("EU" if i % 2 else "US"),
             v=float(i), seq=1) for i in range(20)]))
    t.upsert(_rows(spark, [dict(id="k004", region="EU", v=999.0, seq=2)]))
    got = t.read_snapshot().filter("id = 'k004'").collect()
    assert len(got) == 1 and got[0]["region"] == "EU"  # _rt view relocates
    t.compact()
    got = t.read_snapshot().filter("id = 'k004'").collect()
    assert len(got) == 1 and got[0]["region"] == "EU"
    assert t.read_snapshot().count() == 20
