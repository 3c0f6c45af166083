"""Delta-style TYPE WIDENING on merge: a batch with wider numeric types
promotes the table schema metadata-only (zero rewrites of carried
files — Spark 4's parquet scan upcasts int32 files under a long read
schema), narrower batches cast up, incompatible changes raise.

No reference counterpart (Hudi delegates schema evolution to Avro
resolution inside the jars; processData.py never touches it) — part of
the §2.7 table-service extension surface."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from glue_hudi_spark.sources import datasource as DS
from glue_hudi_spark.storage.native import NativeTable, _widen_type
from pyspark.sql import types as T


def _rows(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_widen_type_lattice():
    i, l = T.IntegerType(), T.LongType()
    f, d = T.FloatType(), T.DoubleType()
    assert _widen_type(i, l) == l and _widen_type(l, i) == l
    assert _widen_type(T.ByteType(), T.ShortType()) == T.ShortType()
    assert _widen_type(f, d) == d and _widen_type(d, f) == d
    assert _widen_type(T.DecimalType(5, 2), T.DecimalType(10, 2)) \
        == T.DecimalType(10, 2)
    # scale-increasing widens (Delta rule): neither integer digits nor
    # scale may shrink; the widened type takes max of each
    assert _widen_type(T.DecimalType(10, 2), T.DecimalType(14, 4)) \
        == T.DecimalType(14, 4)
    assert _widen_type(T.DecimalType(5, 2), T.DecimalType(10, 3)) \
        == T.DecimalType(10, 3)  # idigits 3→7, scale 2→3: both grow
    # sides that each win one dimension meet at a type wider than both
    assert _widen_type(T.DecimalType(12, 2), T.DecimalType(8, 6)) \
        == T.DecimalType(16, 6)  # idigits max(10,2)=10 + scale 6
    # precision cap: a meet beyond decimal(38) is not a legal widen
    assert _widen_type(T.DecimalType(38, 0), T.DecimalType(10, 6)) is None
    assert _widen_type(T.StringType(), l) is None
    assert _widen_type(i, T.StringType()) is None
    assert _widen_type(i, d) is None  # cross-family: explicit cast only


def test_cow_upsert_widens_int_to_long(spark, tmp_path):
    t = NativeTable(spark, tmp_path / "t", record_keys=["id"],
                    precombine="seq")
    t.bulk_insert(_rows(spark, [(f"k{i}", i, 1) for i in range(20)],
                        "id string, v int, seq int"))
    # wider batch: v arrives as LONG with a value outside int range
    t.upsert(_rows(spark, [("k0", 5_000_000_000, 2)],
                   "id string, v long, seq int"))
    snap = t.read_snapshot()
    assert dict(snap.dtypes)["v"] == "bigint"
    got = {r["id"]: r["v"] for r in snap.collect()}
    assert got["k0"] == 5_000_000_000 and got["k7"] == 7 and len(got) == 20


def test_cow_widening_leaves_carried_files_unrewritten(spark, tmp_path):
    """The promotion is metadata-only: files the merge doesn't touch are
    carried (still int32 parquet) and upcast at the scan."""
    t = NativeTable(spark, tmp_path / "t", record_keys=["id"],
                    precombine="seq", stats_cols=["v"],
                    files_per_partition=4)
    t.bulk_insert(_rows(spark, [(f"k{i:03d}", i, 1) for i in range(100)],
                        "id string, v int, seq int"))
    c = t.upsert(_rows(spark, [("k000", 5_000_000_000, 2)],
                       "id string, v long, seq int"))
    assert c.stats["files_carried"] > 0  # narrow merge: most files carried
    import pyarrow.parquet as pq
    carried = [f for f in c.files if "/data/00000000000000000001/" in f
               or f.split("/")[1] == "00000000000000000001"]
    assert carried, c.files
    # physically still int32 in the carried file
    sch = pq.read_schema(str(t.root / carried[0]))
    assert str(sch.field("v").type) == "int32"
    # but the snapshot reads them as long, values intact
    got = {r["id"]: r["v"] for r in t.read_snapshot().collect()}
    assert got["k099"] == 99 and got["k000"] == 5_000_000_000


def test_narrower_batch_casts_up_not_errors(spark, tmp_path):
    t = NativeTable(spark, tmp_path / "t", record_keys=["id"],
                    precombine="seq")
    t.bulk_insert(_rows(spark, [("a", 1.5, 1)],
                        "id string, v double, seq int"))
    t.upsert(_rows(spark, [("b", 2.25, 1)], "id string, v float, seq int"))
    snap = t.read_snapshot()
    assert dict(snap.dtypes)["v"] == "double"
    assert {r["v"] for r in snap.collect()} == {1.5, 2.25}


def test_incompatible_type_change_raises(spark, tmp_path):
    t = NativeTable(spark, tmp_path / "t", record_keys=["id"],
                    precombine="seq")
    t.bulk_insert(_rows(spark, [("a", 1, 1)], "id string, v int, seq int"))
    with pytest.raises(ValueError, match="incompatible type change"):
        t.upsert(_rows(spark, [("a", "oops", 2)],
                       "id string, v string, seq int"))


def test_mor_delta_widening_through_compaction(spark, tmp_path):
    t = NativeTable(spark, tmp_path / "m", record_keys=["id"],
                    precombine="seq", storage_type="mor",
                    compact_every=100)
    t.bulk_insert(_rows(spark, [(f"k{i}", i, 1) for i in range(8)],
                        "id string, v int, seq int"))
    t.upsert(_rows(spark, [("k1", 6_000_000_000, 2)],
                   "id string, v long, seq int"))   # pending delta, wide
    rt = t.read_snapshot()                          # _rt merge pre-compact
    assert dict(rt.dtypes)["v"] == "bigint"
    got = {r["id"]: r["v"] for r in rt.collect()}
    assert got["k1"] == 6_000_000_000 and got["k5"] == 5
    t.compact()
    got2 = {r["id"]: r["v"] for r in t.read_snapshot().collect()}
    assert got2 == got


def test_ghs_table_datasource_reads_widened_table(spark, tmp_path):
    """The pyarrow read path mirrors the scan upcast: carried int32
    files and new int64 files serve one long column."""
    DS.register(spark)
    t = NativeTable(spark, tmp_path / "t", record_keys=["id"],
                    precombine="seq", files_per_partition=4,
                    change_feed_deletes=True)
    t.bulk_insert(_rows(spark, [(f"k{i:02d}", i, 1) for i in range(40)],
                        "id string, v int, seq int"))
    t.upsert(_rows(spark, [("k00", 5_000_000_000, 2)],
                   "id string, v long, seq int"))
    df = spark.read.format("ghs_table").option("path", str(t.root)).load()
    assert dict(df.dtypes)["v"] == "bigint"
    got = {r["id"]: r["v"] for r in df.collect()}
    assert got["k00"] == 5_000_000_000 and got["k39"] == 39 and len(got) == 40
    # and the change-feed stream serves widened rows too
    out = tmp_path / "out"
    q = (spark.readStream.format("ghs_table")
         .option("path", str(t.root)).load()
         .writeStream.format("parquet").option("path", str(out))
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    srows = {r["id"]: r["v"] for r in spark.read.parquet(str(out)).collect()}
    assert srows["k00"] == 5_000_000_000 and len(srows) == 40


def test_partial_update_with_widening(spark, tmp_path):
    t = NativeTable(spark, tmp_path / "t", record_keys=["id"],
                    precombine="seq")
    t.bulk_insert(_rows(spark, [("a", 1, 10, 1)],
                        "id string, v int, w int, seq int"))
    t.upsert(_rows(spark, [("a", 7_000_000_000, None, 2)],
                   "id string, v long, w int, seq int"), partial=True)
    row = t.read_snapshot().collect()[0]
    assert row["v"] == 7_000_000_000 and row["w"] == 10


def test_concurrent_widening_is_an_occ_schema_conflict(spark, tmp_path):
    """A widening commit changes schema_json, so an OCC loser racing it
    must get the schema-conflict error (never a silent rebase across a
    type promotion its plan didn't see)."""
    from glue_hudi_spark.storage.commits import ConcurrentWriteError

    path = tmp_path / "t"
    t = NativeTable(spark, path, record_keys=["id"], precombine="seq")
    t.bulk_insert(_rows(spark, [(f"k{i}", i, 1) for i in range(10)],
                        "id string, v int, seq int"))
    winner = NativeTable(spark, path, record_keys=["id"], precombine="seq")
    loser = NativeTable(spark, path, record_keys=["id"], precombine="seq")

    # the winner WIDENS v to long inside the loser's publish window
    # (same deterministic race rig as test_occ_rebase)
    orig = loser.timeline.publish
    fired = []

    def racing_publish(commit):
        if not fired:
            fired.append(True)
            winner.upsert(_rows(spark, [("k9", 5_000_000_000, 2)],
                                "id string, v long, seq int"))
        return orig(commit)

    loser.timeline.publish = racing_publish
    with pytest.raises(ConcurrentWriteError, match="schema"):
        loser.upsert(_rows(spark, [("k1", 7, 2)],
                           "id string, v int, seq int"))
    assert fired


# ---- round-10: decimal SCALE widening (Delta parity) ----

def test_decimal_scale_widening_cow(spark, tmp_path):
    """decimal(10,2) table + decimal(14,4) batch: metadata-only
    promotion; carried files upcast at the scan (probed against Spark
    4's vectorized reader), values rescale losslessly."""
    from decimal import Decimal

    t = NativeTable(spark, tmp_path / "t", record_keys=["id"],
                    precombine="seq", files_per_partition=4)
    t.bulk_insert(_rows(
        spark, [(f"k{i:02d}", Decimal(f"{i}.25"), 1) for i in range(40)],
        "id string, amt decimal(10,2), seq int"))
    before = set(t.timeline.latest().files)
    t.upsert(_rows(spark, [("k00", Decimal("7.1234"), 2)],
                   "id string, amt decimal(14,4), seq int"))
    after = t.timeline.latest()
    assert dict(t.read_snapshot().dtypes)["amt"] == "decimal(14,4)"
    # carried pre-widen files were NOT rewritten
    assert len(before & set(after.files)) >= 3
    got = {r["id"]: r["amt"] for r in t.read_snapshot().collect()}
    assert got["k00"] == Decimal("7.1234")
    assert got["k05"] == Decimal("5.2500")


def test_decimal_two_sided_meet(spark, tmp_path):
    """Table decimal(12,2) vs batch decimal(8,6): each wins one
    dimension — the published schema is the meet, decimal(16,6),
    wider than BOTH sides; both old and new values rescale."""
    from decimal import Decimal

    t = NativeTable(spark, tmp_path / "t", record_keys=["id"],
                    precombine="seq")
    t.bulk_insert(_rows(spark, [("a", Decimal("1234567890.12"), 1)],
                        "id string, amt decimal(12,2), seq int"))
    t.upsert(_rows(spark, [("b", Decimal("1.123456"), 1)],
                   "id string, amt decimal(8,6), seq int"))
    assert dict(t.read_snapshot().dtypes)["amt"] == "decimal(16,6)"
    got = {r["id"]: r["amt"] for r in t.read_snapshot().collect()}
    assert got["a"] == Decimal("1234567890.120000")
    assert got["b"] == Decimal("1.123456")


def test_decimal_scale_widening_mor_and_partial(spark, tmp_path):
    from decimal import Decimal

    m = NativeTable(spark, tmp_path / "m", record_keys=["id"],
                    precombine="seq", storage_type="mor",
                    compact_every=100)
    m.bulk_insert(_rows(spark, [(f"k{i}", Decimal(f"{i}.50"), 1)
                                for i in range(8)],
                        "id string, amt decimal(10,2), seq int"))
    m.upsert(_rows(spark, [("k1", Decimal("9.8765"), 2)],
                   "id string, amt decimal(14,4), seq int"))
    rt = m.read_snapshot()
    assert dict(rt.dtypes)["amt"] == "decimal(14,4)"
    got = {r["id"]: r["amt"] for r in rt.collect()}
    assert got["k1"] == Decimal("9.8765")
    assert got["k5"] == Decimal("5.5000")
    m.compact()
    assert {r["id"]: r["amt"] for r in m.read_snapshot().collect()} == got
    # partial update rides the same promotion
    p = NativeTable(spark, tmp_path / "p", record_keys=["id"],
                    precombine="seq")
    p.bulk_insert(_rows(spark, [("a", Decimal("1.25"), 10, 1)],
                        "id string, amt decimal(10,2), w int, seq int"))
    p.upsert(_rows(spark, [("a", Decimal("2.0001"), None, 2)],
                   "id string, amt decimal(14,4), w int, seq int"),
             partial=True)
    row = p.read_snapshot().collect()[0]
    assert row["amt"] == Decimal("2.0001") and row["w"] == 10


def test_decimal_overflow_meet_raises(spark, tmp_path):
    from decimal import Decimal

    t = NativeTable(spark, tmp_path / "t", record_keys=["id"],
                    precombine="seq")
    t.bulk_insert(_rows(spark, [("a", Decimal("1"), 1)],
                        "id string, amt decimal(38,0), seq int"))
    with pytest.raises(ValueError, match="incompatible type change"):
        t.upsert(_rows(spark, [("a", Decimal("1.123456"), 2)],
                       "id string, amt decimal(10,6), seq int"))
