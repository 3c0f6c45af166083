"""Spark 4 Python Data Source (`format("ghs_table")`): batch reads match
read_snapshot, asOf time travel, stats-pruned pushdown stays correct, and
the change-feed stream tails the commit timeline."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from glue_hudi_spark.sources import datasource as DS
from glue_hudi_spark.storage.native import NativeTable


def _rows(spark, rows):
    return spark.createDataFrame([Row(**r) for r in rows])


@pytest.fixture()
def table(spark, tmp_path):
    DS.register(spark)
    t = NativeTable(spark, tmp_path / "t", record_keys=["id"],
                    precombine="seq", stats_cols=["v"],
                    files_per_partition=4)
    t.bulk_insert(_rows(spark, [
        dict(id=f"k{i:03d}", v=float(i), seq=1) for i in range(100)]))
    t.upsert(_rows(spark, [dict(id="k000", v=999.0, seq=2)]))
    return t


def _fmt(spark, t, **opts):
    r = spark.read.format("ghs_table").option("path", str(t.root))
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_batch_read_matches_snapshot(spark, table):
    got = {r["id"]: r["v"] for r in _fmt(spark, table).collect()}
    want = {r["id"]: r["v"] for r in table.read_snapshot().collect()}
    assert got == want and len(got) == 100 and got["k000"] == 999.0
    # meta columns excluded by default, included on request
    assert set(_fmt(spark, table).columns) == {"id", "v", "seq"}
    assert "_ghs_commit_time" in _fmt(spark, table, withMeta="true").columns


def test_as_of_reads_old_snapshot(spark, table):
    old = _fmt(spark, table, asOf="1")
    assert {r["v"] for r in old.filter("id = 'k000'").collect()} == {0.0}


def test_pushdown_prunes_files_and_stays_correct(spark, table):
    df = _fmt(spark, table).filter("v >= 90.0 and v < 95.0")
    got = sorted(r["id"] for r in df.collect())
    assert got == [f"k{i:03d}" for i in range(90, 95)]


def test_stream_tails_commits(spark, table, tmp_path):
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"

    def run_available():
        q = (
            spark.readStream.format("ghs_table")
            .option("path", str(table.root))
            .load()
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_available()   # full history (commits 1-2): latest row versions
    first = spark.read.parquet(str(out)).count()
    assert first == 100   # CoW incremental semantics: one version per key

    table.upsert(_rows(spark, [dict(id="k500", v=5.0, seq=1)]))
    run_available()   # tail: only the new commit's rows
    rows = spark.read.parquet(str(out)).collect()
    assert len(rows) == first + 1
    assert {r["id"] for r in rows} >= {"k000", "k500"}


def test_stream_starting_commit_skips_history(spark, table, tmp_path):
    q = (
        spark.readStream.format("ghs_table")
        .option("path", str(table.root))
        .option("startingCommit", "2")
        .load()
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out2"))
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    import os
    files = [f for f in os.listdir(tmp_path / "out2")
             if f.endswith(".parquet")]
    n = spark.read.parquet(str(tmp_path / "out2")).count() if files else 0
    assert n == 0   # nothing after commit 2 yet


def test_mor_with_deltas_rejected(spark, tmp_path):
    DS.register(spark)
    t = NativeTable(spark, tmp_path / "m", record_keys=["id"],
                    precombine="seq", storage_type="mor", compact_every=100)
    t.bulk_insert(_rows(spark, [dict(id="a", v=1.0, seq=1)]))
    t.upsert(_rows(spark, [dict(id="a", v=2.0, seq=2)]))   # pending delta
    with pytest.raises(Exception, match="uncompacted MoR deltas"):
        spark.read.format("ghs_table").option(
            "path", str(t.root)).load().collect()
    t.compact()
    got = spark.read.format("ghs_table").option(
        "path", str(t.root)).load().collect()
    assert got[0]["v"] == 2.0


def test_stream_emit_deletes_requires_with_meta(spark, tmp_path):
    from glue_hudi_spark.sources.datasource import GhsChangeFeedStreamReader
    from pyspark.sql.types import StructType, StructField, StringType

    import pytest as _pytest

    schema = StructType([StructField("id", StringType())])  # no meta cols
    with _pytest.raises(ValueError, match="withMeta"):
        GhsChangeFeedStreamReader(
            {"path": str(tmp_path), "emitdeletes": "true"}, schema)


def test_stream_tombstones_unrecoverable_after_clean(spark, tmp_path):
    """emitDeletes is retention-bounded like any CDC log: a range commit
    whose manifest was cleaned must raise, not silently lose deletes."""
    from glue_hudi_spark.sources.datasource import GhsChangeFeedStreamReader
    from glue_hudi_spark.storage.native import NativeTable

    import pytest as _pytest

    t = NativeTable(spark, tmp_path / "t", record_keys=["id"],
                    precombine="s", retain_commits=2,
                    change_feed_deletes=True)
    t.bulk_insert(spark.createDataFrame([("a", 1)], "id string, s int"))
    for i in range(4):  # roll the retention window past commit 1
        t.upsert(spark.createDataFrame([(f"k{i}", 1)], "id string, s int"))
    reader = GhsChangeFeedStreamReader(
        {"path": str(t.root), "emitdeletes": "true"},
        spark.read.format("ghs_table").option("path", str(t.root))
        .option("withMeta", "true").load().schema)
    with _pytest.raises(ValueError, match="no longer retained"):
        reader._tombstone_rows(0, t.timeline.latest().commit_id)


def test_stream_serves_uncompacted_mor_deltas(spark, tmp_path):
    """A pending MoR delta file IS its commit's change set: the stream
    drains upserts (and, with emitDeletes, delete markers) without
    compaction; compaction later must not re-serve the same rows."""
    DS.register(spark)
    t = NativeTable(spark, tmp_path / "m", record_keys=["id"],
                    precombine="seq", storage_type="mor", compact_every=100,
                    change_feed_deletes=True)
    t.bulk_insert(_rows(spark, [dict(id=f"k{i}", v=1.0, seq=1)
                                for i in range(4)]))
    t.upsert(_rows(spark, [dict(id="k0", v=9.0, seq=2)]))   # pending delta
    t.delete(_rows(spark, [dict(id="k1", v=0.0, seq=2)]).select("id"))
    out = tmp_path / "out"

    def drain():
        q = (spark.readStream.format("ghs_table")
             .option("path", str(t.root))
             .option("withMeta", "true").option("emitDeletes", "true")
             .load()
             .writeStream.format("parquet")
             .option("path", str(out))
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .trigger(availableNow=True).start())
        q.awaitTermination()

    drain()
    rows = spark.read.parquet(str(out)).collect()
    by_op = {}
    for r in rows:
        by_op.setdefault(r["_ghs_delta_op"], []).append(r)
    assert len(by_op.get("u", [])) == 5          # 4 base + 1 delta upsert
    assert {r["id"] for r in by_op["d"]} >= {"k1"}   # delta marker and/or
    # tombstone row both say delete-k1; dedup is the consumer's contract
    assert all(r["id"] == "k1" for r in by_op["d"])
    # compaction preserves stamps: nothing new to drain
    t.compact()
    n_before = spark.read.parquet(str(out)).count()
    drain()
    assert spark.read.parquet(str(out)).count() == n_before


def test_replication_from_uncompacted_mor_source(spark, tmp_path):
    """End to end: an MoR source with pending deltas replicates —
    upserts and deletes arrive in-stream, replica equals source."""
    from glue_hudi_spark.streaming.replicate import TableReplicationStream

    src = NativeTable(spark, tmp_path / "src", record_keys=["id"],
                      precombine="seq", storage_type="mor",
                      compact_every=100, change_feed_deletes=True)
    src.bulk_insert(_rows(spark, [dict(id=f"k{i}", v=float(i), seq=1)
                                  for i in range(6)]))
    dest = NativeTable(spark, tmp_path / "dest", record_keys=["id"],
                       precombine="seq")
    rep = TableReplicationStream(spark, src.root, dest, tmp_path / "ck")
    rep.run_available()
    src.upsert(_rows(spark, [dict(id="k2", v=77.0, seq=2)]))
    src.delete(_rows(spark, [dict(id="k4", v=0.0, seq=2)]).select("id"))
    rep.run_available()                    # deltas still pending upstream
    got = {(r["id"], r["v"]) for r in dest.read_snapshot().collect()}
    want = {(r["id"], r["v"]) for r in src.read_snapshot().collect()}
    assert got == want and ("k4", 4.0) not in got and ("k2", 77.0) in got


def test_batch_read_tag_and_branch(spark, table):
    table.create_tag("v1")
    b = table.create_branch("dev")
    b.upsert(_rows(spark, [dict(id="k001", v=-1.0, seq=3)]))
    # branch read sees the branch head; main read doesn't
    bdf = _fmt(spark, table, branch="dev")
    assert {r["v"] for r in bdf.filter("id = 'k001'").collect()} == {-1.0}
    assert {r["v"] for r in _fmt(spark, table)
            .filter("id = 'k001'").collect()} == {1.0}
    # tag read is the frozen pre-churn snapshot, even after more writes
    table.upsert(_rows(spark, [dict(id="k002", v=-2.0, seq=3)]))
    tdf = _fmt(spark, table, tag="v1")
    assert {r["v"] for r in tdf.filter("id = 'k002'").collect()} == {2.0}
    # tag is a complete pin: combining with branch/asOf is an error
    with pytest.raises(Exception, match="complete version pin"):
        _fmt(spark, table, tag="v1", branch="dev").collect()


def test_stream_tails_branch_feed(spark, table, tmp_path):
    b = table.create_branch("stage")
    b.upsert(_rows(spark, [dict(id="k900", v=900.0, seq=1)]))
    start = table.timeline.latest().commit_id  # skip shared history
    sdf = (spark.readStream.format("ghs_table")
           .option("path", str(table.root))
           .option("branch", "stage")
           .option("startingCommit", str(start))
           .load())
    out = tmp_path / "out"
    q = (sdf.writeStream.format("parquet")
         .option("path", str(out))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r["id"]: r["v"] for r in spark.read.parquet(str(out)).collect()}
    # ONLY the branch's own commit flows — not main's history
    assert got == {"k900": 900.0}


def test_batch_read_with_pushdown_conf_off(spark, table):
    """Spark 4.1 defaults spark.sql.python.filterPushdown.enabled=false
    and hard-errors on readers that implement pushFilters — the r08
    driver red. A foreign session with the conf off (or unset) must
    still batch-read ghs_table: the data source auto-selects the
    pushdown-less reader tier by sniffing the planning worker's
    enable_pushdown flag. Correctness is identical (Spark re-evaluates
    all filters); only the manifest stats prune is skipped."""
    k = "spark.sql.python.filterPushdown.enabled"
    prev = spark.conf.get(k)
    spark.conf.set(k, "false")
    try:
        df = _fmt(spark, table).filter("v >= 90.0 and v < 95.0")
        got = sorted(r["id"] for r in df.collect())
        assert got == [f"k{i:03d}" for i in range(90, 95)]
        # full unfiltered read works too
        assert _fmt(spark, table).count() == 100
        # the explicit manual override keeps working with the conf off
        r = (spark.read.format("ghs_table")
             .option("path", str(table.root))
             .option("pushdown", "false").load())
        assert r.count() == 100
    finally:
        spark.conf.set(k, prev)


def test_pushdown_option_false_with_conf_on(spark, table):
    """option('pushdown','false') forces the no-pushdown tier even when
    the session conf is on — same rows, no stats prune."""
    df = (spark.read.format("ghs_table")
          .option("path", str(table.root))
          .option("pushdown", "false").load()
          .filter("v >= 90.0 and v < 95.0"))
    assert sorted(r["id"] for r in df.collect()) == [
        f"k{i:03d}" for i in range(90, 95)]


def test_stream_uses_partitioned_reader_by_default(spark, table, tmp_path,
                                                   monkeypatch):
    """The default streaming tier is the partition-based reader
    (executor-side pyarrow file reads) — poison the driver-side simple
    reader to prove it is never constructed, then drain a stream."""
    def boom(self, options, schema):
        raise AssertionError(
            "driver-side SimpleDataSourceStreamReader constructed — the "
            "default tier must be the partitioned reader")

    monkeypatch.setattr(DS.GhsChangeFeedStreamReader, "__init__", boom)
    out = tmp_path / "pout"
    q = (spark.readStream.format("ghs_table")
         .option("path", str(table.root))
         .load()
         .writeStream.format("parquet")
         .option("path", str(out))
         .option("checkpointLocation", str(tmp_path / "pckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    assert spark.read.parquet(str(out)).count() == 100


def test_stream_simple_tier_on_request(spark, table, tmp_path):
    """option('simpleStream','true') falls back to the driver-side
    SimpleDataSourceStreamReader tier — same rows."""
    out = tmp_path / "sout"
    q = (spark.readStream.format("ghs_table")
         .option("path", str(table.root))
         .option("simpleStream", "true")
         .load()
         .writeStream.format("parquet")
         .option("path", str(out))
         .option("checkpointLocation", str(tmp_path / "sckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    assert spark.read.parquet(str(out)).count() == 100


def test_partitioned_stream_plans_one_slice_per_changed_file(spark, table):
    """Micro-batch planning is O(files changed in the window), never the
    live file set: a one-key upsert window plans exactly the files of the
    commits after the offset."""
    from glue_hudi_spark.storage.native import file_dir_commit

    reader = DS.GhsChangeFeedPartitionedStreamReader(
        {"path": str(table.root)},
        spark.read.format("ghs_table").option("path", str(table.root))
        .load().schema)
    latest = table.timeline.latest()
    # window (1, latest]: only commit 2's files (the single-key upsert)
    parts = reader.partitions({"commit_id": 1},
                              {"commit_id": latest.commit_id})
    assert all(file_dir_commit(p.rel) > 1 for p in parts)
    assert 0 < len(parts) < len(latest.files)
    # empty window plans nothing
    assert reader.partitions({"commit_id": latest.commit_id},
                             {"commit_id": latest.commit_id}) == []


def test_partitioned_stream_read_is_arrow_batched(spark, table):
    """read() yields pyarrow RecordBatches (the executor fast path), with
    only rows stamped inside the window."""
    import pyarrow as pa

    reader = DS.GhsChangeFeedPartitionedStreamReader(
        {"path": str(table.root)},
        spark.read.format("ghs_table").option("path", str(table.root))
        .load().schema)
    latest = table.timeline.latest()
    parts = reader.partitions({"commit_id": 1},
                              {"commit_id": latest.commit_id})
    rows = []
    for p in parts:
        for b in reader.read(p):
            assert isinstance(b, pa.RecordBatch)
            rows.extend(b.to_pylist())
    assert {r["id"] for r in rows} == {"k000"}  # the upsert commit only
    assert rows[0]["v"] == 999.0


def test_inconclusive_pushdown_sniff_fails_safe(spark, table):
    """Direct construction (no planning worker on the stack): the sniff
    returns None and reader() must FAIL SAFE to the no-pushdown tier —
    the tier that works under EITHER conf value (r9 advice: a future
    pyspark refactor of the planning worker must degrade to 'no stats
    prune', never to the DATA_SOURCE_PUSHDOWN_DISABLED hard error)."""
    from glue_hudi_spark.sources.datasource import (
        GhsTableDataSource, GhsTableNoPushdownReader, GhsTableReader,
        _planner_pushdown_enabled)

    assert _planner_pushdown_enabled() is None  # not in a planning worker
    ds = GhsTableDataSource({"path": str(table.root)})
    r = ds.reader(ds.schema())
    assert isinstance(r, GhsTableNoPushdownReader)
    assert not isinstance(r, GhsTableReader)
