"""Continuous table→table replication: tail one NativeTable's commit
timeline, merge each batch of changed rows into another table.

The downstream-sync pattern the change feed exists for (a reporting copy,
a region replica, a redacted projection) — composed entirely from two
engine pieces: the ``ghs_table`` streaming source (offsets = commit ids,
CoW incremental semantics, deterministic replay from immutable manifests)
and the keyed ``upsert`` merge sink. Exactly-once lands the same way as
every other streaming sink here: the micro-batch id travels inside the
destination's commit stats, atomic with the data publish, so an
at-least-once foreachBatch replay is detected and skipped.

Deletes travel IN-STREAM when the SOURCE table opted into the change
feed (``NativeTable(change_feed_deletes=True)``, the Delta
``enableChangeDataFeed`` analogue — off by default): the feed runs with
``emitDeletes`` — every delete commit's tombstone keys (``_changes/``,
Delta-CDF-style) arrive
as ``_ghs_delta_op='d'`` rows, resolved per key against version rows by
commit time and applied in the SAME atomic merge as the batch's
upserts. ``sync_deletes_every`` is thereby demoted to a consistency
check (an anti-join of destination keys vs source keys — two
key-projection scans, no data columns); it exists for replicas of
tables written with ``change_feed_deletes=False`` and as an fsck-grade
invariant probe.

Scale shape: per micro-batch cost is the changed-row read (file-pruned by
the source's own manifest) + one keyed merge into the destination
(partition/key-range/bloom pruned like any upsert). The reconciliation
pass is the only table-sized step, and it ships key projections only.

100-TB seeding: the simple stream reader serves rows through the driver
(the documented low-throughput CDC tail), so do NOT replay a huge
table's FULL history through it — seed the replica out-of-band
(``NativeTable.clone_to`` on shared storage, or a bulk
``format("ghs_table")`` batch read → ``bulk_insert``, both
executor-parallel) and start the stream at the seed commit with
``starting_commit``; only the ongoing delta then flows through the tail.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import SparkSession, Window, functions as F

from glue_hudi_spark.sources import datasource as DS
from glue_hudi_spark.storage.native import (
    COMMIT_TIME_COL,
    DELTA_OP_COL,
    RECORD_KEY_COL,
    NativeTable,
)


class TableReplicationStream:
    """readStream(ghs_table src, emitDeletes) → foreachBatch(one atomic
    merge of the range's upserts and deletes into dest)."""

    def __init__(
        self,
        spark: SparkSession,
        src_path: str | Path,
        dest: NativeTable,
        checkpoint_dir: str | Path,
        starting_commit: int = 0,
        transform=None,
        sync_deletes_every: int | None = None,
    ):
        DS.register(spark)
        self.spark = spark
        self.src_path = str(src_path)
        self.dest = dest
        self.checkpoint_dir = str(checkpoint_dir)
        self.starting_commit = starting_commit
        # optional per-batch projection (redaction, column subset) —
        # applied before the merge, so the replica can be a narrowed or
        # masked view of the source
        self.transform = transform
        self.sync_deletes_every = sync_deletes_every
        # True/False after each sync_deletes(): did the checksum gate
        # let the cadence skip the key anti-join?
        self.last_sync_skipped_join: bool | None = None

    def _apply_batch(self, batch_df, batch_id: int) -> None:
        last = self.dest.last_stream_batch_id()
        replayed = last is not None and batch_id <= last
        if not replayed:  # replay = crash between commit and checkpoint
            marker = {"stream_batch_id": int(batch_id),
                      "replicated_from": self.src_path}
            if not batch_df.isEmpty():
                meta = [COMMIT_TIME_COL, RECORD_KEY_COL, DELTA_OP_COL]
                # a key can appear as several changes in one drained
                # range (update then delete, delete then reinsert):
                # the newest commit's row wins, THEN routes to its op
                w = Window.partitionBy(RECORD_KEY_COL).orderBy(
                    F.col(COMMIT_TIME_COL).desc())
                latest = (batch_df.withColumn(
                    "_ghs_rn", F.row_number().over(w))
                    .filter(F.col("_ghs_rn") == 1).drop("_ghs_rn"))
                ups = latest.filter(F.col(DELTA_OP_COL) != "d").drop(*meta)
                if self.transform is not None:
                    ups = self.transform(ups)
                dels = latest.filter(F.col(DELTA_OP_COL) == "d").drop(*meta)
                opb = ups.withColumn("_ghs_rep_op", F.lit("U")).unionByName(
                    dels.withColumn("_ghs_rep_op", F.lit("D")),
                    allowMissingColumns=True)
                # one atomic commit applies the range's upserts AND
                # deletes (CoW; MoR dest splits into its documented
                # delta pair) — the batch-id marker rides inside it
                self.dest.merge(opb, op_col="_ghs_rep_op",
                                extra_stats=marker)
        # The consistency-check cadence runs regardless of batch contents:
        # a delete-only commit on a change_feed_deletes=False source (no
        # tombstones) arrives as exactly an EMPTY micro-batch, so gating
        # this behind the data write would silently disable the fallback
        # propagation path. It also runs on replayed batches — the crashed
        # attempt may have died before its check fired, and sync_deletes
        # is idempotent (anti-join).
        if self.sync_deletes_every and (batch_id + 1) % self.sync_deletes_every == 0:
            self.sync_deletes()

    def sync_deletes(self) -> int:
        """Consistency check / fallback: destination keys absent from the
        source are deleted here. With ``emitDeletes`` tombstones flowing
        in-stream this finds nothing (assert that, if auditing); it
        remains the propagation path for sources written with
        ``change_feed_deletes=False``. Key projections only — no data
        columns cross the join.

        Cost shape (the recurring cadence tax at 100 TB): the key-set
        anti-join — two full key shuffles — runs ONLY when a cheap
        checksum gate says the key sets differ. The gate is one global
        (count, order-independent md5-word-sum) aggregate per side
        (``operators.recon.table_checksum`` with no group columns):
        map-side combined, a 1-row result each, zero shuffle of keys.
        A converged replica therefore pays two narrow-column scans and
        no join per cadence; ``last_sync_skipped_join`` records which
        path the most recent call took (auditability + the pytest pin).
        """
        from glue_hudi_spark.operators.recon import table_checksum

        src_keys = (
            self.spark.read.format("ghs_table")
            .option("path", self.src_path)
            .option("withMeta", "true")
            .load()
            .select(F.col(RECORD_KEY_COL).alias("_k"))
        )
        dest_keys = self.dest.read_snapshot(with_meta=True).select(
            F.col(RECORD_KEY_COL).alias("_k"), *self.dest.record_keys)
        cs = table_checksum(src_keys, [], ["_k"]).first()
        cd = table_checksum(dest_keys.select("_k"), [], ["_k"]).first()
        if (cs["n"], cs["ck"]) == (cd["n"], cd["ck"]):
            self.last_sync_skipped_join = True
            return 0
        self.last_sync_skipped_join = False
        gone = dest_keys.join(src_keys, on="_k", how="left_anti").drop("_k")
        if gone.isEmpty():
            return 0
        n = gone.count()
        self.dest.delete(gone)
        return n

    def run_available(self) -> None:
        """Drain all pending source commits (availableNow), then stop."""
        q = (
            self.spark.readStream.format("ghs_table")
            .option("path", self.src_path)
            .option("startingCommit", str(self.starting_commit))
            .option("withMeta", "true")
            .option("emitDeletes", "true")
            .load()
            .writeStream.foreachBatch(self._apply_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
