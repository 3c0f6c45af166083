"""The merge paths' folded emptiness/key-hull probe (_batch_probe).

Round-13 optimization: upsert/delete/merge on the CoW and DV routes
decide emptiness AND the record-key hull in ONE key-only aggregate,
instead of a take-1 ``isEmpty`` job plus a separate min/max aggregate —
each of which executed the batch derivation again. These tests pin the
probe's contract and the empty-batch no-op semantics of every public
entry point that now relies on it.
"""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from glue_hudi_spark.storage.native import NativeTable


def _mk(spark, path, **kw):
    kw.setdefault("record_keys", ["id"])
    kw.setdefault("precombine", "seq")
    kw.setdefault("partition_keys", [])
    return NativeTable(spark, path, **kw)


def _rows(spark, rows):
    return spark.createDataFrame([Row(**r) for r in rows])


def test_probe_count_and_hull(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    batch = _rows(spark, [
        dict(id=5, v="a", seq=1), dict(id=1, v="b", seq=1),
        dict(id=9, v="c", seq=1), dict(id=5, v="d", seq=2),
    ])
    n, hull = t._batch_probe(batch)
    assert n == 4  # counts every row, duplicates included
    assert hull == ("1", "9")  # record_key_expr casts to string


def test_probe_matches_batch_key_range(spark, tmp_table_dir):
    """The folded hull must equal the standalone _batch_key_range — the
    pruning decision is unchanged by the fold."""
    t = _mk(spark, tmp_table_dir)
    batch = _rows(spark, [dict(id=i * 3 % 7, v="x", seq=1)
                          for i in range(1, 7)])
    _, hull = t._batch_probe(batch)
    assert hull == t._batch_key_range(batch)


def test_probe_empty_and_missing_keys(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    empty = _rows(spark, [dict(id=1, v="x", seq=1)]).filter(F.lit(False))
    assert t._batch_probe(empty) == (0, None)
    # batch without the record-key column: probe declines, caller falls
    # back to the legacy isEmpty path
    keyless = _rows(spark, [dict(v="x", seq=1)])
    assert t._batch_probe(keyless) is None


def test_empty_batches_are_noops_on_live_table(spark, tmp_table_dir):
    """Empty upsert/delete/merge against a table WITH history publish
    nothing — the folded probe preserves the no-op contract on every
    rewritten route (CoW, DV, op-col merge)."""
    t = _mk(spark, tmp_table_dir)
    t.bulk_insert(_rows(spark, [dict(id=i, v="old", seq=1)
                                for i in range(4)]))
    empty = _rows(spark, [dict(id=1, v="x", seq=1)]).filter(F.lit(False))
    assert t.upsert(empty) is None
    assert t.delete(empty.select("id")) is None
    empty_ops = _rows(
        spark, [dict(id=1, v="x", seq=1, op="U")]).filter(F.lit(False))
    assert t.merge(empty_ops, op_col="op") is None
    assert len(t.timeline.history()) == 1  # bulk_insert only

    dv = _mk(spark, tmp_table_dir / "dv", deletion_vectors=True)
    dv.bulk_insert(_rows(spark, [dict(id=i, v="old", seq=1)
                                 for i in range(4)]))
    assert dv.delete(empty.select("id")) is None
    assert len(dv.timeline.history()) == 1


def test_upsert_results_unchanged_by_fold(spark, tmp_table_dir):
    """End-to-end: the folded probe prunes identically — a narrow-key
    upsert against a multi-file layout rewrites only the hull's files
    and the final state matches the naive expectation."""
    t = _mk(spark, tmp_table_dir, files_per_partition=4)
    t.bulk_insert(_rows(spark, [dict(id=i, v="old", seq=1)
                                for i in range(40)]))
    prev = t.timeline.latest()
    assert len(prev.files) == 4
    c = t.upsert(_rows(spark, [dict(id=2, v="new", seq=2),
                               dict(id=3, v="new", seq=2)]))
    # the narrow batch's hull ("2".."3" as strings, covering the
    # "2x"/"3x" lexicographic range) prunes the other files out
    affected, skipped = t._prune_by_key_range(
        prev.files, prev.key_stats, t._batch_key_range(
            _rows(spark, [dict(id=2, v="new", seq=2),
                          dict(id=3, v="new", seq=2)])))
    assert c.stats["files_rewritten"] == len(affected) < 4
    got = {r["id"]: r["v"] for r in t.read_snapshot().collect()}
    assert got[2] == "new" and got[3] == "new" and got[0] == "old"
    assert len(got) == 40
