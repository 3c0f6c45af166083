"""Partial-update merge (upsert(partial=True)) — Hudi
OverwriteNonDefaultsWithLatestAvroPayload semantics on the native table:
NULL incoming fields and absent columns keep current values; non-null
fields overwrite; new keys insert."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from glue_hudi_spark.storage.native import NativeTable


def _mk(spark, path, **kw):
    kw.setdefault("record_keys", ["id"])
    kw.setdefault("precombine", "seq")
    kw.setdefault("partition_keys", [])
    return NativeTable(spark, path, **kw)


def _rows(spark, rows, schema=None):
    if schema:
        return spark.createDataFrame(rows, schema)
    return spark.createDataFrame([Row(**r) for r in rows])


def _snap(t):
    return {r["id"]: r.asDict() for r in t.read_snapshot().collect()}


def test_partial_null_fields_keep_current(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.bulk_insert(_rows(spark, [
        dict(id=1, a="a1", b=10, seq=1),
        dict(id=2, a="a2", b=20, seq=1),
    ]))
    # null a -> keep a1; b overwritten
    t.upsert(
        _rows(spark, [(1, None, 99, 2)], "id bigint, a string, b bigint, seq bigint"),
        partial=True,
    )
    got = _snap(t)
    assert got[1]["a"] == "a1" and got[1]["b"] == 99 and got[1]["seq"] == 2
    assert got[2] == dict(id=2, a="a2", b=20, seq=1)


def test_partial_absent_columns_keep_current(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.bulk_insert(_rows(spark, [dict(id=1, a="a1", b=10, seq=1)]))
    # batch carries only (id, b, seq): column a must survive
    t.upsert(
        _rows(spark, [(1, 77, 2)], "id bigint, b bigint, seq bigint"),
        partial=True,
    )
    got = _snap(t)
    assert got[1]["a"] == "a1" and got[1]["b"] == 77


def test_partial_new_keys_insert_with_nulls(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.bulk_insert(_rows(spark, [dict(id=1, a="a1", b=10, seq=1)]))
    t.upsert(
        _rows(spark, [(5, 50, 1)], "id bigint, b bigint, seq bigint"),
        partial=True,
    )
    got = _snap(t)
    assert got[5]["b"] == 50 and got[5]["a"] is None
    assert len(got) == 2


def test_full_upsert_still_overwrites_with_null(spark, tmp_path):
    """Default (non-partial) payload: NULL incoming fields DO overwrite."""
    t = _mk(spark, tmp_path / "t")
    t.bulk_insert(_rows(spark, [dict(id=1, a="a1", b=10, seq=1)]))
    t.upsert(
        _rows(spark, [(1, None, 99, 2)], "id bigint, a string, b bigint, seq bigint"),
    )
    assert _snap(t)[1]["a"] is None


def test_partial_on_mor_compacts_first(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", storage_type="mor")
    t.bulk_insert(_rows(spark, [dict(id=1, a="a1", b=10, seq=1)]))
    t.upsert(_rows(spark, [dict(id=1, a="a2", b=11, seq=2)]))  # delta
    t.upsert(
        _rows(spark, [(1, None, 99, 3)], "id bigint, a string, b bigint, seq bigint"),
        partial=True,
    )
    got = _snap(t)
    # partial resolves against the COMPACTED row (a2/11), not the base
    assert got[1]["a"] == "a2" and got[1]["b"] == 99 and got[1]["seq"] == 3


def test_partial_prunes_like_full_merge(spark, tmp_path):
    """Partial updates keep the same file-rewrite selectivity: a narrow
    batch rewrites only the files its key range admits."""
    t = _mk(spark, tmp_path / "t", files_per_partition=8)
    t.bulk_insert(_rows(spark, [dict(id=i, a=f"a{i}", b=i, seq=1) for i in range(800)]))
    c = t.upsert(
        _rows(spark, [(3, 999, 2)], "id bigint, b bigint, seq bigint"),
        partial=True,
    )
    assert c.stats["files_rewritten"] <= 2
    got = _snap(t)
    assert got[3]["b"] == 999 and got[3]["a"] == "a3"
    assert got[500] == dict(id=500, a="a500", b=500, seq=1)
