"""SCD2: rebuild semantics, incremental-apply ≡ rebuild equivalence,
immutable closed history, as-of reconstruction, out-of-order rejection."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row

from glue_hudi_spark.operators import scd2


def _ts(h):
    return dt.datetime(2024, 1, 1, h, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(
        [Row(k=k, ts=_ts(h), attr=a) for k, h, a in rows])


def _canon(df):
    return sorted(
        (r["k"], r["attr"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in df.collect()
    )


def test_build_versions_and_collapse(spark):
    ev = _ev(spark, [
        ("u1", 1, "a"), ("u1", 2, "a"),   # repeat → collapsed
        ("u1", 3, "b"), ("u2", 5, "x"),
    ])
    out = {(r["k"], r["attr"]): (r["valid_from"], r["valid_to"], r["is_current"])
           for r in scd2.scd2_build(ev, ["k"], "ts", ["attr"]).collect()}
    assert len(out) == 3
    assert out[("u1", "a")] == (_ts(1), _ts(3), False)
    assert out[("u1", "b")][0] == _ts(3) and out[("u1", "b")][2] is True
    assert out[("u2", "x")][2] is True


def test_apply_equals_rebuild(spark):
    hist = _ev(spark, [("u1", 1, "a"), ("u1", 3, "b"), ("u2", 2, "x")])
    scd = scd2.scd2_build(hist, ["k"], "ts", ["attr"])
    batch = _ev(spark, [
        ("u1", 5, "c"), ("u1", 7, "d"),    # chained changes in one batch
        ("u3", 6, "new"),                  # key birth
        ("u2", 8, "x"),                    # no-op repeat of current attr
    ])
    applied = scd2.scd2_apply(scd, batch, ["k"], "ts", ["attr"])
    rebuilt = scd2.scd2_build(
        hist.unionByName(batch), ["k"], "ts", ["attr"])
    assert _canon(applied) == _canon(rebuilt)
    # closed history rows are byte-identical (immutability)
    closed_a = _canon(applied.filter("NOT is_current"))
    closed_r = _canon(rebuilt.filter("NOT is_current"))
    assert closed_a == closed_r


def test_as_of_reconstruction(spark):
    ev = _ev(spark, [("u1", 1, "a"), ("u1", 4, "b"), ("u2", 2, "x")])
    scd = scd2.scd2_build(ev, ["k"], "ts", ["attr"])
    snap = {r["k"]: r["attr"]
            for r in scd2.as_of(scd, "2024-01-01 03:00:00").collect()}
    assert snap == {"u1": "a", "u2": "x"}
    snap2 = {r["k"]: r["attr"]
             for r in scd2.as_of(scd, "2024-01-01 05:00:00").collect()}
    assert snap2 == {"u1": "b", "u2": "x"}


def test_out_of_order_batch_rejected(spark):
    scd = scd2.scd2_build(
        _ev(spark, [("u1", 5, "a")]), ["k"], "ts", ["attr"])
    with pytest.raises(ValueError):
        scd2.scd2_apply(
            scd, _ev(spark, [("u1", 2, "late")]), ["k"], "ts", ["attr"])
