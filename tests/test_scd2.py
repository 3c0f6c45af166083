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


def test_apply_migrates_old_9999_sentinel(spark):
    """A table written before HIGH_TS moved 9999-12-31 → 2200-01-01 must
    come out of scd2_apply with ONE sentinel: untouched current rows are
    normalized, not left mixed with re-derived keys' new sentinel."""
    old_high = dt.datetime(9999, 12, 31)
    legacy = spark.createDataFrame(
        [Row(k="u1", attr="a", valid_from=_ts(1), valid_to=old_high,
             is_current=True),
         Row(k="u2", attr="x", valid_from=_ts(2), valid_to=old_high,
             is_current=True),
         Row(k="u2", attr="w", valid_from=_ts(1), valid_to=_ts(2),
             is_current=False)])
    batch = _ev(spark, [("u2", 5, "y")])   # touches u2 only; u1 passes through
    out = scd2.scd2_apply(legacy, batch, ["k"], "ts", ["attr"])
    high = dt.datetime.fromisoformat(scd2.HIGH_TS)
    rows = {(r["k"], r["attr"]): (r["valid_to"], r["is_current"])
            for r in out.collect()}
    assert rows[("u1", "a")] == (high, True)    # pass-through, normalized
    assert rows[("u2", "y")] == (high, True)    # re-derived
    assert rows[("u2", "x")] == (_ts(5), False)
    assert all(vt <= high for vt, _ in rows.values())


def test_out_of_order_batch_rejected(spark):
    scd = scd2.scd2_build(
        _ev(spark, [("u1", 5, "a")]), ["k"], "ts", ["attr"])
    with pytest.raises(ValueError):
        scd2.scd2_apply(
            scd, _ev(spark, [("u1", 2, "late")]), ["k"], "ts", ["attr"])
