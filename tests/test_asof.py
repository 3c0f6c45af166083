"""As-of join semantics on hand-built cases: backward match, exact-time
tie visibility, no-match NULLs, tolerance staleness, composite keys."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row, functions as F

from glue_hudi_spark.operators.asof import asof_join


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m, 0)


@pytest.fixture()
def quotes_trades(spark):
    quotes = spark.createDataFrame(
        [
            Row(sym="A", q_ts=_ts(1), bid=10.0),
            Row(sym="A", q_ts=_ts(5), bid=11.0),
            Row(sym="A", q_ts=_ts(9), bid=12.0),
            Row(sym="B", q_ts=_ts(4), bid=99.0),
        ]
    )
    trades = spark.createDataFrame(
        [
            Row(sym="A", t_ts=_ts(0), qty=1),   # before any quote
            Row(sym="A", t_ts=_ts(5), qty=2),   # exactly at a quote
            Row(sym="A", t_ts=_ts(7), qty=3),   # between quotes
            Row(sym="B", t_ts=_ts(30), qty=4),  # long after the quote
            Row(sym="C", t_ts=_ts(2), qty=5),   # key with no quotes at all
        ]
    )
    return quotes, trades


def test_backward_asof_semantics(spark, quotes_trades):
    quotes, trades = quotes_trades
    out = asof_join(
        trades, quotes, key_cols=["sym"], left_time="t_ts", right_time="q_ts"
    )
    got = {(r["sym"], r["qty"]): r["bid"] for r in out.collect()}
    assert got[("A", 1)] is None          # nothing at-or-before
    assert got[("A", 2)] == 11.0          # exact-time quote IS visible
    assert got[("A", 3)] == 11.0          # latest before
    assert got[("B", 4)] == 99.0
    assert got[("C", 5)] is None          # unseen key
    assert out.count() == trades.count()  # left-join cardinality preserved


def test_asof_tolerance(spark, quotes_trades):
    quotes, trades = quotes_trades
    out = asof_join(
        trades, quotes, key_cols=["sym"], left_time="t_ts", right_time="q_ts",
        tolerance="10 minutes",
    )
    got = {(r["sym"], r["qty"]): r["bid"] for r in out.collect()}
    assert got[("B", 4)] is None          # 26 min stale > 10 min tolerance
    assert got[("A", 3)] == 11.0          # 2 min stale, kept


def test_asof_payload_collision_raises(spark, quotes_trades):
    quotes, trades = quotes_trades
    with pytest.raises(ValueError, match="collide"):
        asof_join(
            trades, quotes.withColumnRenamed("bid", "qty"),
            key_cols=["sym"], left_time="t_ts", right_time="q_ts",
        )


def test_asof_equal_time_right_rows_deterministic(spark):
    """Two right rows at the identical (key, time) must resolve to the same
    winner on every run: the greatest payload tuple."""
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame(
        [Row(k="a", t=t0, lv=1)]
    )
    right = spark.createDataFrame(
        [Row(k="a", rt=t0, quote="early"), Row(k="a", rt=t0, quote="late")]
    )
    results = set()
    for _ in range(5):
        out = asof_join(left, right.orderBy(F.rand(seed=_)), ["k"], "t", "rt")
        results.add(out.first()["quote"])
    assert results == {"late"}  # max payload tuple, stable across shuffles


def test_forward_asof_semantics(spark, quotes_trades):
    quotes, trades = quotes_trades
    out = asof_join(
        trades, quotes, key_cols=["sym"], left_time="t_ts", right_time="q_ts",
        direction="forward",
    )
    got = {(r["sym"], r["qty"]): r["bid"] for r in out.collect()}
    assert got[("A", 1)] == 10.0   # earliest quote at-or-after minute 0 -> m1
    assert got[("A", 2)] == 11.0   # exactly-at quote visible (>=)
    assert got[("A", 3)] == 12.0   # next quote after m7 -> m9
    assert got[("B", 4)] is None   # no quote after minute 30
    assert got[("C", 5)] is None
    assert out.count() == trades.count()


def test_forward_asof_tolerance(spark, quotes_trades):
    quotes, trades = quotes_trades
    out = asof_join(
        trades, quotes, key_cols=["sym"], left_time="t_ts", right_time="q_ts",
        direction="forward", tolerance="1 minutes",
    )
    got = {(r["sym"], r["qty"]): r["bid"] for r in out.collect()}
    assert got[("A", 1)] == 10.0   # 1 min ahead, kept
    assert got[("A", 3)] is None   # 2 min ahead > 1 min tolerance


def test_nearest_asof_semantics(spark, quotes_trades):
    quotes, trades = quotes_trades
    out = asof_join(
        trades, quotes, key_cols=["sym"], left_time="t_ts", right_time="q_ts",
        direction="nearest",
    )
    got = {(r["sym"], r["qty"]): r["bid"] for r in out.collect()}
    assert got[("A", 1)] == 10.0   # only forward exists (m1, dist 1)
    assert got[("A", 2)] == 11.0   # exact hit
    assert got[("A", 3)] == 11.0   # backward m5 (dist 2) equals forward m9 (dist 2)? no: dist 2 vs 2 -> backward
    assert got[("B", 4)] == 99.0   # only backward exists
    assert got[("C", 5)] is None


def test_nearest_prefers_closer_forward(spark):
    t0 = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame([Row(k="a", t=t0 + dt.timedelta(minutes=10), lv=1)])
    right = spark.createDataFrame([
        Row(k="a", rt=t0 + dt.timedelta(minutes=1), quote="far-back"),
        Row(k="a", rt=t0 + dt.timedelta(minutes=12), quote="near-fwd"),
    ])
    out = asof_join(left, right, ["k"], "t", "rt", direction="nearest")
    assert out.first()["quote"] == "near-fwd"


def test_asof_bad_direction_raises(spark, quotes_trades):
    quotes, trades = quotes_trades
    with pytest.raises(ValueError, match="direction"):
        asof_join(trades, quotes, ["sym"], "t_ts", "q_ts", direction="sideways")
