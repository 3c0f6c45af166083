"""Interval join (operators/ranges.py): semantics vs a naive reference,
and the plan guard that justifies the operator's existence — no
nested-loop join at any bucket width.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from glue_hudi_spark.operators import ranges


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


@pytest.fixture()
def frames(spark):
    points = spark.createDataFrame(
        [(1, 100, _ts(10, 30)), (1, 101, _ts(12, 0)), (2, 102, _ts(10, 45)),
         (2, 103, _ts(23, 59)), (3, 104, _ts(10, 30))],
        "user_id bigint, click_id bigint, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [(1, 200, _ts(10), _ts(11)),      # catches 100
         (1, 201, _ts(10, 30), _ts(13)),  # catches 100 (boundary) + 101
         (2, 202, _ts(11), _ts(12)),      # catches nothing
         (3, 203, _ts(11), _ts(10)),      # inverted → dropped
         (4, 204, _ts(0), _ts(23))],      # no matching user
        "user_id bigint, win_id bigint, w_start timestamp, w_end timestamp",
    )
    return points, intervals


def _expected(points, intervals):
    pts = [(r["user_id"], r["click_id"], r["ts"]) for r in points.collect()]
    ivs = [(r["user_id"], r["win_id"], r["w_start"], r["w_end"])
           for r in intervals.collect()]
    return {
        (u, c, w)
        for (u, c, t) in pts
        for (iu, w, s, e) in ivs
        if u == iu and s <= t <= e
    }


@pytest.mark.parametrize("bucket_seconds", [60, 900, 3600, 86400])
def test_interval_join_matches_naive(spark, frames, bucket_seconds):
    """Bucket width is a throughput knob, never a correctness one."""
    points, intervals = frames
    out = ranges.interval_join(
        points, intervals, on="user_id", point_ts="ts",
        start_col="w_start", end_col="w_end", bucket_seconds=bucket_seconds,
    )
    got = {(r["user_id"], r["click_id"], r["win_id"]) for r in out.collect()}
    assert got == _expected(points, intervals)
    assert got == {(1, 100, 200), (1, 100, 201), (1, 101, 201)}


def test_interval_join_no_nested_loop(spark, frames):
    points, intervals = frames
    plan = ranges.interval_join(
        points, intervals, on="user_id", point_ts="ts",
        start_col="w_start", end_col="w_end", bucket_seconds=900,
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_interval_join_no_key(spark, frames):
    """on=None: the bucket alone is the equi-key — still hash-joinable."""
    points, intervals = frames
    out = ranges.interval_join(
        points.drop("user_id"), intervals.drop("user_id"), on=None,
        point_ts="ts", start_col="w_start", end_col="w_end",
        bucket_seconds=900,
    )
    # every (point, interval) time containment, regardless of user
    assert out.count() == sum(
        1
        for (_, _, t) in [(r["click_id"], 0, r["ts"]) for r in points.collect()]
        for r in intervals.collect()
        if r["w_start"] <= t <= r["w_end"]
    )


def test_interval_join_rejects_bad_bucket(spark, frames):
    points, intervals = frames
    with pytest.raises(ValueError):
        ranges.interval_join(points, intervals, "user_id", "ts",
                             "w_start", "w_end", bucket_seconds=0)
