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


# ---------------------------------------------------------- property test

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_SEC = st.integers(min_value=0, max_value=7200)  # two hours of seconds
_UID = st.integers(min_value=1, max_value=3)


@st.composite
def _scenario(draw):
    pts = draw(st.lists(st.tuples(_UID, _SEC), min_size=1, max_size=15))
    ivs = draw(st.lists(st.tuples(_UID, _SEC, _SEC), min_size=1, max_size=10))
    bucket = draw(st.sampled_from([7, 60, 900, 10_000]))
    return pts, ivs, bucket


@given(data=_scenario())
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
def test_interval_join_property(spark, data):
    """Random points/intervals at arbitrary bucket widths == the naive
    O(P×I) reference — including inverted (dropped) intervals, boundary
    hits, and intervals spanning many buckets."""
    pts, ivs, bucket = data
    points = spark.createDataFrame(
        [(u, i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s))
         for i, (u, s) in enumerate(pts)],
        "user_id bigint, click_id bigint, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [(u, i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=a),
          dt.datetime(2024, 1, 1) + dt.timedelta(seconds=b))
         for i, (u, a, b) in enumerate(ivs)],
        "user_id bigint, win_id bigint, w_start timestamp, w_end timestamp",
    )
    out = ranges.interval_join(
        points, intervals, on="user_id", point_ts="ts",
        start_col="w_start", end_col="w_end", bucket_seconds=bucket,
    )
    got = {(r["user_id"], r["click_id"], r["win_id"]) for r in out.collect()}
    assert got == _expected(points, intervals)


# ---------------------------------------------------------------------------
# Timestamp-flavor robustness: real parquet arrives as timestamp[ns],
# timestamp[us, tz=UTC], or timestamp[us] with no tz (Spark 4 reads the
# last as TIMESTAMP_NTZ, on which ts.cast('long') is illegal — the exact
# drift that broke round 4's driver gate). All three flavors must produce
# identical interval-join results, both through the raw operator and
# through the entry's normalizing reader.
# ---------------------------------------------------------------------------

@pytest.fixture()
def flavor_files(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = [dt.datetime(2024, 1, 1, 10, 30), dt.datetime(2024, 1, 1, 12, 0),
            dt.datetime(2024, 1, 1, 10, 45)]
    users = [1, 1, 2]
    clicks = [100, 101, 102]
    out = {}
    for flavor, typ in [
        ("ntz_us", pa.timestamp("us")),
        ("tz_us", pa.timestamp("us", tz="UTC")),
        ("ns", pa.timestamp("ns")),
    ]:
        tbl = pa.table({
            "user_id": pa.array(users, pa.int64()),
            "click_id": pa.array(clicks, pa.int64()),
            "ts": pa.array(base, pa.timestamp("us")).cast(typ),
        })
        path = str(tmp_path / f"points_{flavor}.parquet")
        pq.write_table(tbl, path)
        out[flavor] = path
    return out


def test_interval_join_all_timestamp_flavors(spark, frames, flavor_files):
    """NTZ / LTZ / nanos parquet all join identically (round-4 regression)."""
    import sys
    sys.path.insert(0, "/root/repo")
    from __spark_entry__ import _read_parquet_nanosafe

    _, intervals = frames
    expect = {(1, 100, 200), (1, 100, 201), (1, 101, 201)}
    for flavor, path in flavor_files.items():
        points = _read_parquet_nanosafe(spark, path)
        # the reader must normalize away NTZ and nanos entirely
        assert points.schema["ts"].dataType.typeName() == "timestamp", flavor
        out = ranges.interval_join(
            points, intervals, on="user_id", point_ts="ts",
            start_col="w_start", end_col="w_end", bucket_seconds=900,
        )
        got = {(r["user_id"], r["click_id"], r["win_id"]) for r in out.collect()}
        assert got == expect, flavor


def test_interval_join_raw_ntz_input(spark, frames):
    """The operator itself tolerates an NTZ column (no reader in front)."""
    points, intervals = frames
    ntz = points.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    out = ranges.interval_join(
        ntz, intervals, on="user_id", point_ts="ts",
        start_col="w_start", end_col="w_end", bucket_seconds=900,
    )
    got = {(r["user_id"], r["click_id"], r["win_id"]) for r in out.collect()}
    assert got == {(1, 100, 200), (1, 100, 201), (1, 101, 201)}
