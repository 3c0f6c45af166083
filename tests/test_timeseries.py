"""resample_gapfill: dense grid, locf carry-forward, poisoned-timestamp
clamp (operators/timeseries.py — the TimescaleDB gapfill family)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from glue_hudi_spark.operators.timeseries import resample_gapfill


def _ev(spark, rows):
    return spark.createDataFrame([
        Row(k=k, ts=dt.datetime(2024, 1, d, h), v=float(v))
        for k, d, h, v in rows])


def test_gapfill_grid_locf_and_flags(spark):
    # key "a": days 1, 2, 5 observed -> 3,4 are gaps; "b": single day
    df = _ev(spark, [("a", 1, 8, 10), ("a", 1, 9, 5), ("a", 2, 8, 7),
                     ("a", 5, 8, 1), ("b", 3, 12, 99)])
    out = resample_gapfill(
        df, keys=["k"], ts_col="ts",
        values={"total": F.sum("v")}, unit="day",
    ).orderBy("k", "bucket").collect()
    a = [r for r in out if r["k"] == "a"]
    assert len(a) == 5  # dense: Jan 1..5
    assert [r["total"] for r in a] == [15.0, 7.0, None, None, 1.0]
    assert [r["is_gap"] for r in a] == [False, False, True, True, False]
    assert [r["total_locf"] for r in a] == [15.0, 7.0, 7.0, 7.0, 1.0]
    b = [r for r in out if r["k"] == "b"]
    assert len(b) == 1 and b[0]["is_gap"] is False


def test_gapfill_clamps_poisoned_span(spark):
    df = spark.createDataFrame([
        Row(k="a", ts=dt.datetime(2024, 1, 1), v=1.0),
        Row(k="a", ts=dt.datetime(2024, 1, 3), v=2.0),
        # poisoned row: would stretch the grid ~70 years
        Row(k="a", ts=dt.datetime(2094, 1, 1), v=3.0),
        Row(k="b", ts=dt.datetime(2024, 1, 1), v=4.0),
    ])
    out = resample_gapfill(
        df, keys=["k"], ts_col="ts",
        values={"total": F.sum("v")}, unit="day", max_buckets=10,
    ).collect()
    a = [r for r in out if r["k"] == "a"]
    assert len(a) == 10  # exactly max_buckets rows, not 70 years of them
    assert all(r["_gf_clamped"] for r in a)
    b = [r for r in out if r["k"] == "b"]
    assert len(b) == 1 and not b[0]["_gf_clamped"]


def test_gapfill_guards(spark):
    df = _ev(spark, [("a", 1, 8, 1)])
    with pytest.raises(ValueError, match="unit"):
        resample_gapfill(df, ["k"], "ts", {"t": F.sum("v")}, unit="minute")
    with pytest.raises(ValueError, match="value agg"):
        resample_gapfill(df, ["k"], "ts", {})
    with pytest.raises(ValueError, match="max_buckets"):
        resample_gapfill(df, ["k"], "ts", {"t": F.sum("v")}, max_buckets=0)
    # NULL timestamps are dropped up front (documented), never joined in
    withnull = df.unionByName(spark.createDataFrame(
        [Row(k="a", ts=None, v=999.0)], df.schema))
    out = resample_gapfill(withnull, ["k"], "ts",
                           {"t": F.sum("v")}).collect()
    assert len(out) == 1 and out[0]["t"] == 1.0


def _series(spark, n, spike_every=50):
    """Flat series with a huge spike every `spike_every` points."""
    rows = []
    for i in range(n):
        v = 1000.0 if (i % spike_every == spike_every // 2) else float(i % 3)
        rows.append(Row(k="a", ts=dt.datetime(2024, 1, 1)
                        + dt.timedelta(minutes=i), v=v))
    return spark.createDataFrame(rows)


def test_lttb_anchors_count_and_spikes(spark):
    from glue_hudi_spark.operators.timeseries import lttb_downsample

    df = _series(spark, 500, spike_every=50)
    out = lttb_downsample(df, ["k"], "ts", "v", n_out=20) \
        .orderBy("ts").collect()
    assert len(out) == 20
    src = df.orderBy("ts").collect()
    # first/last anchored
    assert out[0]["ts"] == src[0]["ts"] and out[-1]["ts"] == src[-1]["ts"]
    # every output point is a real input point
    src_set = {(r["ts"], r["v"]) for r in src}
    assert all((r["ts"], r["v"]) in src_set for r in out)
    # the shape-preserving property: the spikes dominate triangle areas,
    # so most of the 10 spikes must survive 25x downsampling
    assert sum(1 for r in out if r["v"] == 1000.0) >= 8


def test_lttb_short_series_and_multi_key(spark):
    from glue_hudi_spark.operators.timeseries import lttb_downsample

    short = spark.createDataFrame([
        Row(k=k, ts=dt.datetime(2024, 1, 1, h), v=float(h))
        for k in ("a", "b") for h in range(5)])
    out = lttb_downsample(short, ["k"], "ts", "v", n_out=10).collect()
    assert len(out) == 10  # n <= n_out: series pass through untouched
    with pytest.raises(ValueError, match="n_out"):
        lttb_downsample(short, ["k"], "ts", "v", n_out=2)
