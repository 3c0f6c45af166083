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
        resample_gapfill(df, ["k"], "ts", {"t": F.sum("v")},
                         unit="fortnight")  # minute/year are valid (r13)
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


def test_lttb_pack_buckets_autoderive_and_collision_guard(spark):
    """pack_buckets=None derives max(1024, rows/1M); a reserved helper
    column in the input raises instead of silently corrupting grouping
    (r12 ADVICE: the old literal '_pack' name was clobber-able)."""
    from glue_hudi_spark.operators.timeseries import (
        _PACK_COL, derive_pack_buckets, lttb_downsample)

    assert derive_pack_buckets(0) == 1024
    assert derive_pack_buckets(60_000_000) == 1024
    assert derive_pack_buckets(2_000_000_000) == 2000
    assert derive_pack_buckets(2_000_000_001) == 2001

    df = _series(spark, 50)
    # auto-derived default runs end-to-end (the count pass + floor)
    assert lttb_downsample(df, ["k"], "ts", "v", n_out=10).count() == 10
    clash = df.withColumnRenamed("v", _PACK_COL)
    with pytest.raises(ValueError, match="collides"):
        lttb_downsample(clash, ["k"], "ts", _PACK_COL, n_out=10)


def test_gapfill_matches_plain_groupby_property(spark):
    """Property (hypothesis-lite over a seeded grid of shapes): on the
    dense grid, non-gap buckets must equal the plain groupBy aggregate,
    locf must equal the last non-null observation at-or-before the
    bucket, and each key's grid must be dense from its min to max day."""
    import random

    rnd = random.Random(7)
    rows = []
    for k in ("a", "b", "c"):
        for _ in range(rnd.randint(1, 25)):
            rows.append(Row(
                k=k,
                ts=dt.datetime(2024, 1, rnd.randint(1, 20),
                               rnd.randint(0, 23)),
                v=float(rnd.randint(-5, 50))))
    df = spark.createDataFrame(rows)
    out = resample_gapfill(df, ["k"], "ts",
                           {"t": F.sum("v")}, unit="day") \
        .orderBy("k", "bucket").collect()

    # reference: plain python
    from collections import defaultdict
    obs = defaultdict(dict)
    for r in rows:
        d = r.ts.date()
        obs[r.k][d] = obs[r.k].get(d, 0.0) + r.v
    by_key = defaultdict(list)
    for r in out:
        by_key[r["k"]].append(r)
    assert set(by_key) == set(obs)
    for k, rs in by_key.items():
        days = sorted(obs[k])
        expect_days = [days[0] + dt.timedelta(days=i)
                       for i in range((days[-1] - days[0]).days + 1)]
        assert [r["bucket"].date() for r in rs] == expect_days  # dense
        last = None
        for r in rs:
            d = r["bucket"].date()
            if d in obs[k]:
                assert r["is_gap"] is False
                assert r["t"] == pytest.approx(obs[k][d])
                last = obs[k][d]
            else:
                assert r["is_gap"] is True and r["t"] is None
            assert (r["t_locf"] is None and last is None) or \
                r["t_locf"] == pytest.approx(last)


def test_gapfill_linear_interpolation(spark):
    """interpolate=True: gap buckets blend the nearest observations
    proportionally to bucket distance; no extrapolation past the edges;
    observed buckets pass through."""
    df = _ev(spark, [("a", 1, 8, 10), ("a", 4, 8, 40),   # gaps at 2,3
                     ("a", 5, 8, 0),
                     ("b", 2, 9, 7)])
    out = {(r["k"], r["bucket"].day): r for r in resample_gapfill(
        df, ["k"], "ts", {"t": F.sum("v")}, unit="day",
        interpolate=True).collect()}
    a = [out[("a", d)]["t_interp"] for d in (1, 2, 3, 4, 5)]
    assert a == [pytest.approx(10.0), pytest.approx(20.0),
                 pytest.approx(30.0), pytest.approx(40.0),
                 pytest.approx(0.0)]
    assert out[("b", 2)]["t_interp"] == pytest.approx(7.0)
