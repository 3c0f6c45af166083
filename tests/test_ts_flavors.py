"""Timestamp-flavor robustness across every timestamp-consuming operator.

Real parquet arrives as timestamp[ns], timestamp[us, tz=UTC], or
timestamp[us] with no timezone (Spark 4 reads the last as TIMESTAMP_NTZ —
the round-4 driver-fixture drift). The normalizing reader must make all
three flavors indistinguishable to every downstream operator: as-of join,
sessionization (lag + running sum), window suite, hourly rollup, and the
funnel. The interval join has its own flavor tests in
tests/test_interval_join.py.
"""

from __future__ import annotations

import datetime as dt
import sys

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")
from __spark_entry__ import _read_parquet_nanosafe  # noqa: E402

FLAVORS = ["ntz_us", "tz_us", "ns"]


@pytest.fixture()
def flavor_events(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = dt.datetime(2024, 1, 1, 10, 0)
    rows = [
        (i, base + dt.timedelta(minutes=7 * i + (i % 3)), i % 2, "click" if i % 3 else "view", float(i))
        for i in range(40)
    ] + [(100 + i, base + dt.timedelta(hours=3, minutes=50 * i), 0, "purchase", 1.0)
         for i in range(3)]
    out = {}
    for flavor, typ in [
        ("ntz_us", pa.timestamp("us")),
        ("tz_us", pa.timestamp("us", tz="UTC")),
        ("ns", pa.timestamp("ns")),
    ]:
        tbl = pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")).cast(typ),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows]),
            "value": pa.array([r[4] for r in rows], pa.float64()),
        })
        path = str(tmp_path / f"events_{flavor}.parquet")
        pq.write_table(tbl, path)
        out[flavor] = path
    return out


def _per_flavor(spark, flavor_events, build):
    results = {}
    for flavor in FLAVORS:
        df = _read_parquet_nanosafe(spark, flavor_events[flavor])
        assert df.schema["ts"].dataType.typeName() == "timestamp", flavor
        results[flavor] = sorted(map(tuple, build(df).collect()))
    assert results["ntz_us"] == results["tz_us"] == results["ns"]
    assert results["ns"], "flavor test must produce rows"


def test_sessionization_flavors(spark, flavor_events):
    def build(df):
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
        new_s = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
        sess = F.sum(new_s).over(w)
        return df.select("event_id", "user_id", sess.alias("session_id"))

    _per_flavor(spark, flavor_events, build)


def test_window_suite_flavors(spark, flavor_events):
    def build(df):
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        return df.select(
            "event_id",
            F.row_number().over(w).alias("rn"),
            F.lag("value").over(w).alias("prev_v"),
            F.lead("value").over(w).alias("next_v"),
        )

    _per_flavor(spark, flavor_events, build)


def test_hourly_rollup_flavors(spark, flavor_events):
    def build(df):
        return df.groupBy(
            F.date_trunc("hour", "ts").alias("h"), "event_type"
        ).agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))

    _per_flavor(spark, flavor_events, build)


def test_asof_join_flavors(spark, flavor_events):
    from glue_hudi_spark.operators import asof

    def build(df):
        left = df.filter(F.col("event_type") == "click").select(
            "user_id", F.col("event_id").alias("click_id"), "ts")
        right = df.filter(F.col("event_type") == "view").select(
            "user_id", F.col("event_id").alias("view_id"), "ts")
        right = right.withColumnRenamed("ts", "r_ts")
        out = asof.asof_join(left, right, key_cols=["user_id"],
                             left_time="ts", right_time="r_ts",
                             right_payload=["view_id"])
        return out.select("click_id", "view_id")

    _per_flavor(spark, flavor_events, build)


def test_funnel_flavors(spark, flavor_events):
    def build(df):
        v = (df.filter(F.col("event_type") == "view")
             .groupBy("user_id").agg(F.min("ts").alias("t_view")))
        c = (df.filter(F.col("event_type") == "click")
             .join(v, "user_id").filter(F.col("ts") > F.col("t_view"))
             .groupBy("user_id").agg(F.min("ts").alias("t_click")))
        return v.select("user_id").unionByName(c.select("user_id"))

    _per_flavor(spark, flavor_events, build)
