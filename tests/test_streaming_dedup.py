"""Streaming dedup (dropDuplicatesWithinWatermark) and native
session_window sessionization: duplicate suppression inside the watermark
horizon, and gap-identical sessions vs the batch formulation."""

from __future__ import annotations

import datetime as dt
from pathlib import Path

from pyspark.sql import Row, types as T

from glue_hudi_spark.streaming.dedup import (
    streaming_exact_dedup,
    streaming_sessionization,
)

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def _land(spark, rows, d: Path, name: str):
    stage = str(d) + "_stage_" + name
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("overwrite").parquet(stage)
    d.mkdir(parents=True, exist_ok=True)
    for i, p in enumerate(Path(stage).glob("*.parquet")):
        p.rename(d / f"{name}_{i}.parquet")


def _run(spark, src: Path, ckpt: Path, xform, mode="append"):
    out = []
    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    q = (
        xform(stream)
        .writeStream.foreachBatch(lambda df, _id: out.extend(df.collect()))
        .outputMode(mode)
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return out


def test_streaming_dedup_within_watermark(spark, tmp_path):
    src, ckpt = tmp_path / "src", tmp_path / "ckpt"
    _land(spark, [
        Row(event_id=1, ts=_ts(0, 10), user_id=1, value=1.0),
        Row(event_id=1, ts=_ts(0, 11), user_id=1, value=1.0),  # same-batch dup
        Row(event_id=2, ts=_ts(0, 20), user_id=2, value=2.0),
    ], src, "b1")
    out1 = _run(spark, src, ckpt,
                lambda s: streaming_exact_dedup(s, ["event_id"], watermark="1 hour"))
    assert sorted(r["event_id"] for r in out1) == [1, 2]

    # cross-batch replay of event 1 inside the horizon → suppressed;
    # new event 3 passes
    _land(spark, [
        Row(event_id=1, ts=_ts(0, 30), user_id=1, value=1.0),
        Row(event_id=3, ts=_ts(0, 40), user_id=3, value=3.0),
    ], src, "b2")
    out2 = _run(spark, src, ckpt,
                lambda s: streaming_exact_dedup(s, ["event_id"], watermark="1 hour"))
    assert sorted(r["event_id"] for r in out2) == [3]


def test_streaming_sessionization_matches_gap_semantics(spark, tmp_path):
    src, ckpt = tmp_path / "src", tmp_path / "ckpt"
    # user 1: events at 00:00, 00:10 (one session), then 01:00 (> 30 min gap
    # → second session). user 2: one event.
    _land(spark, [
        Row(event_id=1, ts=_ts(0, 0), user_id=1, value=1.0),
        Row(event_id=2, ts=_ts(0, 10), user_id=1, value=2.0),
        Row(event_id=3, ts=_ts(1, 0), user_id=1, value=4.0),
        Row(event_id=4, ts=_ts(0, 5), user_id=2, value=8.0),
        # sentinel far in the future pushes the watermark → sessions finalize
        Row(event_id=99, ts=_ts(9, 0), user_id=9, value=0.0),
    ], src, "b1")
    out = _run(
        spark, src, ckpt,
        lambda s: streaming_sessionization(s, gap="30 minutes", watermark="1 hour"),
    )
    sessions = {
        (r["user_id"], r["session_start"].hour, r["session_start"].minute,
         r["n_events"], r["total_value"])
        for r in out
    }
    assert (1, 0, 0, 2, 3.0) in sessions   # 00:00+00:10 merged
    assert (1, 1, 0, 1, 4.0) in sessions   # 01:00 split by the 30-min gap
    assert (2, 0, 5, 1, 8.0) in sessions
