"""Watermarked windowed aggs: windows finalize in append mode once the
watermark passes; a too-late row is dropped, an in-grace late row counts."""

from __future__ import annotations

import datetime as dt
from pathlib import Path

from pyspark.sql import Row, types as T

from glue_hudi_spark.streaming.windowed import windowed_event_counts

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
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


def _run(spark, src: Path, ckpt: Path):
    out = []
    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    q = (
        windowed_event_counts(stream, window="1 hour", watermark="1 hour")
        .writeStream.foreachBatch(lambda df, _id: out.extend(df.collect()))
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return out


def test_watermark_finalizes_and_drops_late(spark, tmp_path):
    src, ckpt = tmp_path / "src", tmp_path / "ckpt"

    # batch 1: events in hours 0 and 1; max event time 01:30 → watermark 00:30
    _land(spark, [
        Row(event_id=1, ts=_ts(0, 10), event_type="click", value=1.0),
        Row(event_id=2, ts=_ts(0, 20), event_type="click", value=2.0),
        Row(event_id=3, ts=_ts(1, 30), event_type="click", value=4.0),
    ], src, "b1")
    out1 = _run(spark, src, ckpt)
    assert out1 == []  # append mode: nothing final yet (wm 00:30 < window end 01:00)

    # batch 2: event at 03:00 pushes watermark to 02:00 → windows 0 and 1
    # finalize; plus a VERY late row (00:40, behind the 00:30→old wm? it's
    # within batch-2's *starting* watermark 00:30? 00:40 > 00:30 → counted)
    _land(spark, [
        Row(event_id=4, ts=_ts(3, 0), event_type="click", value=8.0),
        Row(event_id=5, ts=_ts(0, 40), event_type="click", value=16.0),
    ], src, "b2")
    out2 = _run(spark, src, ckpt)
    finals = {(r["window_start"].hour, r["n"], r["total_value"]) for r in out2}
    assert (0, 3, 19.0) in finals  # hour-0 window: rows 1,2 + in-grace row 5
    assert (1, 1, 4.0) in finals   # hour-1 window finalized

    # batch 3: hopelessly late row (hour 0; watermark is now 02:00) must be
    # DROPPED — and pushing the watermark further emits no hour-0 window
    _land(spark, [
        Row(event_id=6, ts=_ts(0, 50), event_type="click", value=32.0),
        Row(event_id=7, ts=_ts(5, 0), event_type="click", value=64.0),
    ], src, "b3")
    out3 = _run(spark, src, ckpt)
    hours = {r["window_start"].hour for r in out3}
    assert 0 not in hours, "too-late row must not resurrect a finalized window"
    assert {3} <= hours  # hour-3 window finalized by the hour-5 event
