"""Stream-stream interval join: watermark-bounded state, exact matches.

Both sides are real streams (parquet file sources, availableNow); the
join condition's time bounds let Spark size the state store from the
watermarks — the plan is accepted in append mode, which is itself the
assertion that state is finite.
"""

from __future__ import annotations

import datetime as dt
from pathlib import Path

from pyspark.sql import types as T

from glue_hudi_spark.streaming.interval import stream_interval_join

P_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("click_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
])
I_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("win_id", T.LongType()),
    T.StructField("w_start", T.TimestampType()),
    T.StructField("w_end", T.TimestampType()),
])


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def _land(spark, rows, schema, d: Path, name: str):
    stage = str(d) + "_stage_" + name
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(stage)
    d.mkdir(parents=True, exist_ok=True)
    for i, p in enumerate(Path(stage).glob("*.parquet")):
        p.rename(d / f"{name}_{i}.parquet")


def test_stream_interval_join_matches(spark, tmp_path):
    pdir, idir = tmp_path / "points", tmp_path / "intervals"
    _land(spark, [(1, 100, _ts(10, 30)), (1, 101, _ts(12, 0)),
                  (2, 102, _ts(10, 45))], P_SCHEMA, pdir, "p0")
    _land(spark, [(1, 200, _ts(10), _ts(11)),
                  (1, 201, _ts(10, 30), _ts(13)),
                  (2, 202, _ts(11), _ts(12))], I_SCHEMA, idir, "i0")

    points = spark.readStream.schema(P_SCHEMA).parquet(str(pdir))
    intervals = spark.readStream.schema(I_SCHEMA).parquet(str(idir))
    joined = stream_interval_join(points, intervals, on="user_id")
    assert joined.isStreaming

    out = []
    q = (
        joined.writeStream.foreachBatch(lambda df, _id: out.extend(df.collect()))
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(r["user_id"], r["click_id"], r["win_id"]) for r in out}
    assert got == {(1, 100, 200), (1, 100, 201), (1, 101, 201)}
