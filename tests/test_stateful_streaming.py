"""applyInPandasWithState: state must persist across micro-batches — the
second batch's output reflects counts accumulated in the first."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import Row, types as T

from glue_hudi_spark.streaming.stateful import running_user_profiles

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _land(spark, rows, d: Path, name: str):
    stage = str(d) + "_stage_" + name
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("overwrite").parquet(stage)
    d.mkdir(parents=True, exist_ok=True)
    for i, p in enumerate(Path(stage).glob("*.parquet")):
        p.rename(d / f"{name}_{i}.parquet")


def _run_once(spark, src: Path, ckpt: Path):
    """availableNow pass; collects emitted rows via foreachBatch (the
    memory sink cannot resume from a checkpoint)."""
    out: list = []
    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    q = (
        running_user_profiles(stream)
        .writeStream.foreachBatch(lambda df, _id: out.extend(df.collect()))
        .outputMode("update")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return out


def test_state_survives_across_batches(spark, tmp_path):
    src, ckpt = tmp_path / "src", tmp_path / "ckpt"
    _land(spark, [Row(event_id=1, user_id=7, value=10.0),
                  Row(event_id=2, user_id=7, value=5.0),
                  Row(event_id=3, user_id=8, value=1.0)], src, "b1")
    rows = _run_once(spark, src, ckpt)
    got = {r["user_id"]: r for r in rows}
    assert got[7]["n_events"] == 2 and got[7]["total_value"] == 15.0
    assert got[7]["last_event_id"] == 2 and got[8]["n_events"] == 1

    # batch 2 touches user 7 only; its profile must ACCUMULATE (n=3)
    _land(spark, [Row(event_id=4, user_id=7, value=100.0)], src, "b2")
    got2 = {r["user_id"]: r for r in _run_once(spark, src, ckpt)}
    assert got2[7]["n_events"] == 3
    assert got2[7]["total_value"] == 115.0
    assert got2[7]["max_value"] == 100.0
    assert got2[7]["last_event_id"] == 4
    assert 8 not in got2  # untouched key emits nothing in update mode
