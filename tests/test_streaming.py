"""Structured Streaming CDC: availableNow backlog processing must converge
to the same snapshot as the batch pipeline (golden scenario)."""

from __future__ import annotations

from decimal import Decimal
from pathlib import Path

from glue_hudi_spark.config import JobControl
from glue_hudi_spark.streaming import CdcStream
from tests.fixtures_cdc import CDC_SCHEMA, CONTROL, make_cdc_df, make_full_load_df


def _land(df, raw_dir: Path, name: str):
    staging = str(raw_dir) + "__stage__" + name
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    raw_dir.mkdir(parents=True, exist_ok=True)
    for i, p in enumerate(Path(staging).glob("*.parquet")):
        p.rename(raw_dir / f"{name}_{i}.parquet")


def test_stream_backlog_merge(spark, tmp_path):
    ctl = JobControl(**CONTROL)
    raw = tmp_path / "raw" / ctl.db_name / ctl.schema_name / ctl.table_name

    # land the full load *in CDC envelope shape* (streams need one schema):
    # full-load rows become 'I' ops with low transaction_ids
    full = make_full_load_df(spark)
    full_cdc = spark.createDataFrame(
        [(*r, "I", f"{i:035d}") for i, r in enumerate(full.collect())], CDC_SCHEMA
    )
    _land(full_cdc, raw, "LOAD1")

    stream = CdcStream(
        spark, ctl, raw, tmp_path / "curated", tmp_path / "ckpt",
        schema=full_cdc.schema,
    )
    stream.run_available()
    assert stream.table.read_snapshot().count() == 100

    # land the CDC batch; a second availableNow run picks up only new files
    _land(make_cdc_df(spark), raw, "CDC1")
    stream.run_available()

    rows = {r["measurement_id"]: r for r in stream.table.read_snapshot().collect()}
    assert len(rows) == 190
    for i in range(10):
        assert rows[f"MeasurementID-{100 + i}"]["measurement_value"] == Decimal("100.00")
        assert f"MeasurementID-{200 + i}" not in rows


def test_stream_replayed_batch_is_skipped_exactly_once(spark, tmp_path):
    """foreachBatch is at-least-once: simulate the crash-between-merge-and-
    checkpoint window by re-invoking _merge_batch with an already-applied
    batch id — the marker inside the commit stats must make it a no-op
    (no new commit, no duplicate rows)."""
    ctl = JobControl(**CONTROL)
    raw = tmp_path / "raw" / ctl.db_name / ctl.schema_name / ctl.table_name
    full = make_full_load_df(spark)
    full_cdc = spark.createDataFrame(
        [(*r, "I", f"{i:035d}") for i, r in enumerate(full.collect())], CDC_SCHEMA
    )
    _land(full_cdc, raw, "LOAD1")
    stream = CdcStream(
        spark, ctl, raw, tmp_path / "curated", tmp_path / "ckpt",
        schema=full_cdc.schema,
    )
    stream.run_available()
    assert stream.table.last_stream_batch_id() == 0
    n_commits = len(stream.table.timeline.history())
    assert stream.table.read_snapshot().count() == 100

    # replay the SAME batch id (bulk_insert replay would duplicate rows)
    replay = spark.read.parquet(str(raw))
    stream._merge_batch(replay, 0)
    assert len(stream.table.timeline.history()) == n_commits
    assert stream.table.read_snapshot().count() == 100

    # a NEW batch id still applies
    stream._merge_batch(make_cdc_df(spark), 1)
    assert stream.table.read_snapshot().count() == 190
    assert stream.table.last_stream_batch_id() == 1
