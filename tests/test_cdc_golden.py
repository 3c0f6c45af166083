"""Golden end-to-end CDC scenario (SURVEY §3.2 / §5, FIXTURES.md A).

full load (100 rows) + CDC batch (100 I / 10 U / 10 D with same-batch
I→D overlap on keys 200..209) ⇒ snapshot of 190 rows:
* keys 100..109 updated to measurement_value = 100.00,
* keys 200..209 absent (their I is superseded by the same-batch D via W1),
* keys 210..299 present once.
Re-applying the same CDC batch is idempotent.
"""

from __future__ import annotations

import json
from decimal import Decimal
from pathlib import Path

import pytest

from glue_hudi_spark.config import ControlStore, JobControl
from glue_hudi_spark.pipeline import CdcPipeline
from tests.fixtures_cdc import CONTROL, make_cdc_df, make_full_load_df


def _write_raw(df, raw_dir: Path, name: str):
    staging = str(raw_dir) + "__stage__" + name
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    raw_dir.mkdir(parents=True, exist_ok=True)
    for i, p in enumerate(Path(staging).glob("*.parquet")):
        p.rename(raw_dir / f"{name}_{i}.parquet")


def _expected_snapshot_checks(snap_rows):
    by_key = {}
    for r in snap_rows:
        by_key.setdefault(r["measurement_id"], []).append(r)
    assert len(snap_rows) == 190
    assert all(len(v) == 1 for v in by_key.values()), "duplicate keys in snapshot"
    for i in range(10):
        assert by_key[f"MeasurementID-{100 + i}"][0]["measurement_value"] == Decimal(
            "100.00"
        )
    for i in range(10):
        assert f"MeasurementID-{200 + i}" not in by_key
    for i in range(90):
        assert f"MeasurementID-{210 + i}" in by_key


@pytest.mark.parametrize("single_commit", [False, True])
@pytest.mark.parametrize("storage_type", ["cow", "mor"])
def test_golden_cdc_merge(spark, tmp_path, storage_type, single_commit):
    # round 10: single-commit merge is atomic on BOTH storage types (a
    # MoR merge lands one mixed-marker delta under one commit)
    ctl = JobControl(**{**CONTROL, "hudi_storage_type": storage_type})
    raw = tmp_path / "raw" / ctl.db_name / ctl.schema_name / ctl.table_name
    pipe = CdcPipeline(
        spark, tmp_path / "raw", tmp_path / "curated", single_commit=single_commit
    )

    # --- run 1: initial load -------------------------------------------
    _write_raw(make_full_load_df(spark), raw, "LOAD00000001")
    res = pipe.process_table(ctl)
    assert res.mode == "initial"
    table = pipe._table(ctl)
    snap = table.read_snapshot()
    assert snap.count() == 100
    assert set(c.lower() for c in snap.columns) == {
        "measurement_id",
        "measurement_date_time",
        "measurement_value",
        "measurement_date",
    }

    # --- run 2: incremental CDC ----------------------------------------
    _write_raw(make_cdc_df(spark), raw, "CDC00000001")
    res = pipe.process_table(ctl)
    assert res.mode == "incremental"
    rows = [r.asDict() for r in table.read_snapshot().collect()]
    _expected_snapshot_checks(rows)

    # --- run 3: nothing new → noop (bookmark works) ---------------------
    res = pipe.process_table(ctl)
    assert res.mode == "noop"

    # --- idempotence: replay the same CDC file under a new name ---------
    _write_raw(make_cdc_df(spark), raw, "CDC00000001_replay")
    res = pipe.process_table(ctl)
    assert res.mode == "incremental"
    rows = [r.asDict() for r in table.read_snapshot().collect()]
    _expected_snapshot_checks(rows)


def test_split_upsert_routing(spark, tmp_path):
    """cdc_split_upsert=yes routes I via bulk_insert and U via upsert
    (C6, processData.py:348-366) — same end state, different commits."""
    ctl = JobControl(**{**CONTROL, "cdc_split_upsert": "yes"})
    raw = tmp_path / "raw" / ctl.db_name / ctl.schema_name / ctl.table_name
    pipe = CdcPipeline(spark, tmp_path / "raw", tmp_path / "curated")
    _write_raw(make_full_load_df(spark), raw, "LOAD1")
    pipe.process_table(ctl)
    _write_raw(make_cdc_df(spark), raw, "CDC1")
    res = pipe.process_table(ctl)
    actions = [c.action for c in res.commits]
    assert actions == ["bulk_insert", "upsert", "delete"]
    rows = [r.asDict() for r in pipe._table(ctl).read_snapshot().collect()]
    _expected_snapshot_checks(rows)


def test_control_store_roundtrip(tmp_path):
    store = ControlStore(tmp_path / "control.json")
    store.save([JobControl(**CONTROL)])
    recs = store.load("test_job")
    assert len(recs) == 1
    ctl = recs[0]
    assert ctl.is_composite_pk
    assert ctl.primary_keys == ["measurement_id", "measurement_date_time"]
    assert ctl.partition_keys == ["measurement_date"]
    assert ctl.catalog_db == "dl_msrmt_db_msrmt_schema"
    assert store.load("other_job") == []


def test_reset_replays_initial_load(spark, tmp_path):
    ctl = JobControl(**CONTROL)
    raw = tmp_path / "raw" / ctl.db_name / ctl.schema_name / ctl.table_name
    pipe = CdcPipeline(spark, tmp_path / "raw", tmp_path / "curated")
    _write_raw(make_full_load_df(spark), raw, "LOAD1")
    assert pipe.process_table(ctl).mode == "initial"
    pipe.reset_table(ctl)
    assert pipe.process_table(ctl).mode == "initial"
