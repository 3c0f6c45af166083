"""Config-driven pipeline quality gate: clean batches pass, violating
batches raise BEFORE any write and BEFORE the bookmark advances (so the
same files retry after the data or the gate is fixed)."""

from __future__ import annotations

from pathlib import Path

import pytest

from glue_hudi_spark.config import JobControl
from glue_hudi_spark.operators.expectations import QualityGateError, parse_rules
from glue_hudi_spark.pipeline import CdcPipeline
from tests.fixtures_cdc import CONTROL, make_cdc_df, make_full_load_df


def _land(df, raw_dir: Path, name: str):
    stage = str(raw_dir) + "__s__" + name
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    raw_dir.mkdir(parents=True, exist_ok=True)
    for i, p in enumerate(Path(stage).glob("*.parquet")):
        p.rename(raw_dir / f"{name}_{i}.parquet")


def _ctl(**extra):
    return JobControl(**{**CONTROL, **extra})


def test_parse_rules_syntax():
    rules = parse_rules(
        "not_null:id;values:op:I|U|D;range:measurement_value:0:1e9")
    assert [r.kind for r in rules] == ["not_null", "accepted_values", "in_range"]
    with pytest.raises(ValueError):
        parse_rules("unique:id")  # not a raw-batch rule
    with pytest.raises(ValueError):
        parse_rules("range:x:1")  # missing bound


def test_gate_passes_clean_batches_and_blocks_bad_ones(spark, tmp_path):
    ctl = _ctl(quality_gate="not_null:measurement_id;"
                            "range:measurement_value:0:1000")
    raw = tmp_path / "raw" / ctl.db_name / ctl.schema_name / ctl.table_name
    pipe = CdcPipeline(spark, tmp_path / "raw", tmp_path / "curated",
                       sync_catalog=False)

    _land(make_full_load_df(spark), raw, "LOAD1")
    assert pipe.process_table(ctl).mode == "initial"

    # CDC batch passes the sane gate
    _land(make_cdc_df(spark), raw, "CDC1")
    res = pipe.process_table(ctl)
    assert res.mode == "incremental"
    assert pipe._table(ctl).read_snapshot().count() == 190

    # a batch violating the range gate is rejected before any write
    tight = _ctl(quality_gate="range:measurement_value:0:1.0")
    _land(make_cdc_df(spark), raw, "CDC2")
    n_commits = len(pipe._table(ctl).timeline.history())
    with pytest.raises(QualityGateError) as ei:
        pipe.process_table(tight)
    assert "range_measurement_value" in str(ei.value)
    assert len(pipe._table(ctl).timeline.history()) == n_commits

    # bookmark did NOT advance: relaxing the gate processes the SAME files
    res = pipe.process_table(ctl)
    assert res.mode == "incremental"


def test_gate_off_by_default(spark, tmp_path):
    ctl = _ctl()
    assert ctl.quality_gate == ""
    raw = tmp_path / "raw" / ctl.db_name / ctl.schema_name / ctl.table_name
    pipe = CdcPipeline(spark, tmp_path / "raw", tmp_path / "curated",
                       sync_catalog=False)
    _land(make_full_load_df(spark), raw, "LOAD1")
    assert pipe.process_table(ctl).mode == "initial"
