"""HudiBackend dispatch: in this container no Hudi bundle exists, so the
selector must fall back to NativeTable and the passthrough must refuse
cleanly with an actionable message."""

from __future__ import annotations

import pytest

from glue_hudi_spark.config import JobControl
from glue_hudi_spark.plans.write_config import build_write_plan
from glue_hudi_spark.storage import hudi
from glue_hudi_spark.storage.native import NativeTable
from tests.fixtures_cdc import CONTROL


def test_selector_falls_back_to_native(spark, tmp_path):
    assert hudi.is_available(spark) is False
    t = hudi.open_table(spark, tmp_path, JobControl(**CONTROL))
    assert isinstance(t, NativeTable)


def test_backend_refuses_without_bundle(spark, tmp_path):
    with pytest.raises(RuntimeError, match="NativeTable"):
        hudi.HudiBackend(spark, tmp_path, JobControl(**CONTROL))


def test_write_plan_emits_reference_option_surface():
    ctl = JobControl(**CONTROL)
    opts = build_write_plan(ctl, "initial").to_hudi_options("msrmt_table", "dl_db")
    assert opts["hoodie.datasource.write.operation"] == "bulk_insert"
    assert opts["hoodie.datasource.write.recordkey.field"] == (
        "measurement_id,measurement_date_time"
    )
    assert opts["hoodie.datasource.write.keygenerator.class"].endswith(
        "ComplexKeyGenerator"
    )
    assert opts["hoodie.datasource.write.hive_style_partitioning"] == "true"
    assert opts["hoodie.parquet.outputtimestamptype"] == "TIMESTAMP_MICROS"

    opts = build_write_plan(ctl, "delete").to_hudi_options("msrmt_table", "dl_db")
    assert opts["hoodie.datasource.write.payload.class"].endswith(
        "EmptyHoodieRecordPayload"
    )
    assert opts["hoodie.cleaner.commits.retained"] == "10"

    mor = JobControl(**{**CONTROL, "hudi_storage_type": "mor"})
    opts = build_write_plan(mor, "incremental").to_hudi_options("t", "d")
    assert opts["hoodie.datasource.write.storage.type"] == "MERGE_ON_READ"
    assert opts["hoodie.compact.inline.max.delta.commits"] == "20"
    assert opts["hoodie.parquet.small.file.limit"] == "0"
