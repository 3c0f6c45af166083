"""Multi-table driver loop (C1) + DMS envelope tolerance.

The reference iterates all control records per run (processData.py:393-402)
and drops the general DMS envelope — including ``db`` and ``schema_name``
columns its sample data never carries (processData.py:334). Both paths get
explicit coverage here.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from glue_hudi_spark.config import ControlStore, JobControl
from glue_hudi_spark.pipeline import CdcPipeline
from tests.fixtures_cdc import CONTROL, make_cdc_df, make_full_load_df


def _land(df, raw_dir: Path, name: str):
    stage = str(raw_dir) + "__s__" + name
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    raw_dir.mkdir(parents=True, exist_ok=True)
    for i, p in enumerate(Path(stage).glob("*.parquet")):
        p.rename(raw_dir / f"{name}_{i}.parquet")


def test_run_processes_all_control_records(spark, tmp_path):
    """One run() call ingests every managed table — one CoW, one MoR."""
    ctl_a = JobControl(**{**CONTROL, "table_name": "tbl_cow"})
    ctl_b = JobControl(
        **{**CONTROL, "table_name": "tbl_mor", "hudi_storage_type": "mor"}
    )
    store = ControlStore(tmp_path / "control.json")
    store.save([ctl_a, ctl_b])

    pipe = CdcPipeline(spark, tmp_path / "raw", tmp_path / "curated")
    for ctl in (ctl_a, ctl_b):
        _land(
            make_full_load_df(spark),
            tmp_path / "raw" / ctl.db_name / ctl.schema_name / ctl.table_name,
            "LOAD1",
        )
    results = pipe.run(store, "test_job")
    assert [r.mode for r in results] == ["initial", "initial"]

    for ctl in (ctl_a, ctl_b):
        _land(
            make_cdc_df(spark),
            tmp_path / "raw" / ctl.db_name / ctl.schema_name / ctl.table_name,
            "CDC1",
        )
    results = pipe.run(store, "test_job")
    assert [r.mode for r in results] == ["incremental", "incremental"]
    for ctl in (ctl_a, ctl_b):
        assert pipe._table(ctl).read_snapshot().count() == 190

    # MoR registered both _ro and _rt views (hive-sync parity)
    assert spark.catalog.tableExists("dl_msrmt_db_msrmt_schema_tbl_mor_rt")
    assert spark.catalog.tableExists("dl_msrmt_db_msrmt_schema_tbl_mor_ro")


def test_envelope_db_schema_columns_dropped(spark, tmp_path):
    """CDC batches carrying the full DMS envelope (db, schema_name) must
    merge cleanly and the snapshot must not contain envelope columns."""
    ctl = JobControl(**{**CONTROL, "table_name": "tbl_env"})
    raw = tmp_path / "raw" / ctl.db_name / ctl.schema_name / ctl.table_name
    pipe = CdcPipeline(spark, tmp_path / "raw", tmp_path / "curated")

    _land(make_full_load_df(spark), raw, "LOAD1")
    pipe.process_table(ctl)

    cdc_env = (
        make_cdc_df(spark)
        .withColumn("db", F.lit("SRC_DB"))
        .withColumn("SCHEMA_NAME", F.lit("SRC_SCHEMA"))
    )
    _land(cdc_env, raw, "CDC1")
    res = pipe.process_table(ctl)
    assert res.mode == "incremental"

    snap = pipe._table(ctl).read_snapshot()
    assert snap.count() == 190
    assert {"db", "schema_name", "op", "transaction_id", "seq_by_pk"}.isdisjoint(
        {c.lower() for c in snap.columns}
    )


def test_uppercase_landing_dir_is_ingested(spark, tmp_path):
    """DMS may land files under the UPPERCASE table-dir spelling; the scan
    probes both (processData.py:286-289) — files in MSRMT_TABLE/ must not be
    silently skipped."""
    ctl = JobControl(**{**CONTROL, "table_name": "case_tbl"})
    store = ControlStore(tmp_path / "control.json")
    store.save([ctl])
    pipe = CdcPipeline(spark, tmp_path / "raw", tmp_path / "curated")

    upper = tmp_path / "raw" / ctl.db_name / ctl.schema_name / "CASE_TBL"
    _land(make_full_load_df(spark), upper, "LOAD1")
    results = pipe.run(store, "test_job")
    assert [r.mode for r in results] == ["initial"]
    assert pipe._table(ctl).read_snapshot().count() == 100

    # CDC lands in the lowercase dir — both spellings feed one ledger
    lower = tmp_path / "raw" / ctl.db_name / ctl.schema_name / "case_tbl"
    _land(make_cdc_df(spark), lower, "CDC1")
    results = pipe.run(store, "test_job")
    assert [r.mode for r in results] == ["incremental"]
    assert pipe._table(ctl).read_snapshot().count() == 190

    # nothing new -> noop (UPPER files are in the ledger, not re-read)
    assert [r.mode for r in pipe.run(store, "test_job")] == ["noop"]


def test_run_parallel_matches_sequential(spark, tmp_path):
    """parallel=3 over 3 independent tables converges to the same
    snapshots as the sequential loop (thread-pool + Spark's concurrent
    job scheduling; per-table roots/bookmarks/OCC keep them isolated)."""
    ctls = [
        JobControl(**{**CONTROL, "table_name": f"tbl_p{i}",
                      **({"hudi_storage_type": "mor"} if i == 1 else {})})
        for i in range(3)
    ]
    store = ControlStore(tmp_path / "control.json")
    store.save(ctls)
    pipe = CdcPipeline(spark, tmp_path / "raw", tmp_path / "curated")

    for ctl in ctls:
        _land(make_full_load_df(spark),
              tmp_path / "raw" / ctl.db_name / ctl.schema_name / ctl.table_name,
              "LOAD1")
    results = pipe.run(store, "test_job", parallel=3)
    assert [r.mode for r in results] == ["initial"] * 3

    for ctl in ctls:
        _land(make_cdc_df(spark),
              tmp_path / "raw" / ctl.db_name / ctl.schema_name / ctl.table_name,
              "CDC1")
    results = pipe.run(store, "test_job", parallel=3)
    assert [r.mode for r in results] == ["incremental"] * 3
    for ctl in ctls:
        snap = pipe._table(ctl).read_snapshot()
        assert snap.count() == 190, ctl.table_name
