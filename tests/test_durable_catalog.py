"""Durable catalog registration (hive-sync parity, S8 in SURVEY §2.1).

The reference's hive-sync creates REAL Glue Data Catalog tables that any
engine can query later (processData.py:160-169). Here the equivalent is an
external table over the exported snapshot dir; durability comes from a
persistent (Derby-backed) metastore. The cross-session test runs in a
subprocess because one JVM/driver can hold only one SparkSession at a time
and Derby takes an exclusive lock per process.
"""

from __future__ import annotations

import subprocess
import sys

DRIVE = r"""
import sys, json
sys.path.insert(0, "/root/repo")
from glue_hudi_spark.session import get_spark
from glue_hudi_spark.pipeline import CdcPipeline
from glue_hudi_spark.config import JobControl
from tests.fixtures_cdc import CONTROL, make_full_load_df, make_cdc_df

root = sys.argv[1]
meta = f"{root}/metastore"
ctl = JobControl(**CONTROL)

# --- session 1: run the pipeline, registration happens as part of sync ---
spark = get_spark(app_name="durable1", master="local[2]",
                  shuffle_partitions=4, hive_metastore_dir=meta)
pipe = CdcPipeline(spark, f"{root}/raw", f"{root}/curated")
raw = pipe._raw_dir(ctl)
raw.mkdir(parents=True, exist_ok=True)
make_full_load_df(spark).coalesce(1).write.mode("append").parquet(str(raw / "full"))
pipe.process_table(ctl)
make_cdc_df(spark).coalesce(1).write.mode("append").parquet(str(raw / "cdc"))
pipe.process_table(ctl)
n1 = spark.sql("SELECT COUNT(*) AS c FROM dl_msrmt_db_msrmt_schema.msrmt_table").first().c
print(f"SESSION1-COUNT={n1}", flush=True)
spark.stop()

# --- session 2: fresh session, same metastore — NO pipeline re-run ---
spark2 = get_spark(app_name="durable2", master="local[2]",
                   shuffle_partitions=4, hive_metastore_dir=meta)
df = spark2.sql(
    "SELECT COUNT(*) AS c FROM dl_msrmt_db_msrmt_schema.msrmt_table"
)
print(f"SESSION2-COUNT={df.first().c}", flush=True)
val = spark2.sql(
    "SELECT COUNT(*) AS c FROM dl_msrmt_db_msrmt_schema.msrmt_table "
    "WHERE measurement_value = 100.00"
).first().c
print(f"SESSION2-UPDATED={val}", flush=True)
spark2.stop()
"""


def test_refresh_fast_path_no_recreate(spark, tmp_path, monkeypatch):
    """Same-schema re-sync must take the REFRESH path — the round-2 strict
    schema == (nullability included) never matched, so every commit dropped
    and recreated the external table, a visibility window for concurrent
    readers."""
    from pyspark.sql import Row

    from glue_hudi_spark.catalog import ensure_database, sync_external_table
    from glue_hudi_spark.config import JobControl
    from glue_hudi_spark.storage.native import NativeTable

    ctl = JobControl(db_name="refreshdb", schema_name="s", table_name="t",
                     primary_key="id", precombine_field="seq")
    t = NativeTable(spark, tmp_path / "tbl", record_keys=["id"], precombine="seq")
    t.bulk_insert(spark.createDataFrame([Row(id=1, v="a", seq=1)]))
    ensure_database(spark, ctl.catalog_db)
    sync_external_table(spark, ctl, t)

    t.upsert(spark.createDataFrame([Row(id=2, v="b", seq=1)]))
    calls = []
    real_sql = spark.sql
    monkeypatch.setattr(
        spark, "sql", lambda q, *a, **k: (calls.append(q), real_sql(q, *a, **k))[1]
    )
    sync_external_table(spark, ctl, t)
    assert any(q.startswith("REFRESH TABLE") for q in calls), calls
    assert not any(q.startswith(("DROP", "CREATE TABLE")) for q in calls), calls
    monkeypatch.undo()
    fq = f"`{ctl.catalog_db}`.`{ctl.catalog_table}`"
    assert spark.sql(f"SELECT COUNT(*) c FROM {fq}").first().c == 2
    spark.sql(f"DROP TABLE {fq}")
    spark.sql(f"DROP DATABASE `{ctl.catalog_db}`")


def test_second_session_sees_curated_table(tmp_path):
    script = tmp_path / "drive.py"
    script.write_text(DRIVE)
    proc = subprocess.run(
        [sys.executable, str(script), str(tmp_path)],
        capture_output=True,
        text=True,
        timeout=600,
        cwd="/root/repo",
    )
    out = proc.stdout
    assert proc.returncode == 0, f"drive failed:\n{proc.stdout}\n{proc.stderr[-3000:]}"
    assert "SESSION1-COUNT=190" in out
    assert "SESSION2-COUNT=190" in out, out
    assert "SESSION2-UPDATED=10" in out, out
