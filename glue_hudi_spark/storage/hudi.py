"""HudiBackend — thin passthrough to the native Hudi Spark connector.

SURVEY §7.0: the public table API has two backends. ``NativeTable`` (the
default, pure PySpark) reproduces Hudi's observable semantics; this class
is the passthrough for environments that DO have a compatible
``hudi-spark-bundle`` on the classpath, emitting exactly the option surface
the reference uses (via ``plans.write_config.WritePlan.to_hudi_options`` —
option names cited to processData.py:146-223 there).

No Hudi release supports Spark 4 at the time of writing (the reference pins
``hudi-spark-bundle_2.11-0.10.1`` for Spark 2.4, glue-stack.ts:38), so in
this container ``is_available()`` is False and every operation raises with
a pointer to the native backend. The class still defines the full surface
so the two backends stay drop-in interchangeable.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from glue_hudi_spark.config import JobControl
from glue_hudi_spark.plans.write_config import build_write_plan


def is_available(spark: SparkSession) -> bool:
    """True if a Hudi Spark bundle is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.hudi.DefaultSource"
        )
        return True
    except Exception:
        return False


class HudiBackend:
    """Same public surface as NativeTable, delegated to the Hudi connector."""

    def __init__(self, spark: SparkSession, path: str | Path, ctl: JobControl):
        self.spark = spark
        self.path = str(path)
        self.ctl = ctl
        if not is_available(spark):
            raise RuntimeError(
                "no Hudi Spark bundle on the classpath (none exists for "
                "Spark 4.x); use glue_hudi_spark.storage.NativeTable — same "
                "API, same observable semantics"
            )

    # -- writes (processData.py:337-382) ---------------------------------

    def _write(self, df: DataFrame, scenario: str) -> None:
        plan = build_write_plan(self.ctl, scenario)
        opts = plan.to_hudi_options(
            table_name=self.ctl.catalog_table, database=self.ctl.catalog_db
        )
        (
            df.write.format("org.apache.hudi")
            .options(**opts)
            .mode("Append")
            .save(self.path)
        )

    def bulk_insert(self, df: DataFrame, parallelism: int = 0) -> None:
        self._write(df, "initial")

    def insert(self, df: DataFrame) -> None:
        self._write(df, "insert")

    def upsert(self, df: DataFrame, parallelism: int = 0) -> None:
        self._write(df, "incremental")

    def delete(self, df: DataFrame, parallelism: int = 0) -> None:
        self._write(df, "delete")

    # -- reads -------------------------------------------------------------

    def read_snapshot(self, view: str = "snapshot") -> DataFrame:
        reader = self.spark.read.format("org.apache.hudi")
        if view == "read_optimized":
            reader = reader.option("hoodie.datasource.query.type", "read_optimized")
        return reader.load(self.path)

    def exists(self) -> bool:
        return Path(self.path, ".hoodie").is_dir()


def open_table(spark: SparkSession, curated_root: str | Path, ctl: JobControl):
    """Backend selector: Hudi connector when present, NativeTable otherwise
    — the TableFormat dispatch SURVEY §7.0 prescribes."""
    from glue_hudi_spark.storage.native import NativeTable

    path = Path(curated_root) / ctl.db_name / ctl.schema_name / ctl.table_name
    if is_available(spark):
        return HudiBackend(spark, path, ctl)
    return NativeTable.for_control(spark, curated_root, ctl)
