"""Session-catalog operations — S11 in SURVEY §2.1.

The reference probes/creates a Glue Data Catalog database per table
(``getCatalogDb``/``get_database``/``create_database``/``get_table``,
processData.py:57-97) and drives its initial-vs-incremental branch off the
table-existence check (processData.py:134-140). Here the same surface maps
to ``spark.catalog`` / SQL DDL against the session catalog (works the same
against a real Hive metastore when one is configured).

``NativeTable.exists()`` is the storage-level truth used by the pipeline;
these helpers provide the catalog-level registration the reference's
hive-sync produced, so downstream SQL users can query curated tables by
name (``SELECT … FROM dl_db_schema.table``).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from glue_hudi_spark.config import JobControl
from glue_hudi_spark.storage.native import NativeTable


def ensure_database(spark: SparkSession, name: str) -> bool:
    """Create the database if absent (processData.py:57-76). Returns True
    if it already existed."""
    existed = spark.catalog.databaseExists(name)
    if not existed:
        spark.sql(f"CREATE DATABASE IF NOT EXISTS `{name}`")
    return existed


def table_exists(spark: SparkSession, database: str, table: str) -> bool:
    """The initial-load probe (processData.py:79-97,134-140)."""
    return spark.catalog.tableExists(f"`{database}`.`{table}`")


def save_bucketed_table(
    spark: SparkSession,
    df,
    name: str,
    bucket_cols: list[str],
    num_buckets: int = 16,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist a DataFrame as a bucketed+sorted catalog table.

    Bucketing is the shuffle-avoidance tool for *repeated* big joins: two
    tables bucketed on the join key with the same bucket count join with
    ZERO Exchange operators (verified in tests by plan inspection) — at
    100 TB that's the difference between re-shuffling terabytes per query
    and a local merge per bucket. Use for dimension/fact tables that are
    written once and joined often; the NativeTable CDC path keeps its own
    manifest format (bucketing requires the session catalog's table
    format).
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    writer.saveAsTable(name)


def register_snapshot(
    spark: SparkSession,
    ctl: JobControl,
    table: NativeTable,
    as_of: int | None = None,
    durable: bool = True,
) -> str:
    """Register the current snapshot — the role of Hudi hive-sync
    (processData.py:160-169). MoR registers both ``<name>_ro`` and
    ``<name>_rt`` (processData.py:131-132). Two registrations happen:

    * flat temp views (``dl_db_schema_table[_ro|_rt]``) — fast, exact
      (manifest file list, schema from the manifest), session-scoped;
    * a DURABLE external table ``dl_<db>_<schema>.<table>`` over the
      exported snapshot dir (``NativeTable.export_snapshot``) — real
      catalog DDL, so with a persistent metastore (``get_spark(...,
      hive_metastore_dir=...)``) curated tables survive the session and
      any later session/engine can query them without this library.
      For MoR the durable table is the read-optimized view (``<table>_ro``)
      — exactly what Hudi's hive-sync exposes as plain parquet; the
      real-time view needs merge logic and stays session-registered.
    """
    ensure_database(spark, ctl.catalog_db)
    base = f"{ctl.catalog_db}_{ctl.table_name}"
    if ctl.is_mor:
        table.register_view(f"{base}_ro", view="read_optimized", as_of=as_of)
        table.register_view(f"{base}_rt", view="snapshot", as_of=as_of)
        out = f"{base}_rt"
    else:
        table.register_view(base, as_of=as_of)
        out = base
    # durable registration tracks the LATEST snapshot only; durable=False
    # skips the export entirely (object-store deployments — see
    # NativeTable.export_snapshot)
    if as_of is None and durable:
        sync_external_table(spark, ctl, table)
    return out


def sync_external_table(spark: SparkSession, ctl: JobControl, table: NativeTable) -> str:
    """Create/refresh the durable external table over the exported snapshot.

    The snapshot dir path is stable across commits (hardlinks are swapped
    in place), so after the first CREATE only a REFRESH TABLE (file-listing
    cache invalidation) is needed — unless the schema evolved, in which
    case the table is re-created with the manifest's current schema. DDL
    carries an explicit column list: the dir can contain files written
    under older schemas, and inference from a random file would be wrong.
    """
    import json

    from pyspark.sql import types as T

    snap_dir = table.export_snapshot()
    commit = table.timeline.latest()
    schema = T.StructType.fromJson(json.loads(commit.schema_json))
    ddl_cols = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields
    )
    fq = f"`{ctl.catalog_db}`.`{ctl.catalog_table}`"
    create = (
        f"CREATE TABLE {fq} ({ddl_cols}) USING PARQUET "
        f"LOCATION '{snap_dir}'"
    )
    if spark.catalog.tableExists(fq):
        existing = spark.table(fq).schema
        # compare names+types only: the manifest schema carries
        # non-nullable meta columns (F.lit) while DDL-created tables are
        # all-nullable, so a strict == never matches and every commit
        # would drop+recreate — a window where concurrent readers of the
        # durable table error (round-2 ADVICE)
        if [(f.name, f.dataType) for f in existing.fields] == [
            (f.name, f.dataType) for f in schema.fields
        ]:
            spark.sql(f"REFRESH TABLE {fq}")
            return fq
        spark.sql(f"DROP TABLE {fq}")
    spark.sql(create)
    return fq
