"""Write-plan assembly — parity with the reference's config-dict machinery.

The reference builds 8 Hudi option dicts (``morConfig``, ``commonConfig``,
``multiPkConfig``, ``partitionDataConfig``, ``unpartitionDataConfig``,
``incrementalConfig``, ``insertConfig``, ``initLoadConfig``,
``deleteDataConfig`` — processData.py:146-223) and merges a scenario-
specific subset in three selector functions covering the 2³ combinations of
{partitioned?, composite-key?} × {initial | incremental | delete}
(processData.py:226-268). Later dicts win on key conflicts (``{**a, **b}``).

Here the same decision tree resolves to a single ``WritePlan`` the
NativeTable backend consumes directly — and, when a Hudi-compatible bundle
is ever on the classpath, ``to_hudi_options()`` emits the exact option
names the reference uses, so the plan is backend-portable.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from glue_hudi_spark.config import JobControl


@dataclass
class WritePlan:
    operation: str  # bulk_insert | insert | upsert | delete
    record_keys: list[str]
    precombine: str
    partition_keys: list[str]
    storage_type: str  # cow | mor
    parallelism: int
    retain_commits: int = 10
    compact_every: int = 20
    hive_style_partitioning: bool = True
    extra: dict = field(default_factory=dict)

    def to_hudi_options(self, table_name: str, database: str) -> dict[str, str]:
        """Emit the reference's Hudi option surface (processData.py:146-223)
        for use with ``df.write.format('hudi')`` when a compatible bundle
        exists. Option names match the reference exactly."""
        opts = {
            "hoodie.table.name": table_name,
            "hoodie.datasource.write.operation": self.operation,
            "hoodie.datasource.write.recordkey.field": ",".join(self.record_keys),
            "hoodie.datasource.write.precombine.field": self.precombine,
            "hoodie.cleaner.policy": "KEEP_LATEST_COMMITS",
            "hoodie.cleaner.commits.retained": str(self.retain_commits),
            "hoodie.consistency.check.enabled": "true",
            "hoodie.datasource.hive_sync.enable": "true",
            "hoodie.datasource.hive_sync.database": database,
            "hoodie.datasource.hive_sync.table": table_name,
            "hoodie.datasource.hive_sync.support_timestamp": "true",
        }
        if len(self.record_keys) > 1:  # multiPkConfig, processData.py:173-176
            opts["hoodie.datasource.write.keygenerator.class"] = (
                "org.apache.hudi.keygen.ComplexKeyGenerator"
            )
        if self.partition_keys:  # partitionDataConfig, processData.py:178-185
            opts["hoodie.datasource.write.partitionpath.field"] = ",".join(
                self.partition_keys
            )
            opts["hoodie.datasource.write.hive_style_partitioning"] = "true"
        else:  # unpartitionDataConfig, processData.py:187-191
            opts["hoodie.datasource.write.keygenerator.class"] = (
                "org.apache.hudi.keygen.NonpartitionedKeyGenerator"
            )
            opts["hoodie.datasource.hive_sync.partition_extractor_class"] = (
                "org.apache.hudi.hive.NonPartitionedExtractor"
            )
        if self.storage_type == "mor":  # morConfig, processData.py:150-155
            opts.update(
                {
                    "hoodie.datasource.write.storage.type": "MERGE_ON_READ",
                    "hoodie.compact.inline": "false",
                    "hoodie.compact.inline.max.delta.commits": str(self.compact_every),
                    "hoodie.parquet.small.file.limit": "0",
                }
            )
        if self.operation == "bulk_insert":  # initLoadConfig, processData.py:207-213
            opts["hoodie.bulkinsert.shuffle.parallelism"] = str(self.parallelism or 3)
            opts["hoodie.parquet.writelegacyformat.enabled"] = "true"
            opts["hoodie.parquet.outputtimestamptype"] = "TIMESTAMP_MICROS"
        elif self.operation in ("upsert", "delete"):  # incrementalConfig :193-199
            opts["hoodie.upsert.shuffle.parallelism"] = str(self.parallelism or 2)
        elif self.operation == "insert":  # insertConfig, processData.py:201-205
            opts["hoodie.insert.shuffle.parallelism"] = str(self.parallelism or 2)
        if self.operation == "delete":  # deleteDataConfig, processData.py:215-218
            opts["hoodie.datasource.write.payload.class"] = (
                "org.apache.hudi.common.model.EmptyHoodieRecordPayload"
            )
        opts.update(self.extra)
        return opts


def build_write_plan(ctl: JobControl, scenario: str) -> WritePlan:
    """The three selectors (processData.py:226-268) collapsed to one.

    ``scenario``: ``initial`` → bulk_insert; ``incremental`` → upsert;
    ``delete`` → delete; ``insert`` → plain insert.
    """
    op = {
        "initial": "bulk_insert",
        "incremental": "upsert",
        "delete": "delete",
        "insert": "insert",
    }[scenario]
    parallelism = (
        ctl.bulkinsert_parallelism if op == "bulk_insert" else ctl.upsert_parallelism
    )
    return WritePlan(
        operation=op,
        record_keys=ctl.primary_keys,
        precombine=ctl.precombine_field,
        partition_keys=ctl.partition_keys,
        storage_type=ctl.hudi_storage_type.lower(),
        parallelism=parallelism,
    )
