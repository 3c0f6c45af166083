"""Job-control records — the engine's per-table configuration.

The reference stores one control record per managed table in DynamoDB
(prereq-stack.ts:73-77) loaded from ``scripts/config/control_file.json`` and
fetched per job run (processData.py:43-54). The record drives everything:
key columns, precombine field, partitioning, storage type, and the
split-upsert routing flag.

Here the control store is a plain JSON file — same record shape, no
distributed store needed (SURVEY §1.1.4). Enrichment rules mirror
``enrichJobControlProperties`` (processData.py:101-142): composite-key
detection via ``;`` separators, MoR read-optimized table naming
(``<name>_ro``), and the initial-load probe.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path


@dataclass
class JobControl:
    """One managed table's configuration.

    Field names mirror control_file.json:2-15 (snake_case there too).
    ``primary_key`` / ``partition_key`` accept the reference's ``;``-separated
    composite syntax (processData.py:109,122) and are normalized to lists.
    """

    db_name: str
    schema_name: str
    table_name: str
    primary_key: str  # ';'-separated composite allowed
    precombine_field: str
    partition_key: str = ""  # '' → unpartitioned (processData.py:115-128)
    hudi_storage_type: str = "cow"  # 'cow' | 'mor' (control_file.json:8)
    glue_job_name: str = "local"
    dms_full_load_partitioned: str = "no"
    hudi_bulkinsert_shuffle_parallelism: str = "0"  # 0 → let AQE decide
    hudi_upsert_shuffle_parallelism: str = "0"
    cdc_split_upsert: str = "no"  # 'yes' → route I via bulk_insert (C6)
    # table-tuning extensions (absent from the reference's control file;
    # defaults preserve old control JSONs byte-for-byte):
    stats_cols: str = ""  # ';'-separated → column-stats index for reads
    files_per_partition: str = "0"  # 0 → unset (writer-default clustering)
    bloom_index: str = "no"  # 'yes' → per-file record-key blooms
    change_feed: str = "no"  # 'yes' → delete tombstones for the change feed (Delta CDF-style opt-in)
    deletion_vectors: str = "no"  # 'yes' → deletes mark positions (Delta DV class), no file rewrite
    # ';'-separated non-key columns to secondary-bloom-index (equality
    # lookups via NativeTable.read_by_value prune files by value set)
    secondary_bloom_cols: str = ""
    # data-quality gate applied to every raw batch BEFORE dedup/merge
    # (operators.expectations.parse_rules syntax, e.g.
    # "not_null:id;values:op:I|U|D;range:value:0:1e9"); a violating batch
    # raises QualityGateError and leaves the bookmark unadvanced
    quality_gate: str = ""
    # raw landing format: parquet (default, the reference's DMS output),
    # csv (headered, schema-inferred), or json (JSON-lines)
    raw_format: str = "parquet"

    # --- enriched (derived) properties, processData.py:101-142 ---

    @property
    def primary_keys(self) -> list[str]:
        return [c.strip() for c in self.primary_key.split(";") if c.strip()]

    @property
    def is_composite_pk(self) -> bool:
        return len(self.primary_keys) > 1

    @property
    def partition_keys(self) -> list[str]:
        return [c.strip() for c in self.partition_key.split(";") if c.strip()]

    @property
    def is_partitioned(self) -> bool:
        return bool(self.partition_keys)

    @property
    def is_mor(self) -> bool:
        return self.hudi_storage_type.lower() == "mor"

    @property
    def split_upsert(self) -> bool:
        return self.cdc_split_upsert.lower() == "yes"

    @property
    def catalog_db(self) -> str:
        """``dl_<db>_<schema>`` lowercased (processData.py:276)."""
        return f"dl_{self.db_name}_{self.schema_name}".lower()

    @property
    def catalog_table(self) -> str:
        """MoR registers the read-optimized view as ``<name>_ro``
        (processData.py:131-132); CoW uses the bare name."""
        return f"{self.table_name}_ro" if self.is_mor else self.table_name

    @property
    def bulkinsert_parallelism(self) -> int:
        return int(self.hudi_bulkinsert_shuffle_parallelism or 0)

    @property
    def upsert_parallelism(self) -> int:
        return int(self.hudi_upsert_shuffle_parallelism or 0)

    def validate(self) -> None:
        if not self.primary_keys:
            raise ValueError(f"{self.table_name}: primary_key is required")
        if self.hudi_storage_type.lower() not in ("cow", "mor"):
            raise ValueError(
                f"{self.table_name}: hudi_storage_type must be cow|mor, "
                f"got {self.hudi_storage_type!r}"
            )


@dataclass
class ControlStore:
    """JSON-file control store (replaces DynamoDB, S9/S10 in SURVEY §2.1).

    File shape: ``[{JobControl fields…}, …]`` — same items
    ``scripts/loadControlData.py:10-14`` put into DynamoDB.
    """

    path: str | Path
    _records: list[JobControl] = field(default_factory=list)

    def load(self, glue_job_name: str | None = None) -> list[JobControl]:
        """Fetch control records, optionally filtered by job name — mirrors
        the DynamoDB KeyConditionExpression query (processData.py:48-53)."""
        raw = json.loads(Path(self.path).read_text())
        if isinstance(raw, dict):  # tolerate {"items": [...]}
            raw = raw.get("items", [])
        known = {f for f in JobControl.__dataclass_fields__}
        recs = [
            JobControl(**{k: v for k, v in item.items() if k in known})
            for item in raw
        ]
        for r in recs:
            r.validate()
        if glue_job_name is not None:
            recs = [r for r in recs if r.glue_job_name == glue_job_name]
        self._records = recs
        return recs

    def save(self, records: list[JobControl]) -> None:
        """Write records back (replaces loadControlData.py's put_item loop)."""
        items = [
            {k: getattr(r, k) for k in JobControl.__dataclass_fields__}
            for r in records
        ]
        Path(self.path).write_text(json.dumps(items, indent=2))
