"""Bookmarked batch scan — S1 in SURVEY §2.1.

The reference reads all parquet under ``raw/<db>/<schema>/<table>/``
(probing both lower- and UPPER-case path spellings, processData.py:286-289)
through a Glue DynamicFrame whose ``transformation_ctx`` + job bookmark
ensures each file is read by at most one successful run
(processData.py:293-298, glue-stack.ts:51). That is what turns run 2 into an
incremental load.

Here the bookmark is an explicit *processed-file ledger*: a JSON file next
to the table listing every data file a successful run has consumed. A scan
lists the raw dir, anti-joins (driver-side, it's metadata) against the
ledger, and reads only the remainder. ``commit()`` is called after the
downstream write succeeds — same at-least-once-per-file, at-most-once-on-
success contract as Glue bookmarks.

At 100 TB the file listing is the scale concern, not the data: listing is
O(files) driver metadata, the ledger is append-only JSON. (For streaming
arrival, ``glue_hudi_spark.streaming`` offers the Structured Streaming file
source whose checkpoint subsumes this ledger.)
"""

from __future__ import annotations

import json
import os
import tempfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


_FORMATS = {
    # fmt -> (glob suffixes, reader)
    "parquet": ((".parquet",), lambda spark, files: spark.read.parquet(*files)),
    "csv": ((".csv", ".csv.gz"), lambda spark, files: spark.read.options(
        header="true", inferSchema="true").csv(list(files))),
    "json": ((".json", ".jsonl", ".json.gz"), lambda spark, files:
        spark.read.json(list(files))),
    # ORC ships in Spark core (no external package, unlike avro) —
    # the columnar landing format DMS/Flink sinks commonly emit
    "orc": ((".orc",), lambda spark, files: spark.read.orc(*files)),
}


class BookmarkedScan:
    """Incremental file reader over a raw landing directory.

    ``fmt`` widens the source surface beyond the reference's
    DMS-lands-parquet assumption: CSV (headered, schema-inferred) and
    JSON-lines land files work through the SAME ledger contract — the
    bookmark tracks files, not bytes, so the format only changes the
    reader. Schema inference is per-batch; the downstream NativeTable's
    schema-evolution path absorbs drift between batches exactly as it
    does for parquet.
    """

    def __init__(self, spark: SparkSession,
                 raw_dir: str | Path | list[str | Path],
                 ledger_path: str | Path | None = None,
                 fmt: str = "parquet"):
        dirs = raw_dir if isinstance(raw_dir, (list, tuple)) else [raw_dir]
        self.spark = spark
        self.raw_dirs = [Path(d) for d in dirs]
        self.raw_dir = self.raw_dirs[0]  # primary (lowercase) spelling
        self.ledger_path = Path(ledger_path or (self.raw_dir / "_processed_files.json"))
        if fmt not in _FORMATS:
            raise ValueError(
                f"unsupported raw format {fmt!r} (choose from {sorted(_FORMATS)})")
        self.fmt = fmt
        self._pending: list[str] = []

    # the reference probes lowercase and UPPERCASE spellings of the table
    # path (processData.py:286-289); on a case-sensitive FS we check both.
    # The lowercase spelling is always returned (even if absent yet) so a
    # ledger/default path exists; the UPPER variant joins when present.
    @staticmethod
    def candidate_dirs(base: str | Path, *parts: str) -> list[Path]:
        base = Path(base)
        primary = base.joinpath(*parts[:-1], parts[-1].lower())
        dirs = [primary]
        upper = base.joinpath(*parts[:-1], parts[-1].upper())
        if upper != primary and upper.is_dir():
            dirs.append(upper)
        return dirs

    def _processed(self) -> set[str]:
        if self.ledger_path.exists():
            return set(json.loads(self.ledger_path.read_text()))
        return set()

    def list_unprocessed(self) -> list[str]:
        seen = self._processed()
        suffixes = _FORMATS[self.fmt][0]
        files = sorted(
            str(p)
            for d in self.raw_dirs
            if d.is_dir()
            for p in d.rglob("*")
            if p.is_file()
            and p.name.lower().endswith(suffixes)
            and not p.name.startswith("_")
            and str(p) not in seen
        )
        return files

    def read_batch(self) -> DataFrame | None:
        """Read all not-yet-processed files; None if nothing new."""
        self._pending = self.list_unprocessed()
        if not self._pending:
            return None
        return _FORMATS[self.fmt][1](self.spark, self._pending)

    def commit(self) -> None:
        """Mark the last read batch processed (atomic ledger swap). Call
        only after the downstream table write committed."""
        if not self._pending:
            return
        done = sorted(self._processed() | set(self._pending))
        self.ledger_path.parent.mkdir(parents=True, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=self.ledger_path.parent, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(done, f)
        os.rename(tmp, self.ledger_path)
        self._pending = []

    def reset(self) -> None:
        """Forget bookmark state — the replay path (resetForInitialLoad.sh)."""
        if self.ledger_path.exists():
            self.ledger_path.unlink()
        self._pending = []
