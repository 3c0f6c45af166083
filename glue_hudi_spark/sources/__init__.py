"""Sources: incremental parquet batch scan with a processed-file ledger
(the role of Glue job bookmarks, reference processData.py:293-298)."""

from glue_hudi_spark.sources.batch import BookmarkedScan

__all__ = ["BookmarkedScan"]
