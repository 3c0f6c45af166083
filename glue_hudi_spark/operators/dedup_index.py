"""Persisted dedup index over a NativeTable text column.

The scale path for arrival-time corpus dedup: ``incremental_exact``
re-hashes the ENTIRE corpus text per batch — correct, but at 100 TB that
is a full-corpus scan per micro-batch. This index materializes the
corpus's dedup fingerprints ONCE and maintains them off the table's
change feed:

* ``build()`` writes one store under ``<table>/_index/dedup/store/``:
  per doc, its normalized content hash (exact dedup) and its banded
  MinHash rows (near-dup candidates) — (id, h, band, band_hash) rows
  hive-partitioned by a stable id bucket. The store holds HASHES ONLY:
  probing never touches corpus text.
* ``probe(batch)`` returns the batch rows that are NOVEL: no exact hash
  match against the store, no verified near-duplicate (band collision →
  exact shingle-Jaccard check against the matched corpus docs, fetched
  by the table's own indexed point lookup — ``read_by_value``, so the
  verification read is range/bloom-pruned, never a corpus scan), and
  in-batch exact duplicates collapsed to the min-id representative.
* ``refresh()`` consumes the change feed since ``indexed_commit`` and
  rewrites only the id-buckets holding changed docs — O(changed rows +
  touched buckets), never O(corpus).

Same staleness contract as the vector index: probing a stale index
raises unless explicitly allowed — silently missing newly-ingested
duplicates is how dedup regressions ship.

Fingerprints reuse the engine's portable MinHash family
(``dedup.minhash_hash_expr``: 8-hex-char slices of salted md5), so a
SQL oracle replays the store and the probe decision exactly.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from glue_hudi_spark.operators.dedup import (
    minhash_signature,
    normalized_text,
    word_shingles,
)
from glue_hudi_spark.operators.vector_index import StaleIndexError


class DedupIndex:
    """Exact + near-dup fingerprint store attached to one text column."""

    def __init__(self, table, id_col: str, text_col: str = "text",
                 n: int = 3, num_hashes: int = 16, bands: int = 8,
                 n_buckets: int = 64):
        self.table = table
        self.spark = table.spark
        self.id_col = id_col
        self.text_col = text_col
        self.n, self.num_hashes, self.bands = n, num_hashes, bands
        self.n_buckets = n_buckets
        self.root = Path(table.root) / "_index" / "dedup"
        self.store = self.root / "store"

    # ------------------------------------------------------------- metadata

    def _meta_path(self) -> Path:
        return self.root / "meta.json"

    def _meta(self) -> dict:
        p = self._meta_path()
        if not p.exists():
            raise ValueError(f"no dedup index at {self.root} — build() first")
        return json.loads(p.read_text())

    def _write_meta(self, meta: dict) -> None:
        self.root.mkdir(parents=True, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            f.write(json.dumps(meta, indent=1))
        os.replace(tmp, self._meta_path())

    # ----------------------------------------------------------------- rows

    def _fingerprints(self, df: DataFrame) -> DataFrame:
        """(id, bucket, h, band, band_hash) — the exact hash rides on
        every band row (bands× amplification of tiny rows; the store
        never carries text or shingles)."""
        r = self.num_hashes // self.bands
        sig = df.select(
            F.col(self.id_col).alias("id"),
            F.md5(normalized_text(self.text_col)).alias("h"),
            minhash_signature(self.text_col, self.n,
                              self.num_hashes).alias("mh"),
        )
        banded = sig.select(
            "id", "h",
            F.posexplode(F.array(*[
                F.md5(F.concat_ws(
                    "|", *[F.col("mh")[b * r + i] for i in range(r)]))
                for b in range(self.bands)
            ])).alias("band", "band_hash"),
        )
        return banded.withColumn(
            "bucket",
            F.pmod(F.xxhash64(F.col("id").cast("string")),
                   F.lit(self.n_buckets)))

    # ----------------------------------------------------------------- build

    def build(self) -> dict:
        head = self.table.timeline.latest()
        if head is None:
            raise ValueError(f"table {self.table.root} has no commits")
        snap = self.table.read_snapshot()
        (self._fingerprints(snap).write.mode("overwrite")
         .partitionBy("bucket").parquet(str(self.store)))
        self._write_meta({
            "id_col": self.id_col, "text_col": self.text_col,
            "n": self.n, "num_hashes": self.num_hashes,
            "bands": self.bands, "n_buckets": self.n_buckets,
            "indexed_commit": head.commit_id,
        })
        return {"indexed_commit": head.commit_id}

    # --------------------------------------------------------------- refresh

    def refresh(self) -> dict:
        """Catch up to the table head: changed ids' fingerprints are
        removed/re-added by rewriting ONLY their id-buckets."""
        meta = self._meta()
        head = self.table.timeline.latest()
        if head is None or head.commit_id == meta["indexed_commit"]:
            return {"refreshed": False, "buckets_rewritten": 0}
        feed = self.table.change_feed(meta["indexed_commit"], head.commit_id)
        gone_ids = (feed.filter(F.col("_change_type")
                                .isin("delete", "update_preimage"))
                    .select(F.col(self.id_col).alias("id")).distinct())
        add = feed.filter(F.col("_change_type")
                          .isin("insert", "update_postimage"))
        new_rows = self._fingerprints(add)
        bucket_of = F.pmod(F.xxhash64(F.col("id").cast("string")),
                           F.lit(self.n_buckets))
        buckets = sorted(
            {r["b"] for r in gone_ids.select(bucket_of.alias("b"))
             .distinct().collect()}
            | {r["bucket"] for r in new_rows.select("bucket")
               .distinct().collect()})
        if not buckets:
            meta["indexed_commit"] = head.commit_id
            self._write_meta(meta)
            return {"refreshed": True, "buckets_rewritten": 0}
        changed = gone_ids.unionByName(
            new_rows.select("id").distinct()).distinct()
        self.spark.catalog.refreshByPath(str(self.store))
        old = (self.spark.read.parquet(str(self.store))
               .filter(F.col("bucket").isin(buckets)))
        keep = old.join(changed, on="id", how="left_anti")
        # materialize BEFORE overwriting the directory being read — the
        # rewrite set is the affected buckets only, never the store
        out = keep.unionByName(new_rows).localCheckpoint(eager=True)
        (out.write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("bucket").parquet(str(self.store)))
        self.spark.catalog.refreshByPath(str(self.store))
        # dynamic overwrite skips partitions absent from the output — an
        # emptied bucket must be cleared explicitly (same edge as the
        # vector index's emptied cell)
        still = {r["bucket"] for r in
                 out.select("bucket").distinct().collect()}
        for b in buckets:
            if b not in still:
                d = self.store / f"bucket={b}"
                if d.is_dir():
                    shutil.rmtree(d)
        meta["indexed_commit"] = head.commit_id
        self._write_meta(meta)
        return {"refreshed": True, "buckets_rewritten": len(buckets)}

    # ----------------------------------------------------------------- probe

    def probe(self, batch: DataFrame, verify_threshold: float = 0.5,
              max_candidates: int = 100_000,
              allow_stale: bool = False) -> DataFrame:
        """The batch rows that enter the corpus: drop exact re-crawls
        (hash in store), verified near-duplicates (band collision, then
        exact shingle Jaccard ≥ ``verify_threshold`` against the matched
        corpus docs — fetched via the table's indexed point lookup, a
        candidate-bounded read), and in-batch exact duplicates (min-id
        keeper). Candidate corpus ids are collected to drive the pruned
        lookup — bounded by ``max_candidates`` (raise = the batch is
        pathologically duplicate-heavy; split it)."""
        meta = self._meta()
        head = self.table.timeline.latest()
        if (not allow_stale and head is not None
                and head.commit_id != meta["indexed_commit"]):
            raise StaleIndexError(
                f"dedup index at {self.root} is at commit "
                f"{meta['indexed_commit']} but the table head is "
                f"{head.commit_id}; refresh() or pass allow_stale=True")
        self.spark.catalog.refreshByPath(str(self.store))
        store = self.spark.read.parquet(str(self.store))
        fp = self._fingerprints(batch).persist()
        try:
            # exact: one narrow distinct-hash projection of the store
            seen_h = store.select("h").distinct()
            fresh = fp.join(seen_h, on="h", how="left_anti")
            # in-batch exact keep-one (same min-id policy as exact_dedup)
            keep = fresh.groupBy("h").agg(F.min("id").alias("id"))
            fresh = fresh.join(keep, on=["h", "id"], how="left_semi")
            # near-dup candidates: band-collide the survivors
            cand = (fresh.select("id", "band", "band_hash")
                    .join(store.select(F.col("id").alias("corpus_id"),
                                       "band", "band_hash"),
                          on=["band", "band_hash"])
                    .select("id", "corpus_id").distinct())
            corpus_ids = [r["corpus_id"] for r in
                          cand.select("corpus_id").distinct()
                          .limit(max_candidates + 1).collect()]
            if len(corpus_ids) > max_candidates:
                raise ValueError(
                    f"dedup probe: >{max_candidates} candidate corpus "
                    "docs — split the batch or raise max_candidates")
            surviving_ids = fresh.select("id").distinct()
            if corpus_ids:
                corpus_docs = self.table.read_by_value(
                    self.id_col, corpus_ids)
                csh = corpus_docs.select(
                    F.col(self.id_col).alias("corpus_id"),
                    F.array_distinct(word_shingles(
                        self.text_col, self.n)).alias("sh_c"))
                bsh = batch.select(
                    F.col(self.id_col).alias("id"),
                    F.array_distinct(word_shingles(
                        self.text_col, self.n)).alias("sh_b"))
                inter = F.size(F.array_intersect("sh_b", "sh_c"))
                union = F.size(F.array_union("sh_b", "sh_c"))
                dup_ids = (cand.join(bsh, on="id").join(csh, on="corpus_id")
                           .withColumn("jac", F.round(
                               inter.cast("double") / union.cast("double"),
                               6))
                           .filter(F.col("jac") >= verify_threshold)
                           .select("id").distinct())
                surviving_ids = surviving_ids.join(
                    dup_ids, on="id", how="left_anti")
            # materialize the novel-id set EXECUTOR-side (it is
            # batch-sized — never collect it to the driver) so the
            # fingerprint persist can be released before returning
            out_ids = surviving_ids.localCheckpoint(eager=True)
        finally:
            fp.unpersist()
        return batch.join(
            out_ids.withColumnRenamed("id", self.id_col),
            on=self.id_col, how="left_semi")
