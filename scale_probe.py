"""10× scale probe — the scaling point the sf0.1 bench can't show.

The driver ships sf{0.001,0.01,0.1}; fixed costs (session, plan compile,
task dispatch) dominate sf0.1, so per-query times there say little about
how the scale-relevant paths GROW. This probe synthesizes 10× inputs from
the sf0.1 tables (in /tmp — testdata is read-only) and measures the three
paths the round-2 verdict called out, printing one JSON line per probe:

* CoW merge: bulk_insert 6M rows, then a narrow and a wide upsert —
  with files_rewritten / files_carried from the commit stats (is pruning
  still selective at 10×?).
* MoR merge + realtime read: delta appends then a `_rt` read — the read
  must not pay a full-table shuffle (round-3 rewrite).
* MinHash LSH: 50k docs (10× sf0.1) through minhash_lsh_pairs — hashing
  is the intrinsic cost; this pins its growth factor.

Run: python scale_probe.py   (~3-5 min on local[32])

``python scale_probe.py --stream`` times the two change-feed stream
tiers (partitioned vs driver-simple) on a 3.65M-row history + 10k tail.

``python scale_probe.py --decade`` runs the 100× points instead (60M-row
CoW merge, 500k-doc MinHash) — one decade past the 10× rig on exactly
the two paths users size clusters by, catching any super-linear term
hiding between decades. (~10 min on local[32].)
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

from glue_hudi_spark.operators import dedup
from glue_hudi_spark.session import get_spark
from glue_hudi_spark.storage.native import NativeTable

SF_DIR = "/root/testdata/sf0.1"


def probe(name: str, seconds: float, **extra) -> None:
    print(json.dumps({"probe": name, "sec": round(seconds, 2), **extra}), flush=True)


def main_decade() -> None:
    """100× probes: same shapes as the 10× rig, one decade up."""
    spark = get_spark(app_name="glue_hudi_spark-scale-probe-100x")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm
    work = tempfile.mkdtemp(prefix="ghs_scale100_")

    # ---- 100× keyed table: 60M rows (sf0.1 lineitem × 100 replicas) ----
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_shipdate"
    )
    rep = spark.range(100).select(F.col("id").alias("rep"))
    big = (
        li.crossJoin(rep)
        .select(
            (F.col("l_orderkey") * 100 + F.col("rep")).alias("k"),
            F.col("l_linenumber").alias("ln"),
            F.col("l_quantity").cast("double").alias("qty"),
            F.col("l_shipdate").alias("d"),
        )
    )
    n_rows = big.count()

    # 10× the file count of the 6M rig (32 → 320) so per-file row volume
    # stays constant — the honest decade: more files, same file size
    cow = NativeTable(spark, f"{work}/cow", record_keys=["k", "ln"],
                      precombine="qty", files_per_partition=320)
    t0 = time.perf_counter()
    c = cow.bulk_insert(big)
    probe("cow_bulk_insert_60m", time.perf_counter() - t0,
          rows=n_rows, files=len(c.files))

    # narrow upsert: same contiguous-key shape as the 6M rig
    narrow = big.filter((F.col("k") >= 1000000) & (F.col("k") < 1010000))
    t0 = time.perf_counter()
    c = cow.upsert(narrow)
    probe("cow_upsert_narrow_60m", time.perf_counter() - t0,
          batch_rows=narrow.count(), **c.stats)

    # scattered upsert: keys across the whole space (hull spans the table)
    wide = big.filter(F.col("k") % 6010 == 0)
    t0 = time.perf_counter()
    c = cow.upsert(wide)
    probe("cow_upsert_scattered_60m", time.perf_counter() - t0,
          batch_rows=wide.count(), **c.stats)

    # ---- MinHash LSH at 500k docs (100× sf0.1) --------------------------
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rep100 = spark.range(100).select(F.col("id").alias("rep"))
    big_docs = (
        docs.crossJoin(rep100)
        .select(
            (F.col("doc_id") * 100 + F.col("rep")).alias("doc_id"),
            F.concat_ws(
                " ", F.col("text"),
                F.concat(F.lit("replica"), F.col("rep").cast("string")),
            ).alias("text"),
        )
    )
    n_docs = big_docs.count()
    t0 = time.perf_counter()
    pairs = dedup.minhash_lsh_pairs(big_docs, verify_threshold=0.5)
    n_pairs = pairs.count()
    probe("minhash_lsh_500k_docs", time.perf_counter() - t0,
          docs=n_docs, pairs=n_pairs)

    # ---- persisted dedup index at 500k docs (round-10 verdict #7):
    # refresh cost must track CHURN (touched prefix partitions), never
    # corpus size. prefix_len=2 → 256 exact + 256 band partitions, the
    # large-corpus layout the class docstring prescribes. --------------
    from glue_hudi_spark.operators.dedup_index import DedupIndex

    docs_tbl = NativeTable(
        spark, f"{work}/docs_tbl", record_keys=["dk"],
        precombine="doc_id", files_per_partition=64,
        stats_cols=["doc_id"])

    def keyed_docs(df):
        return df.select(
            F.format_string("%012d", "doc_id").alias("dk"),
            "doc_id", "text")

    docs_tbl.bulk_insert(keyed_docs(big_docs))
    ix = DedupIndex(docs_tbl, id_col="doc_id", prefix_len=2)
    t0 = time.perf_counter()
    ix.build()
    build_s = time.perf_counter() - t0
    probe("dedup_index_build_500k_docs", build_s, docs=n_docs,
          partitions=512)
    for churn in (10, 100):
        late = big_docs.orderBy("doc_id").limit(churn).select(
            (F.col("doc_id") + 90_000_000 + churn).alias("doc_id"),
            F.concat(F.col("text"),
                     F.lit(f" churn{churn}")).alias("text"))
        docs_tbl.upsert(keyed_docs(late))
        t0 = time.perf_counter()
        r = ix.refresh()
        probe(f"dedup_index_refresh_churn{churn}_500k_docs",
              time.perf_counter() - t0, churn_docs=churn,
              partitions_rewritten=r["partitions_rewritten"],
              build_sec=round(build_s, 2))

    # ---- persisted IVF index at 5M vectors (round-10 verdict #7):
    # change-feed refresh rewrites only the churned vectors' cell
    # partitions — O(batch + touched cells), not O(corpus). -------------
    from glue_hudi_spark.operators.vector_index import VectorIndex

    dim, n_vec, n_cells = 16, 5_000_000, 256
    vecs = spark.range(n_vec).select(
        F.col("id").alias("vec_id"),
        F.format_string("%012d", "id").alias("vk"),
        F.array(*[
            ((F.col("id") * (7 + 13 * j) + 37 * j) % 997 / 997.0)
            .cast("double") for j in range(dim)
        ]).alias("embedding"))
    vec_tbl = NativeTable(
        spark, f"{work}/vec_tbl", record_keys=["vk"],
        precombine="vec_id", files_per_partition=64,
        stats_cols=["vec_id"])
    vec_tbl.bulk_insert(vecs)
    vx = VectorIndex(vec_tbl)
    t0 = time.perf_counter()
    vx.build(id_col="vec_id", n_centroids=n_cells, train_iters=1)
    build_s = time.perf_counter() - t0
    probe("ivf_index_build_5m_vecs", build_s, vectors=n_vec,
          cells=n_cells)
    for churn in (32, 512):
        batch = spark.range(churn).select(
            (F.col("id") + 90_000_000 + churn).alias("vec_id"),
            F.format_string("%012d", F.col("id") + 90_000_000 + churn)
            .alias("vk"),
            F.array(*[
                ((F.col("id") * (11 + 17 * j) + 5 * j) % 997 / 997.0)
                .cast("double") for j in range(dim)
            ]).alias("embedding"))
        vec_tbl.upsert(batch)
        t0 = time.perf_counter()
        r = vx.refresh()
        probe(f"ivf_index_refresh_churn{churn}_5m_vecs",
              time.perf_counter() - t0, churn_vectors=churn,
              cells_rewritten=r["cells_rewritten"],
              total_cells=n_cells, build_sec=round(build_s, 2))

    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


def main() -> None:
    spark = get_spark(app_name="glue_hudi_spark-scale-probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm
    work = tempfile.mkdtemp(prefix="ghs_scale_")

    # ---- 10× keyed table (6M rows from sf0.1 lineitem × 10 replicas) ----
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_shipdate"
    )
    rep = spark.range(10).select(F.col("id").alias("rep"))
    big = (
        li.crossJoin(rep)
        .select(
            (F.col("l_orderkey") * 10 + F.col("rep")).alias("k"),
            F.col("l_linenumber").alias("ln"),
            F.col("l_quantity").cast("double").alias("qty"),
            F.col("l_shipdate").alias("d"),
        )
    )
    n_rows = big.count()

    cow = NativeTable(spark, f"{work}/cow", record_keys=["k", "ln"],
                      precombine="qty", files_per_partition=32)
    t0 = time.perf_counter()
    c = cow.bulk_insert(big)
    probe("cow_bulk_insert_6m", time.perf_counter() - t0,
          rows=n_rows, files=len(c.files))

    # narrow upsert: 10k contiguous keys → key-range pruning should carry
    # most files
    narrow = big.filter((F.col("k") >= 100000) & (F.col("k") < 101000))
    t0 = time.perf_counter()
    c = cow.upsert(narrow)
    probe("cow_upsert_narrow", time.perf_counter() - t0,
          batch_rows=narrow.count(), **c.stats)

    # wide upsert: keys scattered across the whole space
    wide = big.filter(F.col("k") % 601 == 0)
    t0 = time.perf_counter()
    c = cow.upsert(wide)
    probe("cow_upsert_scattered", time.perf_counter() - t0,
          batch_rows=wide.count(), **c.stats)

    # ---- MoR: delta appends + realtime read at 10× ----
    mor = NativeTable(spark, f"{work}/mor", record_keys=["k", "ln"],
                      precombine="qty", storage_type="mor",
                      files_per_partition=32, compact_every=100)
    mor.bulk_insert(big)
    t0 = time.perf_counter()
    mor.upsert(narrow.withColumn("qty", F.col("qty") + 1))
    mor.delete(narrow.limit(100))
    probe("mor_two_delta_commits", time.perf_counter() - t0)
    t0 = time.perf_counter()
    n = mor.read_snapshot().count()
    probe("mor_rt_read_6m", time.perf_counter() - t0, rows=n)

    # ---- bloom index at 10×: hull-spanning batch, membership pruning ----
    # (the no-bloom contrast is cow_upsert_scattered above: interval-only
    # pruning rewrites everything a scattered hull touches)
    bloom = NativeTable(spark, f"{work}/bloom", record_keys=["k", "ln"],
                        precombine="qty", files_per_partition=32,
                        bloom_index=True)
    t0 = time.perf_counter()
    c = bloom.bulk_insert(big)
    probe("bloom_bulk_insert_6m", time.perf_counter() - t0,
          rows=n_rows, files=len(c.files))  # includes the sidecar build (executor tasks write sidecars directly; only rel paths reach the driver)
    bounds = big.agg(F.min("k").alias("lo"), F.max("k").alias("hi")).first()
    edge = big.filter(F.col("k").isin(bounds["lo"], bounds["hi"]))
    t0 = time.perf_counter()
    c = bloom.upsert(edge.withColumn("qty", F.col("qty") + 1))
    probe("bloom_edge_upsert", time.perf_counter() - t0,
          batch_rows=edge.count(), **c.stats)
    t0 = time.perf_counter()
    c = cow.upsert(edge.withColumn("qty", F.col("qty") + 2))
    probe("nobloom_edge_upsert", time.perf_counter() - t0, **c.stats)

    # ---- deletion vectors at 10×: scattered delete as position marks
    # vs the rewrite path (same batch, same table shape) ------------------
    dv = NativeTable(spark, f"{work}/dv", record_keys=["k", "ln"],
                     precombine="qty", files_per_partition=32,
                     deletion_vectors=True)
    dv.bulk_insert(big)
    scat_del = big.filter(F.col("k") % 6007 == 0).select("k", "ln")
    t0 = time.perf_counter()
    c = dv.delete(scat_del)
    probe("dv_scattered_delete", time.perf_counter() - t0,
          batch_rows=scat_del.count(),
          dv_rows_marked=c.stats.get("dv_rows_marked"),
          files_rewritten=c.stats.get("files_rewritten"))
    t0 = time.perf_counter()
    n = dv.read_snapshot().count()
    probe("dv_read_after_delete", time.perf_counter() - t0, rows=n)
    t0 = time.perf_counter()
    c = dv.purge_deleted()
    probe("dv_purge", time.perf_counter() - t0, **(c.stats if c else {}))
    t0 = time.perf_counter()
    c = cow.delete(scat_del)  # rewrite-path contrast on the plain table
    probe("rewrite_scattered_delete", time.perf_counter() - t0,
          files_rewritten=c.stats.get("files_rewritten"))

    # ---- Z-order at 10×: layout rewrite cost + 2-dim pruned read ----
    zt = NativeTable(spark, f"{work}/zorder", record_keys=["k", "ln"],
                     precombine="qty", files_per_partition=32,
                     stats_cols=["k", "qty"])
    zt.bulk_insert(big)
    t0 = time.perf_counter()
    c = zt.cluster(zorder_by=["k", "qty"])
    probe("zorder_cluster_6m", time.perf_counter() - t0, files=len(c.files))
    t0 = time.perf_counter()
    out = zt.read_snapshot(prune={"qty": (1.0, 5.0)})
    n = out.count()
    probe("zorder_pruned_read_qty", time.perf_counter() - t0,
          rows=n, files_read=len(out.inputFiles()), files_total=len(c.files))

    # ---- MinHash at 10× docs (perturbed replicas; suffix token keeps
    # replica pairs below the verify threshold so pair count stays sane) --
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    big_docs = (
        docs.crossJoin(rep)
        .select(
            (F.col("doc_id") * 10 + F.col("rep")).alias("doc_id"),
            F.concat_ws(
                " ", F.col("text"),
                F.concat(F.lit("replica"), F.col("rep").cast("string")),
            ).alias("text"),
        )
    )
    n_docs = big_docs.count()
    t0 = time.perf_counter()
    pairs = dedup.minhash_lsh_pairs(big_docs, verify_threshold=0.5)
    n_pairs = pairs.count()
    probe("minhash_lsh_50k_docs", time.perf_counter() - t0,
          docs=n_docs, pairs=n_pairs)

    # ---- line dedup at 10× (50k docs, heavy cross-doc line overlap: the
    # replicas share every line with their source doc, so the aggregate
    # and join-back paths carry the worst-case popular-line skew) --------
    lined = big_docs.select(
        "doc_id", F.replace(F.col("text"), F.lit(" a "), F.lit("\n")).alias("text")
    )
    t0 = time.perf_counter()
    out = dedup.line_dedup(lined)
    n_out = out.count()
    probe("line_dedup_50k_docs", time.perf_counter() - t0,
          docs=n_docs, survivors=n_out)

    # ---- semantic dedup at 20× vectors (40k) with corpus-scaled cell
    # count (SemDeDup's own recipe: k grows with n, so within-cell pair
    # volume stays ~n·target_cell not n²/k_fixed) ------------------------
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    rep20 = spark.range(20).select(F.col("id").alias("rep"))
    big_emb = (
        emb.crossJoin(rep20)
        .select(
            (F.col("vec_id") * 20 + F.col("rep")).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x: x + (F.col("rep") % 5).cast("float") / F.lit(100.0),
            ).alias("embedding"),
        )
    )
    n_vec = big_emb.count()
    k_cells = max(8, n_vec // 500)
    t0 = time.perf_counter()
    pairs = dedup.semantic_dedup_pairs(
        big_emb, n_centroids=k_cells, iters=2, threshold=0.99
    )
    n_pairs = pairs.count()
    probe("semantic_dedup_40k_vecs", time.perf_counter() - t0,
          vecs=n_vec, cells=k_cells, pairs=n_pairs)

    # ---- shard writer at 10× docs: range-partitioned multi-task write,
    # per-shard order preserved (layout checked by tests; this pins cost) -
    from glue_hudi_spark.operators import sharding

    t0 = time.perf_counter()
    sharding.write_shards(big_docs, f"{work}/shards", key_col="doc_id",
                          n_shards=16)
    probe("write_shards_50k_docs", time.perf_counter() - t0, docs=n_docs,
          shards=16)

    # ---- fixed-count stratum sample at 10× docs: the window must only
    # ever see the oversampled sliver, not the corpus ---------------------
    strat = big_docs.withColumn("lang", (F.col("doc_id") % 4).cast("string"))
    t0 = time.perf_counter()
    out = __import__("glue_hudi_spark.operators.sampling", fromlist=["x"]) \
        .stratum_fixed_sample(strat, "lang", "doc_id", n=100)
    n_out = out.count()
    probe("stratum_fixed_50k_docs", time.perf_counter() - t0,
          docs=n_docs, sampled=n_out)

    # ---- change feed at 6M rows: one full-outer fingerprint join of two
    # snapshots. The DIFF pass is O(table) by design (no per-file change
    # tracking assumed); what must stay O(changes) is everything
    # downstream (IVM application) — both measured here. A dedicated
    # table with a UNIQUE key (the lineitem fixture's (orderkey,
    # linenumber) is NOT unique — diff semantics assume merge-maintained
    # keys, which bulk-loaded dup keys violate). --------------------------
    uniq = big.withColumn("uid", F.monotonically_increasing_id()) \
        .select("uid", "k", "ln", "qty", "d")
    cft = NativeTable(spark, f"{work}/cft", record_keys=["uid"],
                      precombine="qty", files_per_partition=32)
    cft.bulk_insert(uniq)
    batch = (
        cft.read_snapshot().filter(F.col("k") % 601 == 0)
        .withColumn("qty", F.col("qty") + 1.0)
    )
    cft.upsert(batch)
    t0 = time.perf_counter()
    diff = cft.diff_snapshots(1)
    n_changes = diff.count()
    probe("change_feed_diff_6m", time.perf_counter() - t0,
          changed_rows=n_changes,
          # adjacent-commit diffs scan only the files the two manifests
          # DISAGREE on (shared files can't contribute a change) — a
          # SCATTERED upsert rewrites every file, so this is the worst
          # case (old+new of everything); the narrow case below is the
          # favorable one
          files_scanned=len(diff.inputFiles()),
          files_total=len(cft.timeline.latest().files))
    narrow_cf = cft.read_snapshot().filter(
        (F.col("uid") >= 1000) & (F.col("uid") < 2000)
    ).withColumn("qty", F.col("qty") + 2.0)
    c2 = cft.upsert(narrow_cf)
    t0 = time.perf_counter()
    diff2 = cft.diff_snapshots(c2.commit_id - 1, c2.commit_id)
    n2 = diff2.count()
    probe("change_feed_diff_6m_narrow", time.perf_counter() - t0,
          changed_rows=n2,
          files_scanned=len(diff2.inputFiles()),
          files_total=len(cft.timeline.latest().files))
    from glue_hudi_spark.operators import ivm

    state = ivm.aggregate_state(
        cft.read_snapshot(as_of=1).withColumn(
            "g", (F.col("k") % 16).cast("string")), ["g"], "qty")
    feed = cft.change_feed(1).withColumn("g", (F.col("k") % 16).cast("string"))
    t0 = time.perf_counter()
    n_groups = ivm.apply_change_feed(state, feed, ["g"], "qty").count()
    probe("ivm_apply_6m_base", time.perf_counter() - t0,
          changed_rows=n_changes, groups=n_groups)

    # ---- secondary value-set index at 6M rows / 192 files: equality
    # lookup on a non-key column whose range spans every file — only the
    # per-file value SET can prune. cat correlates with the clustering
    # key, the layout the index is for. -----------------------------------
    sec = NativeTable(spark, f"{work}/secondary", record_keys=["k", "ln"],
                      precombine="qty", files_per_partition=192,
                      secondary_bloom_cols=["cat"])
    t0 = time.perf_counter()
    c = sec.bulk_insert(big.withColumn(
        "cat", F.concat(F.lit("c"), (F.col("k") / 40000).cast("int"))))
    probe("secondary_bulk_insert_6m", time.perf_counter() - t0,
          rows=n_rows, files=len(c.files))
    t0 = time.perf_counter()
    hit = sec.read_by_value("cat", ["c7"])
    n_hit = hit.count()
    probe("secondary_lookup_6m", time.perf_counter() - t0,
          rows=n_hit, files_scanned=len(hit.inputFiles()),
          files_total=len(c.files))

    # ---- bin_pack at 6M rows: 192 full files + 20 sliver commits —
    # the pack must cost O(sliver bytes), never O(table). ------------------
    bp = NativeTable(spark, f"{work}/binpack", record_keys=["k", "ln"],
                     precombine="qty", files_per_partition=192)
    c0 = bp.bulk_insert(big)
    for j in range(20):
        bp.upsert(spark.createDataFrame(
            [(j, 0, 999.0, None)], "k long, ln long, qty double, d timestamp"))
    before = len(bp.timeline.latest().files)
    t0 = time.perf_counter()
    cp = bp.bin_pack(target_bytes=256 * 1024)
    probe("bin_pack_6m_20slivers", time.perf_counter() - t0,
          files_before=before, files_after=len(cp.files) if cp else before,
          packed=cp.stats["packed_files"] if cp else 0)

    # ---- OCC rebase at 6M rows: the losing writer's retry must cost
    # O(its own batch) — a restamp rewrite of just its new files — never
    # a second merge join or anything O(table). ---------------------------
    occ = NativeTable(spark, f"{work}/occ", record_keys=["k", "ln"],
                      precombine="qty", files_per_partition=32)
    occ.bulk_insert(big)
    lo_batch = big.filter((F.col("k") >= 100000) & (F.col("k") < 101000))
    hi_batch = big.filter((F.col("k") >= 1400000) & (F.col("k") < 1401000))
    # reference: the same narrow upsert with no contention
    t0 = time.perf_counter()
    occ.upsert(lo_batch)
    solo = time.perf_counter() - t0
    probe("occ_solo_upsert", solo, batch_rows=lo_batch.count())
    # contended: writer A's whole upsert runs inside B's publish window
    wa = NativeTable(spark, f"{work}/occ", record_keys=["k", "ln"],
                     precombine="qty", files_per_partition=32)
    wb = NativeTable(spark, f"{work}/occ", record_keys=["k", "ln"],
                     precombine="qty", files_per_partition=32)
    publish, fired = wb.timeline.publish, []

    def racing(commit):
        if not fired:
            fired.append(time.perf_counter())
            wa.upsert(lo_batch.withColumn("qty", F.col("qty") + 1))
            fired.append(time.perf_counter())
        return publish(commit)

    wb.timeline.publish = racing
    t0 = time.perf_counter()
    c = wb.upsert(hi_batch)
    total = time.perf_counter() - t0
    winner_inside = fired[1] - fired[0]
    probe("occ_contended_upsert", total - winner_inside,
          rebase_overhead_vs_solo=round((total - winner_inside) / solo, 2),
          rebased_from=c.stats.get("occ_rebased_from"))

    # ---- named refs at 10×: fork / tag / fast-forward are O(metadata) ----
    # the contract: branching the 6M-row table writes ZERO data bytes;
    # only the branch's own upsert pays a (pruned) merge; fast-forward
    # publishes the branch head as one manifest carrying files by
    # reference
    t0 = time.perf_counter()
    br = cow.create_branch("probe")
    fork_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    cow.create_tag("probe-v1")
    tag_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    c = br.upsert(narrow.withColumn("qty", F.col("qty") + 2))
    branch_upsert_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    ff = cow.fast_forward("probe", drop=True)
    ff_s = time.perf_counter() - t0
    probe("refs_fork_tag_ff_6m", fork_s + tag_s + ff_s,
          fork_s=round(fork_s, 4), tag_s=round(tag_s, 4),
          ff_s=round(ff_s, 4), branch_upsert_s=round(branch_upsert_s, 3),
          ff_new_data_files=len(set(ff.files) - set(c.files)))

    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


def main_stream() -> None:
    """Round-9 probe: change-feed STREAM tier throughput.

    The partitioned DataSourceStreamReader (one InputPartition per
    changed file, executor pyarrow reads) exists to remove the
    SimpleDataSourceStreamReader's driver funnel. Measure both tiers
    draining (a) a 1.2M-row full history and (b) an incremental 10k-row
    tail from the same table — the ratio on (a) is the funnel cost, and
    (b) pins that both tiers stay O(changed files) on a tail."""
    from glue_hudi_spark.sources import datasource as DS

    spark = get_spark(app_name="glue_hudi_spark-scale-probe-stream")
    DS.register(spark)
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm
    work = tempfile.mkdtemp(prefix="ghs_scale_stream_")

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_quantity")
    rep = spark.range(8).select(F.col("id").alias("rep"))
    big = (
        li.crossJoin(rep)
        .select(
            (F.col("l_orderkey") * 10000 + F.col("l_linenumber") * 100
             + F.col("rep")).alias("k"),
            F.col("l_quantity").cast("double").alias("q"),
        )
        .dropDuplicates(["k"])
    )
    t = NativeTable(spark, f"{work}/t", record_keys=["k"], precombine="q",
                    files_per_partition=32, change_feed_deletes=True)
    t.bulk_insert(big)
    n_rows = t.read_snapshot().count()

    def drain(tag: str, simple: bool, starting: int | None = None,
              sink: str = "noop") -> tuple[float, int]:
        out, ck = f"{work}/out_{tag}", f"{work}/ck_{tag}"
        t0 = time.time()
        r = (spark.readStream.format("ghs_table")
             .option("path", str(t.root)))
        if simple:
            r = r.option("simpleStream", "true")
        if starting is not None:
            r = r.option("startingCommit", str(starting))
        w = r.load().writeStream.format(sink)
        if sink == "parquet":
            w = w.option("path", out)
        q = (w.option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        sec = time.time() - t0
        n = (spark.read.parquet(out).count() if sink == "parquet" else -1)
        return sec, n

    # correctness anchor once (parquet sink), then timing via the noop
    # sink so the probe measures the READ tiers, not parquet encoding
    _, anchor_n = drain("anchor", simple=False, sink="parquet")
    assert anchor_n == n_rows, (anchor_n, n_rows)
    p_s, _ = drain("hist_part", simple=False)
    s_s, _ = drain("hist_simple", simple=True)
    probe("stream_full_history_partitioned", p_s, rows=n_rows,
          rows_per_sec=int(n_rows / p_s))
    probe("stream_full_history_simple", s_s, rows=n_rows,
          rows_per_sec=int(n_rows / s_s),
          partitioned_speedup=round(s_s / p_s, 2))

    # incremental tail: 10k-key upsert, drain ONLY the new window (fresh
    # checkpoint pinned at the pre-tail head) — O(changed files) on both
    # tiers; the partitioned tier must not regress the tail case
    head = t.timeline.latest().commit_id
    tail = big.limit(10_000).select("k", (F.col("q") + 1).alias("q"))
    t.upsert(tail)
    tp_s, _ = drain("tail_part", simple=False, starting=head)
    ts_s, _ = drain("tail_simple", simple=True, starting=head)
    probe("stream_tail_partitioned", tp_s, rows=10_000)
    probe("stream_tail_simple", ts_s, rows=10_000,
          partitioned_speedup=round(ts_s / tp_s, 2))

    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


def main_matjoin() -> None:
    """Round-9 probe: incrementally-maintained join view at 10×.

    state = 6M-row fact LEFT JOIN 100-key dim. Measures (a) the initial
    materialization (the one full join), (b) a fact-side refresh after a
    10k-row CDC batch, (c) a dim-side refresh after 5 of 100 dim keys
    change — the delta equations say (b) costs O(Δfact) and (c)
    O(affected facts = 5% of the table), never O(view). The commit
    stats' files_rewritten confirm the state merge is pruned like any
    keyed merge."""
    from glue_hudi_spark.streaming.materialized import MaterializedJoin

    spark = get_spark(app_name="glue_hudi_spark-scale-probe-matjoin")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm
    work = tempfile.mkdtemp(prefix="ghs_scale_mj_")

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_quantity")
    rep = spark.range(10).select(F.col("id").alias("rep"))
    big = (
        li.crossJoin(rep)
        .select(
            (F.col("l_orderkey") * 1000 + F.col("l_linenumber") * 10
             + F.col("rep")).alias("k"),
            (F.col("l_orderkey") % 100).alias("ckey"),
            F.col("l_quantity").cast("double").alias("q"),
        )
        .dropDuplicates(["k"])
    )
    fact = NativeTable(spark, f"{work}/fact", record_keys=["k"],
                       precombine="q", files_per_partition=32)
    fact.bulk_insert(big)
    n_fact = fact.read_snapshot().count()
    dim = NativeTable(spark, f"{work}/dim", record_keys=["ckey"],
                      precombine="q")
    dim.bulk_insert(spark.range(100).select(
        F.col("id").alias("ckey"), F.lit(1.0).alias("q"),
        F.concat(F.lit("grp"), (F.col("id") % 7).cast("string"))
        .alias("grp")))
    mj = MaterializedJoin(spark, fact, dim, f"{work}/mv",
                          join_col="ckey", dim_cols=["grp"])

    t0 = time.perf_counter()
    mj.refresh()
    probe("matjoin_initial_6m", time.perf_counter() - t0, rows=n_fact)

    # realistic fact delta: a CONTIGUOUS key band (new orders arrive at
    # the head of the key space) — key-range pruning flows through the
    # view: the change-feed diff reads only the fact files the batch
    # touched, and the state merge rewrites only the state files the
    # band hits. (A fully scattered batch degrades to O(view) rewrite on
    # BOTH base and view — same as any keyed table; that's the batch's
    # key distribution, not the operator.)
    band = big.filter((F.col("k") >= 1_000_000) & (F.col("k") < 1_010_000))
    fact.upsert(band.select("k", "ckey", (F.col("q") + 1).alias("q")))
    t0 = time.perf_counter()
    mj.refresh()
    c = mj.state.timeline.latest()
    probe("matjoin_fact_delta_contiguous", time.perf_counter() - t0,
          batch_rows=band.count(),
          **{k: c.stats[k] for k in ("files_rewritten", "files_carried")
             if k in c.stats})

    dim.upsert(spark.range(5).select(
        F.col("id").alias("ckey"), F.lit(2.0).alias("q"),
        F.lit("CHANGED").alias("grp")))
    t0 = time.perf_counter()
    mj.refresh()
    c = mj.state.timeline.latest()
    n_changed = mj.read().filter(F.col("grp") == "CHANGED").count()
    probe("matjoin_dim_delta_5pct", time.perf_counter() - t0,
          affected_rows=n_changed,
          **{k: c.stats[k] for k in ("files_rewritten", "files_carried")
             if k in c.stats})

    # --- round-10: the clustered state layout on the SAME dim-churn
    # shape. cluster_by=ckey lays state files out by the join column
    # (sort_order + stats + secondary bloom), and the refresh passes the
    # window's join-key set to merge(prune_values=...): the 5%-of-keys
    # churn that rewrote 32/32 files above should now rewrite only the
    # files whose ckey range admits a changed key — O(changed keys'
    # files), the round-9 verdict's documented-but-unprobed mitigation.
    mjc = MaterializedJoin(spark, fact, dim, f"{work}/mv_clustered",
                           join_col="ckey", dim_cols=["grp"],
                           cluster_by="ckey")
    t0 = time.perf_counter()
    mjc.refresh()
    n_state_files = len(mjc.state.timeline.latest().files)
    probe("matjoin_clustered_initial", time.perf_counter() - t0,
          rows=n_fact, state_files=n_state_files)

    dim.upsert(spark.range(50, 55).select(
        F.col("id").alias("ckey"), F.lit(3.0).alias("q"),
        F.lit("CHANGED2").alias("grp")))
    t0 = time.perf_counter()
    mjc.refresh()
    c = mjc.state.timeline.latest()
    probe("matjoin_clustered_dim_delta_5pct", time.perf_counter() - t0,
          affected_rows=mjc.read().filter(
              F.col("grp") == "CHANGED2").count(),
          state_files=n_state_files,
          **{k: c.stats[k] for k in ("files_rewritten", "files_carried")
             if k in c.stats})

    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


def main_maggr() -> None:
    """Round-10 probe: MaterializedAgg's keyed-merge refresh at 10×.

    6M-row base, 100k-group aggregate state over 32 files. A narrow
    base churn (one group) must rewrite only the state file(s) whose
    group-key range admits it — the pre-r10 insert_overwrite rewrote
    all 32 every refresh regardless of window width."""
    from glue_hudi_spark.streaming.materialized import MaterializedAgg

    spark = get_spark(app_name="glue_hudi_spark-scale-probe-maggr")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm
    work = tempfile.mkdtemp(prefix="ghs_scale_ma_")

    base = NativeTable(spark, f"{work}/base", record_keys=["id"],
                       precombine="seq", files_per_partition=32)
    base.bulk_insert(spark.range(6_000_000).select(
        F.col("id"),
        F.concat(F.lit("g"), F.lpad((F.col("id") % 100_000)
                                    .cast("string"), 6, "0")).alias("grp"),
        (F.col("id") % 1000).cast("double").alias("value"),
        F.lit(1).alias("seq")))
    view = MaterializedAgg(spark, base, f"{work}/view", ["grp"], "value")
    view.state.files_per_partition = 32
    t0 = time.perf_counter()
    view.refresh()
    n_files = len(view.state.timeline.latest().files)
    probe("maggr_initial_6m", time.perf_counter() - t0,
          groups=100_000, state_files=n_files)

    base.upsert(spark.createDataFrame(
        [(0, "g000000", 9999.0, 2)],
        "id long, grp string, value double, seq int"))
    t0 = time.perf_counter()
    view.refresh()
    c = view.state.timeline.latest()
    probe("maggr_one_group_churn", time.perf_counter() - t0,
          state_files=n_files,
          **{k: c.stats[k] for k in ("files_rewritten", "files_carried")
             if k in c.stats})

    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


def main_classifier() -> None:
    """Round-10 probe: K-pass aggregate classifier training at 6M and
    60M rows (60M ≈ a 10× sf0.1 feature table; one decade apart so any
    super-linear term shows). The claim under test
    (operators/classify.py): each round is ONE map-side-combined
    aggregate scan, driver state = the weight vector — so sec/round
    should scale ~linearly in rows and be flat across rounds."""
    from glue_hudi_spark.operators import classify as C

    spark = get_spark(app_name="glue_hudi_spark-scale-probe-classifier")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm

    for n in (6_000_000, 60_000_000):
        # deterministic, imbalanced, not-perfectly-separable features:
        # y encodes a linear rule over x1,x2 with a modular "noise" band
        feats = spark.range(n).selectExpr(
            "CAST(1 AS BIGINT) AS x0",
            "CAST(id % 1000 - 500 AS BIGINT) AS x1",
            "CAST((id * 2654435761) % 997 - 498 AS BIGINT) AS x2",
            "CAST(CASE WHEN (id % 1000 - 500) + 2*((id * 2654435761) % 997 - 498) "
            "+ (id % 37) - 18 > 0 THEN 1 ELSE -1 END AS BIGINT) AS y",
        )
        t0 = time.perf_counter()
        rows = C.perceptron_train(feats, ["x0", "x1", "x2"], rounds=3)
        total = time.perf_counter() - t0
        probe(f"classifier_train_{n // 1_000_000}m", round(total, 2),
              rows=n, rounds=3, sec_per_round=round(total / 3, 2),
              last_n_mis=rows[-1]["n_mis"])
    spark.stop()


def main_sql() -> None:
    """SQL-dispatch overhead at 6M rows: the same keyed work through
    the Python API and through GhsSql statements. The claim under test:
    the SQL layer adds O(statement-text) driver work — regex dispatch +
    one temp-view bind — never a data-sized term, so a SQL-only user
    gets the same engine (BASELINE table pins the per-op deltas)."""
    import shutil

    from glue_hudi_spark.sql import GhsSql

    spark = get_spark(app_name="glue_hudi_spark-scale-probe-sql")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm
    work = tempfile.mkdtemp(prefix="ghs_sqlprobe_")

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        F.col("l_orderkey").alias("k0"),
        F.col("l_linenumber").alias("ln"),
        F.col("l_quantity").cast("double").alias("qty"),
    )
    rep = spark.range(10).select(F.col("id").alias("rep"))
    # unique key across orderkey x linenumber x replica -> full 6M rows
    big = li.crossJoin(rep).select(
        ((F.col("k0") * 8 + F.col("ln")) * 10 + F.col("rep")).alias("k"),
        F.col("ln"), F.col("qty"),
    )
    n_rows = big.count()
    big.createOrReplaceTempView("sqlprobe_src")
    narrow = big.filter((F.col("k") >= 8000000) & (F.col("k") < 8080000))
    narrow.createOrReplaceTempView("sqlprobe_narrow")

    # untimed warmup write: the session's FIRST keyed write pays
    # codegen + shuffle-service warmup (~4-5 s here) that would land on
    # whichever path went first and drown the ~1 s dispatch overhead
    # this probe exists to measure
    NativeTable(spark, f"{work}/warm", record_keys=["k"],
                files_per_partition=32).bulk_insert(big)

    # SQL path still runs FIRST: any residual warmth favors the Python
    # run, so "SQL adds only constant overhead" stays conservative.
    g = GhsSql(spark, f"{work}/wh")
    t0 = time.perf_counter()
    g.sql("CREATE TABLE t (k BIGINT, ln INT, qty DOUBLE) USING ghs_table"
          " TBLPROPERTIES ('primaryKey'='k', 'filesPerPartition'='32')")
    probe("sql_create_table", time.perf_counter() - t0)
    t0 = time.perf_counter()
    g.sql("INSERT INTO t SELECT k, ln, qty FROM sqlprobe_src")
    probe("sql_insert_into_6m", time.perf_counter() - t0, rows=n_rows)
    t0 = time.perf_counter()
    g.sql("INSERT INTO t SELECT k, ln, qty + 1 FROM sqlprobe_narrow")
    probe("sql_upsert_narrow_6m", time.perf_counter() - t0)
    t0 = time.perf_counter()
    g.sql("DELETE FROM t WHERE k % 601 = 0")
    probe("sql_delete_where_6m", time.perf_counter() - t0)

    # ---- Python API path: identical work --------------------------------
    py = NativeTable(spark, f"{work}/py", record_keys=["k"],
                     files_per_partition=32)
    t0 = time.perf_counter()
    py.bulk_insert(big)
    probe("py_bulk_insert_6m", time.perf_counter() - t0, rows=n_rows)
    t0 = time.perf_counter()
    py.upsert(narrow.withColumn("qty", F.col("qty") + 1))
    probe("py_upsert_narrow_6m", time.perf_counter() - t0)
    t0 = time.perf_counter()
    py.delete_where(F.expr("k % 601 = 0"))
    probe("py_delete_where_6m", time.perf_counter() - t0)

    # isolation: SAME table, back-to-back — the dispatch overhead
    # alone (cross-table pairs above carry per-table state noise that
    # can read as 2x on a 1.5 s op; this pair is the decisive number)
    g2 = GhsSql(spark, f"{work}/wh2", tables={"pyt": py})
    t0 = time.perf_counter()
    py.upsert(narrow.withColumn("qty", F.col("qty") + 2))
    py_s = time.perf_counter() - t0
    probe("iso_py_upsert", py_s)
    t0 = time.perf_counter()
    g2.sql("INSERT INTO pyt SELECT k, ln, qty + 3 FROM sqlprobe_narrow")
    sql_s = time.perf_counter() - t0
    probe("iso_sql_upsert_same_table", sql_s,
          dispatch_overhead_sec=round(sql_s - py_s, 2))
    # mirror the two isolation writes onto the SQL-path table so the
    # end-state equality check below still holds
    g.sql("INSERT INTO t SELECT k, ln, qty + 2 FROM sqlprobe_narrow;"
          "INSERT INTO t SELECT k, ln, qty + 3 FROM sqlprobe_narrow")

    # row-identical end states
    a = py.read_snapshot().selectExpr("sum(k)", "sum(qty)",
                                      "count(*)").first()
    b = g.tables["t"].read_snapshot().selectExpr(
        "sum(k)", "sum(qty)", "count(*)").first()
    assert tuple(a) == tuple(b), (tuple(a), tuple(b))
    probe("sql_vs_py_states_equal", 0.0, rows=int(a[2]))
    shutil.rmtree(work, ignore_errors=True)


def main_timeseries() -> None:
    """Gap-fill scaling: the claim is grid cost = keys x OWN-span
    buckets (never quadratic, never driver-side). Two axes, same total
    row count, one decade apart in key count — if cost tracked anything
    other than output-grid size, the two shapes would diverge:

    * wide:   1.5k keys x ~1 year span  (long series, few keys)
    * many:  90k keys x short span      (short series, many keys)

    Plus LTTB at 6M points / 15k keys (applyInPandas across keys).
    """
    from glue_hudi_spark.operators.timeseries import (lttb_downsample,
                                                      resample_gapfill)

    spark = get_spark(app_name="ghs-timeseries-probe")
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")  # 100k rows
    base = ev.select("user_id", "ts", "value")
    # 60x the rows: replicate with shifted users and times
    reps = spark.range(60).withColumnRenamed("id", "rep")
    big = base.crossJoin(reps).select(
        # wide axis: SAME keys, 60x longer series (time shifted per rep)
        F.col("user_id").alias("k_wide"),
        # many axis: 60x the keys (1.5k users x 60 reps = 90k,
        # collision-free: rep < 60 < 100), each series 1/60 the length
        (F.col("user_id") * 100 + F.col("rep")).alias("k_many"),
        F.col("ts"),
        (F.expr("ts + make_interval(0, 0, 0, 0, 0, 0, rep * 500000)")
         ).alias("ts_wide"),
        "value",
    ).persist()
    n = big.count()
    for label, key, ts in (("wide_1.5k_keys", "k_wide", "ts_wide"),
                           ("many_90k_keys", "k_many", "ts")):
        t0 = time.time()
        out = resample_gapfill(
            big.select(F.col(key).alias("k"), F.col(ts).alias("ts"),
                       "value"),
            keys=["k"], ts_col="ts",
            values={"v": F.sum("value")}, unit="day", max_buckets=5000)
        grid = out.count()
        probe(f"gapfill_{label}", time.time() - t0,
              input_rows=n, grid_rows=grid)
    # LTTB's intended regime is FEW keys x LONG series (dashboard
    # downsampling); the many-tiny-keys shape is included to record the
    # per-group Arrow/pandas tax honestly
    for label, key, n_out in (("wide_1.5k_keys", "k_wide", 200),
                              ("many_90k_keys", "k_many", 24)):
        t0 = time.time()
        cnt = lttb_downsample(
            big.select(F.col(key).alias("k"), "ts", "value"),
            keys=["k"], ts_col="ts", value_col="value",
            n_out=n_out).count()
        probe(f"lttb_{label}", time.time() - t0,
              input_rows=n, out_rows=cnt)
    big.unpersist()
    spark.stop()


def main_matjoinagg() -> None:
    """Round-13 probe: aggregate-over-join view at 10×. state =
    GROUP BY grp over (6M-row fact ⋈ 100-key dim). The bilinear-delta
    claims: initial = the one full join+aggregate; a fact-side refresh
    costs O(Δfact) (feed ⋈ dim, signed group delta); a dim-side
    refresh costs O(affected facts) — 5 of 100 keys changing groups
    re-reads ~5% of the OLD fact via the stats-pruned point lookup,
    never the view or the corpus."""
    from glue_hudi_spark.streaming.materialized import MaterializedJoinAgg

    spark = get_spark(app_name="glue_hudi_spark-scale-probe-matjoinagg")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm
    work = tempfile.mkdtemp(prefix="ghs_scale_mja_")
    try:
        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
            "l_orderkey", "l_linenumber", "l_quantity")
        rep = spark.range(10).select(F.col("id").alias("rep"))
        big = (
            li.crossJoin(rep)
            .select(
                (F.col("l_orderkey") * 1000 + F.col("l_linenumber") * 10
                 + F.col("rep")).alias("k"),
                (F.col("l_orderkey") % 100).alias("ckey"),
                F.col("l_quantity").cast("double").alias("q"),
            )
            .dropDuplicates(["k"])
        )
        fact = NativeTable(spark, f"{work}/fact", record_keys=["k"],
                           precombine="q", files_per_partition=32,
                           stats_cols=["ckey"])
        fact.bulk_insert(big)
        n_fact = fact.read_snapshot().count()
        dim = NativeTable(spark, f"{work}/dim", record_keys=["ckey"],
                          precombine="q")
        dim.bulk_insert(spark.range(100).select(
            F.col("id").alias("ckey"), F.lit(1.0).alias("q"),
            F.concat(F.lit("grp"), (F.col("id") % 7).cast("string"))
            .alias("grp")))
        ja = MaterializedJoinAgg(spark, fact, dim, f"{work}/mv",
                                 join_col="ckey", group_cols=["grp"],
                                 sum_col="q", dim_cols=["grp"])
        t0 = time.perf_counter()
        ja.refresh()
        probe("matjoinagg_initial_6m", time.perf_counter() - t0,
              rows=n_fact, groups=ja.read().count())

        band = big.filter((F.col("k") >= 1_000_000)
                          & (F.col("k") < 1_250_000))
        fact.upsert(band.select("k", "ckey", (F.col("q") + 1).alias("q")))
        t0 = time.perf_counter()
        ja.refresh()
        probe("matjoinagg_fact_delta_band", time.perf_counter() - t0,
              batch_rows=band.count())

        dim.upsert(spark.range(5).select(
            F.col("id").alias("ckey"), F.lit(2.0).alias("q"),
            F.lit("MOVED").alias("grp")))
        t0 = time.perf_counter()
        ja.refresh()
        moved = ja.read().filter(F.col("grp") == "MOVED").collect()
        probe("matjoinagg_dim_delta_5pct", time.perf_counter() - t0,
              moved_cnt=int(moved[0]["cnt"]) if moved else 0)
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


def main_dedup_bloom() -> None:
    """A/B the dedup-index probe paths on a 1M-doc corpus (9M-row
    fingerprint stores, prefix_len=2) with a 20k-doc micro-batch — the
    batch size PAST the In-pushdown ceiling (~1000 values) that the
    bloom pre-filter exists for. Reports wall time per path plus the
    store rows surviving the exact-store read (the rows that would
    enter the anti-join SHUFFLE — the 100-TB cost the bloom cuts)."""
    from glue_hudi_spark.operators.dedup_index import DedupIndex

    spark = get_spark(app_name="glue_hudi_spark-dedup-bloom-probe")
    work = tempfile.mkdtemp(prefix="ghs_bloomprobe_")
    try:
        n_docs = 1_000_000
        corpus = spark.range(n_docs).select(
            F.format_string("%012d", "id").alias("dk"),
            F.col("id").alias("doc_id"),
            F.format_string(
                "w%da x%db y%dc z%dd q%de r%df s%dg t%dh",
                *([F.col("id")] * 8)).alias("text"))
        docs_tbl = NativeTable(
            spark, f"{work}/docs_tbl", record_keys=["dk"],
            precombine="doc_id", files_per_partition=64,
            stats_cols=["doc_id"])
        docs_tbl.bulk_insert(corpus)
        ix0 = DedupIndex(docs_tbl, id_col="doc_id", prefix_len=2)
        t0 = time.perf_counter()
        ix0.build()
        probe("dedup_bloom_build_1m_docs", time.perf_counter() - t0)
        # batch: 2k exact re-crawls + 18k novel
        batch = (spark.range(2_000).select(
            (F.col("id") + 5_000_000).alias("doc_id"),
            F.format_string(
                "w%da x%db y%dc z%dd q%de r%df s%dg t%dh",
                *([F.col("id") * 137] * 8)).alias("text"))
            .unionByName(spark.range(18_000).select(
                (F.col("id") + 6_000_000).alias("doc_id"),
                F.format_string(
                    "n%dz m%dy l%dx k%dw j%dv i%du h%dt g%ds",
                    *([F.col("id")] * 8)).alias("text")))
            .localCheckpoint(eager=True))
        for label, kw in (("plain", {}),
                          ("bloom", {"probe_bloom_max": 250_000})):
            ix = DedupIndex(docs_tbl, id_col="doc_id", prefix_len=2, **kw)
            t0 = time.perf_counter()
            novel = ix.probe(batch).count()
            sec = time.perf_counter() - t0
            fp = ix._fingerprints(batch)
            joined = ix._pushed_store_read(
                ix.exact_store, "hp", "h", ix._exact_rows(fp),
                ["h"]).count()
            probe(f"dedup_bloom_probe_{label}_20k_batch", sec,
                  novel=novel, exact_rows_into_join=joined)
        # non-indexed arrival dedup, same corpus/batch: the corpus-side
        # hash projection is the left_anti's RIGHT side (cannot
        # broadcast), so plain shuffles all 1M distinct hashes per
        # batch; the bloom knob cuts it to O(batch)
        corpus_txt = docs_tbl.read_snapshot().select("text")
        for label, kw in (("plain", {}),
                          ("bloom", {"bloom_max_buckets": 1_000_000})):
            t0 = time.perf_counter()
            novel = dedup.incremental_exact(
                batch, corpus_txt, **kw).count()
            probe(f"incremental_exact_{label}_20k_batch",
                  time.perf_counter() - t0, novel=novel)
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    if "--sql" in sys.argv[1:]:
        main_sql()
    elif "--timeseries" in sys.argv[1:]:
        main_timeseries()
    elif "--decade" in sys.argv[1:]:
        main_decade()
    elif "--stream" in sys.argv[1:]:
        main_stream()
    elif "--matjoin" in sys.argv[1:]:
        main_matjoin()
    elif "--classifier" in sys.argv[1:]:
        main_classifier()
    elif "--maggr" in sys.argv[1:]:
        main_maggr()
    elif "--dedup-bloom" in sys.argv[1:]:
        main_dedup_bloom()
    elif "--matjoinagg" in sys.argv[1:]:
        main_matjoinagg()
    else:
        main()
