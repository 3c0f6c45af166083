"""Boundary-clustered merge rewrites (the no-sampling range cluster).

Pins the three load-bearing facts of ``_boundary_cluster``:

1. the driver-side Murmur3 replica matches Spark's ``F.hash`` (and so
   HashPartitioning) for int32 inputs — the exact bucket→partition
   routing depends on it;
2. ``_hash_partition_tokens`` really is the inverse of
   ``pmod(hash, width)``;
3. a merge rewrite that takes the boundary path still writes one
   disjoint key interval per file (the layout the per-file key_stats
   pruning index depends on) and produces exactly the same table state
   as the sampling path.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from glue_hudi_spark.storage.native import (
    NativeTable,
    _hash_partition_tokens,
    _murmur3_hash_int32,
)


def test_murmur3_parity_with_spark(spark):
    vals = list(range(-50, 3000, 7)) + [0, 1, 2**31 - 1, -(2**31)]
    df = spark.createDataFrame([(v,) for v in vals], "x int")
    got = {r["x"]: r["h"] for r in df.select(
        "x", F.hash("x").alias("h")).collect()}
    for v in vals:
        assert got[v] == _murmur3_hash_int32(v), v


@pytest.mark.parametrize("width", [2, 3, 8, 17, 64])
def test_partition_tokens_invert_pmod(width):
    toks = _hash_partition_tokens(width)
    assert len(set(toks)) == width
    for i, t in enumerate(toks):
        assert _murmur3_hash_int32(t) % width == i


def test_tokens_route_to_predicted_partitions(spark):
    width = 8
    toks = _hash_partition_tokens(width)
    df = spark.createDataFrame([(t, i) for i, t in enumerate(toks)],
                               "tok int, want int")
    rows = (df.repartition(width, F.col("tok"))
            .select("want", F.spark_partition_id().alias("got")).collect())
    for r in rows:
        assert r["got"] == r["want"]


def _key_stats_of(t: NativeTable):
    return t.timeline.latest().key_stats


def test_boundary_rewrite_layout_and_equivalence(spark, tmp_path):
    base = spark.range(0, 4000).select(
        F.format_string("k%05d", "id").alias("k"),
        (F.col("id") * 2).alias("v"),
    )
    batch = spark.range(0, 4000, 5).select(
        F.format_string("k%05d", "id").alias("k"),
        (F.col("id") * 10 + 1).alias("v"),
    )

    def build(path, force_sampling):
        t = NativeTable(spark, path, record_keys=["k"], precombine="v",
                        partition_keys=[], files_per_partition=8)
        t.bulk_insert(base)
        if force_sampling:
            # disable the boundary path: the sampling path is the
            # behavior baseline the new path must reproduce
            t._merge_boundaries = lambda affected, prev: None
        t.upsert(batch)
        return t

    t_new = build(str(tmp_path / "new"), force_sampling=False)
    t_old = build(str(tmp_path / "old"), force_sampling=True)

    # same logical state either way
    a = sorted(map(tuple, t_new.read_snapshot().collect()))
    b = sorted(map(tuple, t_old.read_snapshot().collect()))
    assert a == b

    # the upsert hit every file (batch spans the key space) and the
    # boundary path kept the disjoint-interval layout
    stats = _key_stats_of(t_new)
    head = t_new.timeline.latest()
    assert head.stats["files_rewritten"] == 8
    new_files = [f for f in head.files if f in stats]
    assert len(new_files) == 8
    ivals = sorted((stats[f][0], stats[f][1]) for f in new_files)
    for (lo1, hi1), (lo2, hi2) in zip(ivals, ivals[1:]):
        assert hi1 < lo2, f"overlapping file intervals {hi1} vs {lo2}"


def test_boundary_rewrite_narrow_batch(spark, tmp_path):
    """A batch hitting a strict subset of files keeps pruning selective."""
    base = spark.range(0, 4000).select(
        F.format_string("k%05d", "id").alias("k"), F.col("id").alias("v"))
    t = NativeTable(spark, str(tmp_path / "t"), record_keys=["k"],
                    precombine="v", partition_keys=[],
                    files_per_partition=8)
    t.bulk_insert(base)
    batch = spark.range(100, 300).select(
        F.format_string("k%05d", "id").alias("k"),
        (F.col("id") + 100000).alias("v"))
    t.upsert(batch)
    head = t.timeline.latest()
    assert head.stats["files_rewritten"] <= 2
    got = {r["k"]: r["v"] for r in t.read_snapshot().collect()}
    assert got["k00100"] == 100100 and got["k00099"] == 99
    assert len(got) == 4000
