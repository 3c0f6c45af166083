"""Deterministic global shuffle + fixed shard layout for training output.

The last step of a training-data pipeline is writing the curated corpus as
N shards in pseudo-random document order (so a sequential reader sees an
i.i.d.-looking stream without a training-time shuffle buffer having to span
the corpus). Two properties matter at 100 TB:

* **Determinism** — shard assignment and within-shard order derive from a
  content/id hash (md5, engine-portable), never RNG or partition index:
  re-running the pipeline, retries, and speculative tasks all produce the
  same layout, and a SQL oracle can replay it bit-for-bit.
* **No single-task shards** — a naive ``repartition(n_shards, shard)``
  funnels each shard through ONE task (and hash-collides shards onto the
  same task). ``write_shards`` instead range-partitions on (shard, pos):
  Spark's range sampler splits hot shards across many tasks while keeping
  (shard, pos) globally sorted, so ``partitionBy(shard)`` emits per-shard
  directories whose file order preserves the pseudo-random order.

The reference engine has no output-sharding surface; this extends it for
LLM data curation (assignment brief) alongside operators/sampling.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hash_slice(key: Column, start: int) -> Column:
    """Big-endian 32-bit integer from 8 hex chars of md5(key) — the same
    expression DuckDB spells ``cast(concat('0x', substr(md5(k), S, 8)) as
    bigint)``, so oracles replay it exactly."""
    return F.conv(F.substring(F.md5(key.cast("string")), start, 8), 16, 10).cast(
        "bigint"
    )


def assign_shards(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    shard_col: str = "shard",
    pos_col: str = "pos",
) -> DataFrame:
    """Add deterministic (shard, pos) columns derived from md5(key).

    ``shard`` comes from the first 8 hex chars of the digest, ``pos``
    (the within-shard pseudo-random sort key) from the next 8 — two
    independent 32-bit slices of ONE digest per row, so assignment and
    ordering are uncorrelated and the whole step is a map-side projection
    (no shuffle, no RNG).
    """
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    k = F.col(key_col)
    return df.withColumn(shard_col, _hash_slice(k, 1) % n_shards).withColumn(
        pos_col, _hash_slice(k, 9)
    )


def write_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    n_shards: int,
    output_tasks: int | None = None,
    format: str = "parquet",
) -> None:
    """Write ``df`` as ``shard=K`` directories in deterministic
    pseudo-random within-shard order.

    Plan shape: one map-side (shard, pos) projection → ONE range
    repartition (the only shuffle; ``output_tasks`` defaults to the
    session's shuffle parallelism, so a hot shard spreads over many
    tasks) → in-task sort → ``partitionBy(shard)`` write. Within a shard,
    file-name task order preserves global (shard, pos) order, so a reader
    concatenating files in name order sees the deterministic shuffle.
    """
    out = assign_shards(df, key_col, n_shards)
    if output_tasks is None:
        out = out.repartitionByRange(F.col("shard"), F.col("pos"))
    else:
        out = out.repartitionByRange(int(output_tasks), F.col("shard"), F.col("pos"))
    (
        out.sortWithinPartitions("shard", "pos", key_col)
        .write.mode("overwrite")
        .partitionBy("shard")
        .format(format)
        .save(path)
    )


def shard_manifest(df: DataFrame, key_col: str, n_shards: int) -> DataFrame:
    """Per-shard layout report: document count, token mass, and the hash
    range actually occupied — the numbers a serving/training job needs to
    size readers, and a cheap skew check (shards should be ~equal).

    One scan + one ``n_shards``-row aggregate; ``min_by`` surfaces each
    shard's first document in stream order (deterministic: pos ties break
    by key inside the struct ordering).
    """
    from glue_hudi_spark.functions.text import token_count

    assigned = assign_shards(df, key_col, n_shards)
    return (
        assigned.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_count("text").cast("bigint")).alias("n_tokens"),
            F.min(F.struct(F.col("pos"), F.col(key_col))).getField(key_col).alias(
                "first_doc"
            ),
            F.min("pos").alias("min_pos"),
            F.max("pos").alias("max_pos"),
        )
        .orderBy("shard")
    )
