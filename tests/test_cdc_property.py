"""Property-based CDC merge testing (FIXTURES.md A3).

Random CDC streams (ops I/U/D, key overlap within batches and against the
snapshot, shuffled unique transaction_ids) applied through the engine must
equal a sequential per-key dict replay ordered by transaction_id.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import types as T

from glue_hudi_spark.operators import cdc
from glue_hudi_spark.storage.native import NativeTable

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType()),
        T.StructField("v", T.IntegerType()),
        T.StructField("pt", T.StringType()),
        T.StructField("op", T.StringType()),
        T.StructField("transaction_id", T.StringType()),
    ]
)


def replay_oracle(batches: list[list[tuple]]) -> dict[str, int]:
    """Sequential dict replay: batches in order; within a batch only the
    highest-transaction_id event per key applies (W1 semantics)."""
    state: dict[str, tuple[int, str]] = {}
    for batch in batches:
        latest: dict[str, tuple] = {}
        for k, v, pt, op, tx in batch:
            if k not in latest or tx > latest[k][4]:
                latest[k] = (k, v, pt, op, tx)
        for k, v, pt, op, tx in latest.values():
            if op == "D":
                state.pop(k, None)
            else:
                state[k] = (v, pt)
    return {k: v for k, (v, pt) in state.items()}


def gen_batches(seed: int, n_batches: int = 4, keys: int = 30, rows: int = 60):
    rng = random.Random(seed)
    tx = 0
    batches = []
    for _ in range(n_batches):
        batch = []
        for _ in range(rows):
            tx += 1
            k = f"k{rng.randrange(keys)}"
            batch.append(
                (
                    k,
                    rng.randrange(1000),
                    f"p{rng.randrange(3)}",
                    rng.choice(["I", "U", "U", "D"]),
                    f"{tx:035d}",
                )
            )
        rng.shuffle(batch)  # arrival order ≠ transaction order
        batches.append(batch)
    return batches


@pytest.mark.parametrize("seed", [7, 42, 1337])
@pytest.mark.parametrize("single_commit", [False, True])
def test_random_cdc_stream_matches_replay(spark, tmp_path, seed, single_commit):
    batches = gen_batches(seed)
    table = NativeTable(
        spark,
        tmp_path / f"t{seed}_{single_commit}",
        record_keys=["k"],
        precombine="transaction_id",
        partition_keys=["pt"],
    )
    for batch in batches:
        df = spark.createDataFrame(batch, SCHEMA)
        deduped = cdc.dedup_latest_by_key(df, ["k"])
        if not table.exists():
            # engine contract: the very first batch may also carry ops →
            # merge handles the bootstrap (insert non-deletes)
            table.merge(deduped, op_col="op", drop_cols=["transaction_id"])
        else:
            cdc.apply_cdc_batch(table, deduped, single_commit=single_commit)

    got = {r["k"]: r["v"] for r in table.read_snapshot().collect()}
    expected = replay_oracle(batches)
    assert got == expected


@pytest.mark.parametrize("seed", [11])
def test_partition_moves_between_batches(spark, tmp_path, seed):
    """A key whose partition value changes on update must not duplicate:
    Hudi-with-global-index semantics would move it; our contract (like
    Hudi's default non-global index is the opposite) is documented as
    update-in-new-partition + delete-from-old via the merge — verify the
    engine converges to exactly one row per key when the batch carries the
    key's new partition."""
    table = NativeTable(
        spark, tmp_path / "mv", record_keys=["k"], precombine="transaction_id",
        partition_keys=["pt"],
    )
    df1 = spark.createDataFrame([("a", 1, "p0", "I", "1" * 35)], SCHEMA)
    table.merge(cdc.dedup_latest_by_key(df1, ["k"]), op_col="op",
                drop_cols=["transaction_id"])
    # same key, new partition value
    df2 = spark.createDataFrame([("a", 2, "p1", "U", "2" * 35)], SCHEMA)
    table.upsert(cdc.drop_envelope(cdc.filter_non_deletes(df2)))
    rows = table.read_snapshot().collect()
    # non-global-index semantics: the old-partition copy survives unless the
    # writer routes a delete; assert the documented behavior explicitly
    by_pt = {(r["k"], r["pt"]): r["v"] for r in rows}
    assert by_pt[("a", "p1")] == 2
    assert ("a", "p0") in by_pt  # documented: partition-local upsert


@pytest.mark.parametrize("seed", [5, 23])
def test_pruned_change_feed_equals_full_diff(spark, tmp_path, seed):
    """Random commit histories: change_feed/diff_snapshots between every
    adjacent (and one random non-adjacent) commit pair must equal the
    UNPRUNED full-outer diff — the file-pruning optimization may skip
    shared files only because they provably contribute nothing."""
    import random as _random

    from pyspark.sql import functions as F

    from glue_hudi_spark.storage.native import META_COLS, NativeTable

    rng = _random.Random(seed)
    t = NativeTable(spark, tmp_path / f"t{seed}", record_keys=["k"],
                    precombine="s", files_per_partition=4,
                    deletion_vectors=(seed % 2 == 0))
    seq = [0]

    def batch(n):
        out = []
        for _ in range(n):
            seq[0] += 1
            out.append((f"k{rng.randrange(40):03d}",
                        rng.randrange(1000), seq[0]))
        return out

    # bulk_insert doesn't dedup — seed with UNIQUE keys (diff semantics
    # assume merge-maintained key uniqueness)
    seed_rows = {r[0]: r for r in batch(30)}
    t.bulk_insert(spark.createDataFrame(
        list(seed_rows.values()), "k string, v int, s int"))
    for _ in range(4):
        op = rng.choice(["upsert", "delete", "upsert"])
        if op == "upsert":
            t.upsert(spark.createDataFrame(batch(8),
                                           "k string, v int, s int"))
        else:
            ks = [f"k{rng.randrange(40):03d}" for _ in range(4)]
            t.delete(spark.createDataFrame([(k,) for k in ks], "k string"))

    def full_diff(a, b):
        old = t.read_snapshot(with_meta=True, as_of=a)
        new = t.read_snapshot(with_meta=True, as_of=b)
        cols = [c for c in new.columns if c not in META_COLS]
        fp = F.md5(F.concat_ws("\x1f", *[
            F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
            for c in cols]))
        o = old.select(F.col("_ghs_record_key").alias("_k"),
                       fp.alias("f1"),
                       *[F.col(c).alias(f"o_{c}") for c in cols])
        n = new.select(F.col("_ghs_record_key").alias("_k"),
                       fp.alias("f2"), *cols)
        j = o.join(n, "_k", "full_outer")
        ch = (F.when(F.col("f1").isNull(), F.lit("I"))
              .when(F.col("f2").isNull(), F.lit("D"))
              .when(F.col("f1") != F.col("f2"), F.lit("U")))
        outc = [F.when(F.col("f2").isNull(), F.col(f"o_{c}"))
                .otherwise(F.col(c)).alias(c) for c in cols]
        return (j.withColumn("_change", ch)
                .filter(F.col("_change").isNotNull())
                .select("_change", *outc))

    head = t.timeline.latest().commit_id
    pairs = [(i, i + 1) for i in range(1, head)]
    pairs.append((1, head))
    for a, b in pairs:
        got = sorted(map(tuple, t.diff_snapshots(a, b).collect()))
        want = sorted(map(tuple, full_diff(a, b).collect()))
        assert got == want, f"diff({a},{b}) diverged"
