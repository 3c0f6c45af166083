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
