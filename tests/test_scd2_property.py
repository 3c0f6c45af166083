"""Randomized replay properties for the round-5c flagship operators:
SCD2 (build matches a dict oracle; incremental apply ≡ full rebuild at
any time split), IVM (maintained ≡ recomputed across random commit
sequences), recon (random corruptions localize exactly)."""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import Row, functions as F

from glue_hudi_spark.operators import ivm, recon, scd2
from glue_hudi_spark.storage.native import NativeTable


def _ts(n: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=n)


def _gen_events(rng, n_keys=8, n_events=60, n_attrs=4):
    """(key, minute, attr) with unique minutes per key (ties would make
    version order ambiguous — a data-contract precondition, not a code
    limitation)."""
    out = []
    for k in range(n_keys):
        minutes = rng.sample(range(1000), rng.randint(1, n_events // n_keys + 2))
        for m in sorted(minutes):
            out.append((f"k{k}", m, f"a{rng.randrange(n_attrs)}"))
    return out


def _scd2_oracle(events):
    """Per key: collapse consecutive-equal attrs, then half-open spans."""
    by_key: dict = {}
    for k, m, a in sorted(events):
        by_key.setdefault(k, []).append((m, a))
    expected = set()
    for k, seq in by_key.items():
        versions = []
        for m, a in seq:
            if not versions or versions[-1][1] != a:
                versions.append((m, a))
        for i, (m, a) in enumerate(versions):
            end = _ts(versions[i + 1][0]) if i + 1 < len(versions) else \
                dt.datetime(2200, 1, 1, 0, 0, 0)
            expected.add((k, a, _ts(m), end, i + 1 == len(versions)))
    return expected


def _df(spark, events):
    return spark.createDataFrame(
        [Row(k=k, ts=_ts(m), attr=a) for k, m, a in events])


@pytest.mark.parametrize("seed", [1, 7, 42])
def test_scd2_build_matches_dict_oracle(spark, seed):
    events = _gen_events(random.Random(seed))
    got = {
        (r["k"], r["attr"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in scd2.scd2_build(
            _df(spark, events), ["k"], "ts", ["attr"]).collect()
    }
    assert got == _scd2_oracle(events)


@pytest.mark.parametrize("seed", [3, 11])
def test_scd2_apply_equals_rebuild_at_any_split(spark, seed):
    rng = random.Random(seed)
    events = _gen_events(rng)
    cut = rng.randrange(200, 800)
    prefix = [e for e in events if e[1] < cut]
    suffix = [e for e in events if e[1] >= cut]
    if not prefix or not suffix:
        pytest.skip("degenerate split")
    scd = scd2.scd2_build(_df(spark, prefix), ["k"], "ts", ["attr"])
    applied = scd2.scd2_apply(scd, _df(spark, suffix), ["k"], "ts", ["attr"])
    rebuilt = scd2.scd2_build(_df(spark, events), ["k"], "ts", ["attr"])
    canon = lambda df: sorted(
        (r["k"], r["attr"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in df.collect())
    assert canon(applied) == canon(rebuilt)


@pytest.mark.parametrize("seed", [5])
def test_ivm_maintained_equals_recompute_random_commits(spark, tmp_path, seed):
    rng = random.Random(seed)
    t = NativeTable(spark, tmp_path / "t", record_keys=["id"],
                    precombine="seq", partition_keys=[])
    rows = [(f"r{i}", f"g{rng.randrange(4)}", float(rng.randrange(100)), 1)
            for i in range(40)]
    t.bulk_insert(spark.createDataFrame(
        rows, "id string, grp string, value double, seq int"))
    state = ivm.aggregate_state(t.read_snapshot(as_of=1), ["grp"], "value")

    for step in range(2, 5):
        ids = rng.sample(range(40), rng.randint(3, 10))
        batch = spark.createDataFrame(
            [(f"r{i}", f"g{rng.randrange(5)}", float(rng.randrange(100)), step)
             for i in ids],
            "id string, grp string, value double, seq int")
        if rng.random() < 0.3:
            t.delete(batch)
        else:
            t.upsert(batch)
        state = ivm.apply_change_feed(
            state, t.change_feed(step - 1, step), ["grp"], "value")
        maintained = {r["grp"]: (r["cnt"], float(r["total"]))
                      for r in state.collect()}
        recomputed = {r["grp"]: (r["cnt"], float(r["total"]))
                      for r in ivm.aggregate_state(
                          t.read_snapshot(as_of=step),
                          ["grp"], "value").collect()}
        assert maintained == recomputed, f"diverged at commit {step}"


@pytest.mark.parametrize("seed", [2, 13])
def test_recon_localizes_random_corruptions(spark, seed):
    rng = random.Random(seed)
    rows = [(f"g{i % 6}", i, f"v{rng.randrange(50)}") for i in range(200)]
    corrupt_groups = set(rng.sample([f"g{i}" for i in range(6)], 2))
    brows = [
        (g, k, v + "_X" if g in corrupt_groups and rng.random() < 0.3 else v)
        for g, k, v in rows
    ]
    # ensure every chosen group actually got at least one corruption
    touched = {g for (g, k, v), (_, _, bv) in zip(rows, brows) if v != bv}
    a = spark.createDataFrame(rows, "g string, k int, v string")
    b = spark.createDataFrame(brows, "g string, k int, v string")
    out = recon.reconcile(a, b, ["g"], ["k", "v"])
    mismatched = {r["g"] for r in out.collect()
                  if not r["ck_match"] or r["n_a"] != r["n_b"]}
    assert mismatched == touched
