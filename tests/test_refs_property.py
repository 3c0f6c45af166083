"""Model-checked random walks over the refs machinery.

A seeded random sequence of {main upsert/delete, branch create/write/
fast-forward/drop, tag create/drop, clean, expire, vacuum} runs against
both the engine and a plain-dict model; after every walk the engine's
main, every live branch, and every tag must equal the model EXACTLY, and
``validate()`` must report a fully consistent store — the invariant net
that catches cross-ref file-accounting bugs (a clean freeing a tagged
file, a vacuum eating a live branch, a fast-forward losing rows).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from glue_hudi_spark.storage.commits import ConcurrentWriteError
from glue_hudi_spark.storage.native import NativeTable

SCHEMA = T.StructType([
    T.StructField("k", T.StringType()),
    T.StructField("v", T.IntegerType()),
    T.StructField("seq", T.IntegerType()),
])


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _state(table, **kw) -> dict[str, int]:
    return {r["k"]: r["v"] for r in
            table.read_snapshot(**kw).select("k", "v").collect()}


@pytest.mark.parametrize("seed", [11, 29, 47])
def test_refs_random_walk_matches_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    t = NativeTable(spark, tmp_path / f"t{seed}", record_keys=["k"],
                    precombine="seq", files_per_partition=2,
                    retain_commits=4)
    seq = [0]

    def batch(n):
        out = []
        for _ in range(n):
            seq[0] += 1  # per-ROW: in-batch duplicate keys never tie
            out.append((f"k{rng.randrange(25)}", rng.randrange(1000),
                        seq[0]))
        return out

    def apply_upsert(model, rows):
        latest = {}
        for k, v, s in rows:
            if k not in latest or s >= latest[k][1]:
                latest[k] = (v, s)
        for k, (v, _) in latest.items():
            model[k] = v

    main: dict[str, int] = {}
    rows = batch(20)
    t.bulk_insert(_df(spark, rows))
    apply_upsert(main, rows)

    branches: dict[str, tuple[dict, bool]] = {}  # name -> (model, ff_legal)
    tags: dict[str, dict] = {}
    bn = tn = 0

    for _ in range(14):
        op = rng.choice(
            ["upsert", "delete", "mk_branch", "branch_write", "ff",
             "drop_branch", "mk_tag", "drop_tag", "clean", "vacuum",
             "expire"])
        if op == "upsert":
            rows = batch(6)
            t.upsert(_df(spark, rows))
            apply_upsert(main, rows)
            # main moved: every fork base is stale now
            branches = {n: (m, False) for n, (m, _) in branches.items()}
        elif op == "delete" and main:
            ks = rng.sample(sorted(main), min(3, len(main)))
            t.delete(spark.createDataFrame([(k,) for k in ks], "k string"))
            for k in ks:
                main.pop(k, None)
            branches = {n: (m, False) for n, (m, _) in branches.items()}
        elif op == "mk_branch" and len(branches) < 2:
            bn += 1
            name = f"b{bn}"
            t.create_branch(name)
            branches[name] = (dict(main), True)
        elif op == "branch_write" and branches:
            name = rng.choice(sorted(branches))
            m, legal = branches[name]
            rows = batch(5)
            t.branch(name).upsert(_df(spark, rows))
            apply_upsert(m, rows)
            branches[name] = (m, legal)
        elif op == "ff" and branches:
            name = rng.choice(sorted(branches))
            m, legal = branches[name]
            if legal:
                t.fast_forward(name, drop=True)
                main = dict(m)
                del branches[name]
                # other branches' fork bases just went stale
                branches = {n: (mm, False)
                            for n, (mm, _) in branches.items()}
            else:
                with pytest.raises(ConcurrentWriteError):
                    t.fast_forward(name)
        elif op == "drop_branch" and branches:
            name = rng.choice(sorted(branches))
            t.drop_branch(name)
            del branches[name]
        elif op == "mk_tag" and len(tags) < 2:
            tn += 1
            t.create_tag(f"v{tn}")
            tags[f"v{tn}"] = dict(main)
        elif op == "drop_tag" and tags:
            name = rng.choice(sorted(tags))
            t.drop_tag(name)
            del tags[name]
        elif op == "clean":
            t.timeline.clean(t.retain_commits)
        elif op == "vacuum":
            t.vacuum()
        elif op == "expire":
            import time as _time
            t.expire_snapshots(older_than=_time.time() + 1, retain_last=2)

        assert _state(t) == main
        for name, (m, _) in branches.items():
            assert _state(t.branch(name)) == m, f"branch {name} diverged"
        for name, m in tags.items():
            assert _state(t, tag=name) == m, f"tag {name} diverged"

    rep = t.validate()
    assert rep["missing_files"] == [], rep
    assert rep["unreadable_manifests"] == [], rep
    # orphans from dropped branches are allowed until vacuum; after one
    # final vacuum the store is fully consistent
    t.vacuum()
    rep = t.validate()
    assert rep["ok"], rep
    assert _state(t) == main
    for name, m in tags.items():
        assert _state(t, tag=name) == m
