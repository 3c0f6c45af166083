"""Record-key bloom index (Hudi BLOOM-index parity).

The interval key index prunes on the batch's convex hull [lo, hi]; a
scattered batch (e.g. the table's first and last key) spans every file's
range and defeats it. Blooms test each key's MEMBERSHIP, so the same
batch rewrites only the files that can actually contain its keys.
"""

from __future__ import annotations

import pytest

from glue_hudi_spark.storage.native import BLOOM_DIR, NativeTable


def _mk(spark, path, bloom: bool):
    return NativeTable(spark, path, record_keys=["id"], precombine="s",
                       files_per_partition=8, bloom_index=bloom)


def _rows(spark, pairs):
    return spark.createDataFrame(
        [(k, s, v) for (k, s, v) in pairs], "id string, s int, v string"
    )


@pytest.fixture()
def seeded(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, bloom=True)
    t.bulk_insert(_rows(spark, [(f"{i:04d}", 1, "x") for i in range(1000)]))
    return t


def test_bloom_sidecars_written(seeded):
    commit = seeded.timeline.latest()
    assert len(commit.files) == 8
    for f in commit.files:
        assert (seeded.root / BLOOM_DIR / (f + ".bloom")).is_file()


def test_scattered_upsert_prunes_by_membership(spark, seeded):
    """First + last key: the range hull spans all 8 files, blooms keep 2."""
    c = seeded.upsert(_rows(spark, [("0000", 2, "y"), ("0999", 2, "y")]))
    assert c.stats["files_rewritten"] == 2
    assert c.stats["files_carried"] == 6
    snap = seeded.read_snapshot()
    assert snap.count() == 1000
    assert {r["id"] for r in snap.filter("v = 'y'").collect()} == {"0000", "0999"}

    # identical table WITHOUT blooms rewrites everything the hull touches
    t2 = _mk(spark, str(seeded.root) + "_nb", bloom=False)
    t2.bulk_insert(_rows(spark, [(f"{i:04d}", 1, "x") for i in range(1000)]))
    c2 = t2.upsert(_rows(spark, [("0000", 2, "y"), ("0999", 2, "y")]))
    assert c2.stats["files_rewritten"] == 8


def test_bloom_pruned_delete(spark, seeded):
    c = seeded.delete(_rows(spark, [("0500", 9, "z")]))
    assert c.stats["files_rewritten"] == 1
    assert seeded.read_snapshot().count() == 999


def test_only_new_keys_skip_every_bloom(spark, seeded):
    """Keys inside the table's range but absent everywhere: blooms skip
    (almost) all files — false positives (~1%) may keep the odd file
    affected, which costs a rewrite but never correctness."""
    c = seeded.upsert(_rows(spark, [("0123x", 2, "n"), ("0987x", 2, "n")]))
    assert c.stats["files_rewritten"] <= 1  # ≤ one fp across 16 probes
    assert seeded.read_snapshot().count() == 1002


def test_missing_sidecar_is_safe(spark, seeded):
    """A file without a bloom stays affected — pruning degrades, results
    don't."""
    victim = seeded.timeline.latest().files[0]
    (seeded.root / BLOOM_DIR / (victim + ".bloom")).unlink()
    c = seeded.upsert(_rows(spark, [("0000", 3, "w"), ("0999", 3, "w")]))
    # the de-bloomed file is kept affected on top of the two real hits
    # (0000 lives in the victim file, so 2 or 3 depending on overlap)
    assert 2 <= c.stats["files_rewritten"] <= 3
    snap = seeded.read_snapshot()
    assert snap.count() == 1000
    assert snap.filter("v = 'w'").count() == 2


def test_read_keys_point_lookup(spark, seeded):
    """read_keys reads only the files the range+bloom indexes admit."""
    out = seeded.read_keys(["0000", "0999"])
    assert {r["id"] for r in out.collect()} == {"0000", "0999"}
    assert len(out.inputFiles()) <= 3  # 2 real hits (+ possible bloom fp)

    # absent key inside the hull: range can't prune, blooms reject ~all
    miss = seeded.read_keys(["0123x"])
    assert miss.count() == 0
    assert len(miss.inputFiles()) <= 1

    # range-only table (no blooms): disjoint per-file ranges still prune
    t2 = _mk(spark, str(seeded.root) + "_rk", bloom=False)
    t2.bulk_insert(_rows(spark, [(f"{i:04d}", 1, "x") for i in range(1000)]))
    out2 = t2.read_keys(["0500"])
    assert out2.count() == 1
    assert len(out2.inputFiles()) == 1


def test_read_keys_mor_falls_back_to_snapshot(spark, tmp_table_dir):
    t = NativeTable(spark, tmp_table_dir, record_keys=["id"], precombine="s",
                    storage_type="mor", files_per_partition=4)
    t.bulk_insert(_rows(spark, [(f"{i:03d}", 1, "x") for i in range(100)]))
    t.upsert(_rows(spark, [("050", 2, "y")]))
    out = t.read_keys(["050", "051"])
    got = {(r["id"], r["v"]) for r in out.collect()}
    assert got == {("050", "y"), ("051", "x")}


def test_clean_removes_orphan_sidecars(spark, tmp_table_dir):
    t = NativeTable(spark, tmp_table_dir, record_keys=["id"], precombine="s",
                    retain_commits=2, files_per_partition=2, bloom_index=True)
    for i in range(4):
        t.upsert(_rows(spark, [(f"k{j}", i, f"v{i}") for j in range(10)]))
    live = {f for c in t.timeline.history() for f in c.files}
    bloom_root = t.root / BLOOM_DIR
    sidecars = {
        str(p.relative_to(bloom_root))[: -len(".bloom")]
        for p in bloom_root.rglob("*.bloom")
    }
    assert sidecars == live  # no orphans for cleaned commits' files


def test_sidecar_bytes_never_transit_the_driver(spark, tmp_table_dir,
                                                monkeypatch):
    """The build writes sidecars from EXECUTOR tasks (Python workers are
    separate processes in local mode); the driver collects only rel
    paths. Pin it: poison driver-side Path.write_bytes for anything under
    _index/bloom — the build must still produce valid sidecars without
    tripping it, so no payload was staged driver-side."""
    import pathlib

    real = pathlib.Path.write_bytes

    def poisoned(self, data):
        if BLOOM_DIR in str(self):
            raise AssertionError(
                f"driver-side sidecar write: {self} ({len(data)} bytes)")
        return real(self, data)

    monkeypatch.setattr(pathlib.Path, "write_bytes", poisoned)
    t = _mk(spark, tmp_table_dir, bloom=True)
    t.bulk_insert(_rows(spark, [(f"{i:04d}", 1, "x") for i in range(500)]))
    idx = tmp_table_dir / BLOOM_DIR
    sidecars = list(idx.rglob("*.bloom"))
    assert sidecars, "no sidecars built"
    for p in sidecars:  # valid format, no leftover tmp files
        raw = p.read_bytes()
        k, m_bits = raw[0], int.from_bytes(raw[1:9], "little")
        assert k == 7 and len(raw) - 9 == m_bits // 8
    assert not list(idx.rglob("*.inprogress"))
