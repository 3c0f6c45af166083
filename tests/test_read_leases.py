"""Reader leases: a long-running scan's snapshot survives concurrent
retention cleaning (r12 verdict #8 — the VACUUM-safe concurrent-reader
contract at the storage layer). A lease pins one manifest; clean() /
expire_snapshots() treat it as retained, vacuum never touches referenced
files, and expired leases stop protecting anything."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from glue_hudi_spark.storage.native import NativeTable


def _mk(spark, path, commits=6, retain=10):
    t = NativeTable(spark, path, record_keys=["id"],
                    files_per_partition=1, retain_commits=retain)
    t.bulk_insert(spark.range(20).select(
        "id", F.lit(0).alias("wave"), (F.col("id") * 1.0).alias("v")))
    for w in range(1, commits):
        t.upsert(spark.range(20).select(
            "id", F.lit(w).alias("wave"),
            (F.col("id") + w * 100.0).alias("v")))
    return t


def test_lease_pins_snapshot_through_aggressive_clean(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    old_id = 2
    expect = {(r.id, r.v) for r in t.read_snapshot(as_of=old_id).collect()}
    lease = t.timeline.acquire_lease(commit_id=old_id, ttl=600,
                                     holder="test-reader")
    try:
        deleted = t.timeline.clean(retain_commits=1)
        # the leased manifest survived; everything older than it (and
        # unleased commits between it and the head) is reclaimable
        retained = {c.commit_id for c in t.timeline.history()}
        assert old_id in retained
        got = {(r.id, r.v) for r in t.read_snapshot(as_of=old_id).collect()}
        assert got == expect
        # vacuum after the clean must not break the leased read either
        t.vacuum()
        got = {(r.id, r.v) for r in t.read_snapshot(as_of=old_id).collect()}
        assert got == expect
        assert isinstance(deleted, list)
    finally:
        t.timeline.release_lease(lease)
    # released: the next clean is free to drop it
    t.timeline.clean(retain_commits=1)
    assert {c.commit_id for c in t.timeline.history()} == {
        t.timeline.latest().commit_id}


def test_read_lease_context_manager_end_to_end(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    with t.read_lease(ttl=600, holder="ctx-reader") as snap:
        head = t.timeline.latest().commit_id
        # maintenance races in while the reader holds only a plan
        t.upsert(spark.range(20).select(
            "id", F.lit(99).alias("wave"), F.lit(-1.0).alias("v")))
        t.timeline.clean(retain_commits=1)
        t.vacuum()
        rows = snap.collect()  # the leased plan still reads cleanly
        assert len(rows) == 20
        assert all(r.wave != 99 for r in rows)  # pinned BEFORE the upsert
        assert head in {c.commit_id for c in t.timeline.history()}
    # context exit released the lease file
    assert t.timeline.leased_commits() == set()


def test_expired_lease_stops_protecting_and_is_reaped(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    lease = t.timeline.acquire_lease(commit_id=2, ttl=-1)  # born expired
    assert t.timeline.leased_commits() == set()
    assert not lease.exists()  # reaped in passing
    t.timeline.clean(retain_commits=1)
    assert {c.commit_id for c in t.timeline.history()} == {
        t.timeline.latest().commit_id}


def test_expire_snapshots_honors_lease(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    lease = t.timeline.acquire_lease(commit_id=3, ttl=600)
    try:
        out = t.timeline.expire_snapshots(older_than="2100-01-01",
                                          retain_last=1)
        assert 3 not in out["expired"]
        assert t.timeline.at(3) is not None
    finally:
        t.timeline.release_lease(lease)


def test_lease_requires_retained_commit_and_records_holder(spark,
                                                           tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.timeline.clean(retain_commits=2)
    with pytest.raises(ValueError, match="not retained"):
        t.timeline.acquire_lease(commit_id=1)
    lease = t.timeline.acquire_lease(holder="audit-job")
    try:
        rec = json.loads(lease.read_text())
        assert rec["holder"] == "audit-job"
        assert rec["commit_id"] == t.timeline.latest().commit_id
    finally:
        t.timeline.release_lease(lease)
