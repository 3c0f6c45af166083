"""Storage hygiene for ``localCheckpoint``-based iterative operators.

``DataFrame.localCheckpoint`` persists its materialized RDD at
MEMORY_AND_DISK and truncates lineage. Spark only frees that storage
when the JVM-side RDD reference is garbage-collected AND the
ContextCleaner runs (periodic GC defaults to every 30 minutes) — so a
long-lived session that executes many iterative operators (label
propagation, BPE merges, index refresh loops) accumulates every
superseded label/edge/vocab table in block-manager memory in the
meantime. At bench/driver scale that is dozens of dead tables resident
at once; at cluster scale it is storage-memory pressure that evicts
live caches.

``release_checkpoint`` frees a checkpoint's blocks immediately.  It is
STRICTLY for frames that are provably dead: every consumer has already
executed, and any successor frame has itself been checkpointed (a
localCheckpoint's lineage is truncated, so once released the frame can
NEVER be recomputed — any later action on it fails). Callers own that
proof; the helper is deliberately best-effort because storage cleanup
must never fail a query.

Both helpers reach through private API
(``df._jdf.queryExecution().analyzed()``); on a Spark upgrade they must
degrade to no-ops, never errors. So they cannot rot SILENTLY, the
module counts its outcomes in ``stats`` — ``tests/test_checkpoint_release.py``
asserts a release actually fires through the public paths, which turns
an API break into a failing test instead of a quietly returning leak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# observability: mutated in place so importers see live values.
# released/leaves_released count blocks actually dropped (the frame was
# persisted); noop counts calls on unpersisted/non-RDD-backed frames;
# failed counts private-API misses (the rot signal).
stats = {"released": 0, "leaves_released": 0, "noop": 0, "failed": 0}


def _unpersist_if_stored(jrdd) -> bool:
    """Drop the RDD's blocks; True only when something was stored."""
    lvl = jrdd.getStorageLevel()
    if not (lvl.useMemory() or lvl.useDisk()):
        return False
    jrdd.unpersist(False)
    return True


def release_checkpoint(df: DataFrame) -> bool:
    """Immediately unpersist a dead ``localCheckpoint``'s storage.

    The checkpointed frame's analyzed plan is a ``LogicalRDD`` wrapping
    the persisted internal-row RDD; unpersist(blocking=False) drops its
    blocks without waiting. No-op (swallowed) for frames that are not
    checkpoint-backed or when the JVM refuses — releasing is an
    optimization, never a correctness step. Returns True when blocks
    were actually dropped.
    """
    try:
        if _unpersist_if_stored(df._jdf.queryExecution().analyzed().rdd()):
            stats["released"] += 1
            return True
        stats["noop"] += 1
    except Exception:
        stats["failed"] += 1
    return False


def release_checkpoint_leaves(df: DataFrame) -> int:
    """Unpersist every persisted ``LogicalRDD`` leaf under ``df``'s plan.

    For a DERIVED frame built on top of one or more dead checkpoints
    (e.g. ``global_row_number``'s output, whose leaf is the internal
    range-partitioned checkpoint), ``release_checkpoint(df)`` is a no-op
    — ``df`` itself is not the LogicalRDD. This walks the analyzed plan
    and releases each checkpoint-backed leaf instead. Same deadness
    contract as above, and stronger: EVERY checkpoint the plan reaches
    must be dead, including ones shared with other frames — only call
    this when the caller owns the whole sub-DAG. Returns the number of
    leaves whose blocks were dropped.
    """
    count = 0
    try:
        stack = [df._jdf.queryExecution().analyzed()]
        while stack:
            node = stack.pop()
            if node.getClass().getSimpleName() == "LogicalRDD":
                try:
                    if _unpersist_if_stored(node.rdd()):
                        count += 1
                except Exception:
                    stats["failed"] += 1
            kids = node.children()
            for i in range(kids.size()):
                stack.append(kids.apply(i))
    except Exception:
        stats["failed"] += 1
    if count:
        stats["leaves_released"] += count
    else:
        stats["noop"] += 1
    return count
