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
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def release_checkpoint(df: DataFrame) -> None:
    """Immediately unpersist a dead ``localCheckpoint``'s storage.

    The checkpointed frame's analyzed plan is a ``LogicalRDD`` wrapping
    the persisted internal-row RDD; unpersist(blocking=False) drops its
    blocks without waiting. No-op (swallowed) for frames that are not
    checkpoint-backed or when the JVM refuses — releasing is an
    optimization, never a correctness step.
    """
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass
