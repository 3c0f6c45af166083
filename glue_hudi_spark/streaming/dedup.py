"""Streaming dedup + sessionization — the always-on tier of the batch
dedup family (``operators.dedup``) and of ``events_sessionization``.

Both operators carry per-key state; the watermark is what keeps that state
FINITE on an unbounded stream — the central 100 TB/day design constraint:

* ``streaming_exact_dedup`` — ``dropDuplicatesWithinWatermark``: a key's
  dedup state lives only until the watermark passes it, so the state store
  holds ~(arrival-rate × watermark) keys instead of the whole history.
  Exactly-once per key *within* the watermark horizon; a replay arriving
  later than the horizon is a new row (document the horizon as the dedup
  SLA).
* ``streaming_sessionization`` — native ``session_window`` aggregation
  (gap-based, same 30-minute-inactivity semantics as the batch
  ``events_sessionization`` query). A session's state is emitted and
  dropped once the watermark passes ``session_end + gap``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_exact_dedup(
    stream: DataFrame,
    id_cols: list[str],
    time_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Drop duplicate rows by ``id_cols`` with state bounded by the
    watermark (at-least-once source → effectively-once sink within the
    horizon)."""
    return stream.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(
        id_cols
    )


def streaming_sessionization(
    stream: DataFrame,
    key_col: str = "user_id",
    time_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Gap-based sessions per key — (user_id, session_start, session_end,
    n_events, total_value). In append mode a session is final once the
    watermark passes its close (end + gap): identical grouping semantics to
    the batch lag+running-sum sessionization, computed incrementally."""
    return (
        stream.withWatermark(time_col, watermark)
        .groupBy(
            F.col(key_col),
            F.session_window(F.col(time_col), gap).alias("sw"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            key_col,
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )
