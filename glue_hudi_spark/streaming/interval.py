"""Stream-stream interval join — the always-on form of the batch
``operators.ranges.interval_join``.

Structured Streaming joins two streams directly when the join condition
bounds event time on both sides (an "interval join" in Flink terms):
given watermarks on both inputs, Spark can compute how long a row must be
buffered before no future match can arrive, so join state stays FINITE —
the property that makes this run forever at stream scale. Without the
time bounds (or the watermarks) state grows without limit and Spark
rejects append-mode output.

The batch variant buckets time to avoid a nested-loop plan; streaming
needs no buckets — the micro-batch engine ranges over the watermark-
bounded state store instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def stream_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str,
    point_ts: str = "ts",
    start_col: str = "w_start",
    end_col: str = "w_end",
    point_watermark: str = "1 hour",
    interval_watermark: str = "2 hours",
) -> DataFrame:
    """Inner-join each streaming point to the streaming intervals
    containing it.

    ``interval_watermark`` must cover ``point_watermark`` plus the
    longest interval length — it bounds how long an open interval is
    held in state waiting for late points. Column names must be disjoint
    apart from ``on``.
    """
    p = points.withWatermark(point_ts, point_watermark)
    iv = intervals.withWatermark(start_col, interval_watermark)
    cond = (
        (p[on] == iv[on])
        & (p[point_ts] >= iv[start_col])
        & (p[point_ts] <= iv[end_col])
    )
    return p.join(iv, cond, "inner").drop(iv[on])
