"""Watermarked windowed aggregation — the Structured Streaming late-data
surface.

The batch engine's ``events_hourly_rollup`` has an always-on equivalent:
tumbling event-time windows with a watermark bounding how late a row may
arrive and still be counted. State for a window is dropped once the
watermark passes its end — that bound is what keeps a 100 TB/day stream's
state store finite.

Contrast with the CDC path (SURVEY §2.5): the merge pipeline deliberately
has NO watermark — late CDC rows always merge and simply lose to higher
transaction_ids. Windowed analytics DO drop late rows; both behaviors are
part of the engine's contract and both are tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    stream: DataFrame,
    time_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Tumbling-window counts/sums with a late-data watermark.

    Emits (window_start, window_end, <group_cols…>, n, total_value). In
    append output mode a window is final once the watermark passes its end;
    rows later than ``watermark`` behind the max seen event time are
    dropped — the streaming-correctness trade the reference never had to
    make (its batch merges are watermark-free by design).
    """
    groups = group_cols or ["event_type"]
    return (
        stream.withWatermark(time_col, watermark)
        .groupBy(F.window(F.col(time_col), window).alias("w"), *groups)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *groups,
            "n",
            "total_value",
        )
    )
