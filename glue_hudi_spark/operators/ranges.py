"""Interval (range) join — points matched to the time intervals containing
them, without a nested-loop plan.

Naively, ``points JOIN intervals ON ts BETWEEN start AND end`` has no
equi-key, so Spark plans a BroadcastNestedLoopJoin (or a cartesian
product): O(|P|·|I|) comparisons — unusable at corpus scale. The
scale-correct shape (Flink's interval join, Spark's own range-join hints
on Databricks) buckets time:

* a point lands in ONE bucket: ``floor(epoch / w)``;
* an interval is exploded to EVERY bucket it overlaps (``sequence``);
* the join is an equi-join on (key, bucket) — hash-partitionable,
  AQE-skew-handled — followed by the exact ``BETWEEN`` filter.

Each (point, interval) match is produced exactly once (the point's single
bucket), so no dedup pass is needed.

Pick ``bucket_seconds`` near the typical interval length: the explode
factor is ~(interval_len / w + 1) rows per interval, while candidate
pairs per bucket grow with w. Both extremes degrade gracefully — it's a
throughput knob, never a correctness one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Column
from pyspark.sql import functions as F


def _epoch_seconds(df: DataFrame, name: str) -> Column:
    """Epoch-seconds extraction that tolerates every timestamp flavor.

    Spark 4 forbids TIMESTAMP_NTZ → BIGINT casts outright, so ``ts.cast
    ('long')`` breaks the moment a parquet file stores tz-less
    ``timestamp[us]`` (which Spark infers as NTZ). Route NTZ through an
    allowed path — NTZ → session-zone TIMESTAMP → long — and leave
    integer columns (already epoch seconds) untouched.
    """
    c = F.col(name)
    dt = df.schema[name].dataType.typeName()
    if dt in ("long", "integer", "short"):
        return c.cast("long")
    if dt == "timestamp_ntz":
        c = c.cast("timestamp")
    elif dt == "date":
        c = c.cast("timestamp")
    return c.cast("long")


def _bucket(epoch: Column, w: int) -> Column:
    # integer DIV with floor semantics for negatives via floor(double) is
    # unnecessary here because epoch seconds for any modern data are
    # positive
    return (epoch / F.lit(int(w))).cast("long")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str | list[str] | None,
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Inner-join each point row to every interval row containing it.

    ``on``: optional equality key(s) shared by both sides (e.g. user_id)
    — include them whenever they exist; they multiply the join's
    selectivity for free. Column names must be disjoint apart from ``on``
    (alias before calling, as with any join).
    """
    keys = [on] if isinstance(on, str) else list(on or [])
    w = int(bucket_seconds)
    if w <= 0:
        raise ValueError("bucket_seconds must be positive")

    p = points.withColumn(
        "_ghs_bucket", _bucket(_epoch_seconds(points, point_ts), w)
    )
    iv = (
        intervals.filter(F.col(start_col) <= F.col(end_col))
        .withColumn(
            "_ghs_bucket",
            F.explode(
                F.sequence(
                    _bucket(_epoch_seconds(intervals, start_col), w),
                    _bucket(_epoch_seconds(intervals, end_col), w),
                )
            ),
        )
    )
    joined = p.join(iv, on=keys + ["_ghs_bucket"], how="inner").filter(
        (F.col(point_ts) >= F.col(start_col))
        & (F.col(point_ts) <= F.col(end_col))
    )
    return joined.drop("_ghs_bucket")
