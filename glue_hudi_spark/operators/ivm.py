"""Incremental view maintenance for additive aggregates.

A rollup over a 100-TB table must not be recomputed because 0.1% of rows
changed — the change feed (``NativeTable.change_feed``, Delta-CDF shape)
carries exactly the delta, and additive aggregates (COUNT, SUM, and
anything built from them: AVG, ratios) absorb it algebraically:

    new_state = old_state  ⊕  Σ(+postimage, +insert)  ⊖  Σ(+preimage, +delete)

Maintenance cost is O(|changes| + |groups touched|): one signed
aggregate over the feed (map-side combined — the feed never shuffles
wider than group key + measures) and one outer-join merge against the
state, which at scale is itself a keyed table the join prunes. SUMs use
exact DECIMAL so maintained state is BIT-IDENTICAL to a from-scratch
recompute — the invariant the oracle gate checks; float sums would
drift (different summation order) and make maintained views
unauditable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_POS = ("insert", "update_postimage")
_NEG = ("delete", "update_preimage")


def aggregate_state(
    df: DataFrame, group_cols: list[str], sum_col: str,
    sum_type: str = "decimal(28,6)",
) -> DataFrame:
    """From-scratch state: (group..., cnt, total). The shape
    ``apply_change_feed`` maintains — and the recompute it must equal."""
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col(sum_col).cast(sum_type)).alias("total"),
    )


def change_feed_delta(
    feed: DataFrame, group_cols: list[str], sum_col: str,
    sum_type: str = "decimal(28,6)",
) -> DataFrame:
    """Signed per-group deltas ``(group..., _cnt_d, _sum_d)`` from a CDF
    batch — one map-side-combined aggregate, rows only for groups the
    window actually touched."""
    sign = F.when(F.col("_change_type").isin(*_POS), F.lit(1)).otherwise(
        F.lit(-1)
    )
    return feed.groupBy(*group_cols).agg(
        F.sum(sign).alias("_cnt_d"),
        F.sum(sign.cast(sum_type) * F.col(sum_col).cast(sum_type))
        .cast(sum_type).alias("_sum_d"),
    )


def merge_delta(
    state: DataFrame, delta: DataFrame, group_cols: list[str],
    sum_type: str = "decimal(28,6)",
) -> DataFrame:
    """Apply per-group deltas to (a slice of) the state. Emits every
    group either side holds — including groups whose count reached ≤ 0,
    which the CALLER must drop (full-state maintenance) or turn into
    delete ops (keyed-state maintenance)."""
    return state.join(delta, on=group_cols, how="full_outer").select(
        *group_cols,
        (F.coalesce(F.col("cnt"), F.lit(0))
         + F.coalesce(F.col("_cnt_d"), F.lit(0))).alias("cnt"),
        (F.coalesce(F.col("total"), F.lit(0).cast(sum_type))
         + F.coalesce(F.col("_sum_d"), F.lit(0).cast(sum_type)))
        .cast(sum_type).alias("total"),
    )


def apply_change_feed(
    state: DataFrame, feed: DataFrame, group_cols: list[str], sum_col: str,
    sum_type: str = "decimal(28,6)",
) -> DataFrame:
    """Merge a CDF batch into an aggregate state. Groups whose count
    reaches zero are dropped (they no longer exist in the base table);
    groups born in the feed appear. Exact-decimal arithmetic end-to-end."""
    delta = change_feed_delta(feed, group_cols, sum_col, sum_type)
    return merge_delta(state, delta, group_cols, sum_type).filter(
        F.col("cnt") > 0)
