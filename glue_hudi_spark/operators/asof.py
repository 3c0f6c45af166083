"""As-of (point-in-time) join — the time-series operator Spark lacks.

``asof_join(left, right)`` attaches to every left row the most recent
right row with the same key and ``right.time <= left.time`` (backward
as-of; the kdb/pandas ``merge_asof`` / DuckDB ``ASOF JOIN`` semantics).

Implementation is the scalable union+window trick, NOT a range join:

1. tag both sides and union them on (key, time);
2. one window per key ordered by (time, side-tag) computes ``last_value``
   with ``IGNORE NULLS`` over the right-side payload columns — each left
   row sees the latest right row at-or-before it;
3. filter back to left rows.

Cost: ONE shuffle on the key (the window), no cross product, no
per-row Python — at 100 TB this is the same plan shape as a window
dedup. A range-join formulation (`l JOIN r ON key AND r.t <= l.t` +
row_number) explodes quadratically per key; this stays linear.

Ties (right.time == left.time): the right row sorts before the left row
(side tag 0 < 1), so an exactly-simultaneous right row IS visible to the
left row — matching DuckDB ASOF (``>=``) and pandas ``merge_asof``
defaults. Two RIGHT rows sharing the same (key, time) resolve
deterministically: the greatest payload tuple wins (final orderBy
tiebreak) — without it, ``last(ignorenulls)`` would pick whichever row
shuffled last.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "_asof_side"  # 0 = right (visible), 1 = left (observer)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_time: str,
    right_time: str,
    right_payload: list[str] | None = None,
    tolerance: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join in any of pandas ``merge_asof``'s three directions.

    Returns all ``left`` columns plus ``right_payload`` columns (default:
    every right column except key/time) filled from the matched right row
    per key, or NULL when none exists.

    ``direction``:
    * ``'backward'`` (default) — most recent right row at-or-before;
    * ``'forward'`` — earliest right row at-or-after (the same single
      window, scanned in reverse time order — identical plan shape);
    * ``'nearest'`` — whichever of the two is closer in time; equal
      distances resolve to the BACKWARD match (deterministic, documented —
      pandas leaves this unspecified). Costs two window sorts over ONE
      exchange (both windows partition on the same keys, so Spark reuses
      the shuffle).

    ``tolerance``: optional max time distance as an INTERVAL string (e.g.
    ``'30 minutes'``) — farther matches are nulled out (applies in all
    directions).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction: {direction!r}")
    payload = right_payload or [
        c for c in right.columns if c not in {*key_cols, right_time}
    ]
    overlap = [c for c in payload if c in left.columns]
    if overlap:
        raise ValueError(f"right payload columns collide with left: {overlap}")

    l_tag = left.select(
        *key_cols,
        F.col(left_time).alias("_asof_t"),
        F.lit(1).alias(_SIDE),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in payload],
        F.struct(*left.columns).alias("_asof_row"),
    )
    r_tag = right.select(
        F.col(right_time).alias("_asof_t"),
        F.lit(0).alias(_SIDE),
        *key_cols,
        *payload,
        F.lit(None)
        .cast(l_tag.schema["_asof_row"].dataType)
        .alias("_asof_row"),
    )
    unioned = l_tag.unionByName(r_tag)

    def _window(dir_: str) -> Window:
        # deterministic winner among equal-timestamp right rows: greatest
        # payload tuple (left rows carry null payloads and are already
        # separated by the side tag, so this only orders rights). Both
        # directions order payload ASC so ``last`` lands on the greatest.
        t_order = (
            F.col("_asof_t").asc() if dir_ == "backward" else F.col("_asof_t").desc()
        )
        return (
            Window.partitionBy(*key_cols)
            .orderBy(
                t_order,
                F.col(_SIDE).asc(),
                F.struct(*[F.col(c) for c in payload]).asc(),
            )
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

    def _filled_cols(w: Window, suffix: str = "") -> list:
        return [
            *[
                F.last(c, ignorenulls=True).over(w).alias(c + suffix)
                for c in payload
            ],
            F.last(F.when(F.col(_SIDE) == 0, F.col("_asof_t")), ignorenulls=True)
            .over(w)
            .alias("_asof_matched_t" + suffix),
        ]

    if direction in ("backward", "forward"):
        filled = unioned.select(
            _SIDE, "_asof_row", "_asof_t", *key_cols, *_filled_cols(_window(direction))
        )
    else:
        filled = unioned.select(
            _SIDE,
            "_asof_row",
            "_asof_t",
            *key_cols,
            *_filled_cols(_window("backward"), "_b"),
            *_filled_cols(_window("forward"), "_f"),
        )
        bt, ft = F.col("_asof_matched_t_b"), F.col("_asof_matched_t_f")
        t = F.col("_asof_t")
        # backward wins when forward is absent or strictly farther
        # (timestamp/numeric → double keeps the comparison type-agnostic)
        use_b = bt.isNotNull() & (
            ft.isNull()
            | (
                (t.cast("double") - bt.cast("double"))
                <= (ft.cast("double") - t.cast("double"))
            )
        )
        filled = filled.select(
            _SIDE,
            "_asof_row",
            "_asof_t",
            *key_cols,
            *[
                F.when(use_b, F.col(c + "_b")).otherwise(F.col(c + "_f")).alias(c)
                for c in payload
            ],
            F.when(use_b, bt).otherwise(ft).alias("_asof_matched_t"),
        )
    out = filled.filter(F.col(_SIDE) == 1)
    if tolerance is not None:
        iv = F.expr(f"INTERVAL {tolerance}")
        mt, t = F.col("_asof_matched_t"), F.col("_asof_t")
        if direction == "backward":
            stale = mt < (t - iv)
        elif direction == "forward":
            stale = mt > (t + iv)
        else:
            stale = (mt < (t - iv)) | (mt > (t + iv))
        out = out.select(
            _SIDE,
            "_asof_row",
            "_asof_t",
            "_asof_matched_t",
            *key_cols,
            *[
                F.when(stale, F.lit(None)).otherwise(F.col(c)).alias(c)
                for c in payload
            ],
        )
    return out.select(
        *[F.col("_asof_row")[c].alias(c) for c in left.columns], *payload
    )
