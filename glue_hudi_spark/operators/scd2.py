"""Type-2 slowly-changing-dimension history (SCD2).

The warehouse pattern the reference's latest-wins merge deliberately
discards: instead of overwriting a key's row, every change CLOSES the
current version (valid_to = change time) and OPENS a new one — so any
query can reconstruct the dimension exactly as of any instant with a
``valid_from <= t < valid_to`` predicate, no time travel machinery
needed.

Two construction paths, equivalent by construction (pinned in tests):

* ``scd2_build`` — full rebuild from an event history: one window per
  key ordered by time. The CONSECUTIVE-DUPLICATE COLLAPSE matters: a
  change event that repeats the current value must not open a new
  version (else the history bloats with zero-information rows); it's a
  lag() comparison inside the same window — no extra shuffle.
* ``scd2_apply`` — incremental: merge a micro-batch of changes into an
  existing SCD2 table. Only current rows of CHANGED keys rewrite
  (closed history is immutable — at scale that's the whole point: the
  history table grows append-only and the rewrite set is bounded by the
  batch's key count, like the CoW merge path).

Scale shape: both are one shuffle on the dimension key; ``scd2_apply``
additionally anti/semi-joins the batch's key set (broadcast-sized for
CDC batches) against current rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# Open-interval sentinel. Deliberately NOT 9999-12-31: pandas/pyarrow
# ns-resolution timestamps overflow past 2262-04-11, so a 9999 sentinel
# makes the table un-convertible via toPandas() (the driver's
# canonicalization path). 2200-01-01 is ns-representable everywhere and
# still sorts after any plausible event time.
HIGH_TS = "2200-01-01 00:00:00"


def scd2_build(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str,
    attr_cols: list[str],
) -> DataFrame:
    """Full SCD2 rebuild from (key, ts, attrs…) change events.

    Returns (key…, attrs…, valid_from, valid_to, is_current): half-open
    [valid_from, valid_to) intervals; the current row carries
    ``valid_to = HIGH_TS`` (2200-01-01, ns-safe) and is_current = true.
    Ties on ts within a
    key keep the LAST row by attr fingerprint order (deterministic);
    consecutive versions with identical attrs collapse into one."""
    fp = F.md5(F.concat_ws("\x1f", *[
        F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in attr_cols
    ]))
    w = Window.partitionBy(*key_cols).orderBy(F.col(ts_col).asc(), fp.asc())
    step1 = (
        events.select(*key_cols, ts_col, *attr_cols)
        .withColumn("_fp", fp)
        .withColumn("_prev_fp", F.lag("_fp").over(w))
        # consecutive-duplicate collapse: keep only rows that CHANGE the
        # attribute fingerprint (or open the history)
        .filter(F.col("_prev_fp").isNull() | (F.col("_fp") != F.col("_prev_fp")))
    )
    w2 = Window.partitionBy(*key_cols).orderBy(F.col(ts_col).asc(), F.col("_fp").asc())
    return (
        step1
        .withColumn("valid_from", F.col(ts_col))
        .withColumn(
            "valid_to",
            F.coalesce(
                F.lead(ts_col).over(w2),
                F.lit(HIGH_TS).cast("timestamp"),
            ),
        )
        .withColumn("is_current", F.col("valid_to") == F.lit(HIGH_TS).cast("timestamp"))
        .select(*key_cols, *attr_cols, "valid_from", "valid_to", "is_current")
    )


def scd2_apply(
    current_scd: DataFrame,
    batch: DataFrame,
    key_cols: list[str],
    ts_col: str,
    attr_cols: list[str],
) -> DataFrame:
    """Merge a batch of change events into an existing SCD2 table.

    Closed rows (is_current = false) pass through UNTOUCHED — the
    immutable history. Current rows of keys present in the batch are
    re-derived together with the batch's events (so multiple changes in
    one batch chain correctly); current rows of untouched keys pass
    through. Batch events older than a key's current valid_from are
    rejected (out-of-order arrival needs a rebuild — fail loudly rather
    than corrupt history).

    Sentinel migration: tables written before HIGH_TS moved from
    9999-12-31 to 2200-01-01 carry the old open-row sentinel; without
    normalization a merge would leave MIXED sentinels (untouched current
    rows keep 9999, re-derived keys get 2200), breaking any consumer
    that compares ``valid_to == HIGH_TS`` or orders open rows. Every
    pass-through row with ``valid_to`` past HIGH_TS is rewritten to
    HIGH_TS here, so one ``scd2_apply`` fully migrates a table."""
    scd_cols = [*key_cols, *attr_cols, "valid_from", "valid_to", "is_current"]
    high = F.lit(HIGH_TS).cast("timestamp")
    current_scd = current_scd.withColumn(
        "valid_to",
        F.when(F.col("valid_to") > high, high).otherwise(F.col("valid_to")))
    closed = current_scd.filter(~F.col("is_current"))
    current = current_scd.filter(F.col("is_current"))
    bkeys = batch.select(*key_cols).distinct()
    untouched = current.join(F.broadcast(bkeys), on=key_cols, how="left_anti")
    touched = current.join(F.broadcast(bkeys), on=key_cols, how="left_semi")

    stale = batch.join(
        touched.select(*key_cols, F.col("valid_from").alias("_cur_from")),
        on=key_cols, how="inner",
    ).filter(F.col(ts_col) < F.col("_cur_from"))
    if not stale.isEmpty():
        raise ValueError(
            "scd2_apply: batch contains events older than a key's current "
            "version (out-of-order arrival) — rebuild with scd2_build"
        )

    # re-derive the touched keys' open tail: their current row (as an
    # event at its own valid_from) + the batch's events
    seed = touched.select(
        *key_cols, F.col("valid_from").alias(ts_col), *attr_cols)
    rederived = scd2_build(
        seed.unionByName(batch.select(*key_cols, ts_col, *attr_cols)),
        key_cols, ts_col, attr_cols,
    )
    return (
        closed.select(*scd_cols)
        .unionByName(untouched.select(*scd_cols))
        .unionByName(rederived.select(*scd_cols))
    )


def as_of(scd: DataFrame, ts) -> DataFrame:
    """Dimension snapshot as of an instant: one predicate, no time-travel
    metadata — the SCD2 payoff."""
    t = F.lit(ts).cast("timestamp")
    return scd.filter(
        (F.col("valid_from") <= t) & (t < F.col("valid_to"))
    ).drop("valid_from", "valid_to", "is_current")
