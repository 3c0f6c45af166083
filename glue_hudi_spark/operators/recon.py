"""Table reconciliation: order-independent per-group checksums.

The anti-entropy primitive behind replica sync, migration cut-over, and
backup validation: two tables that should agree are each reduced to
(group, row_count, checksum) — a metadata-sized comparison — and only
MISMATCHED groups need row-level diffing (``NativeTable.diff_snapshots``
or a keyed join), so a 100-TB comparison moves terabytes only where the
tables actually differ.

Checksum construction (engine-portable, the same discipline as
``functions.sketches``):

* per row: the first 32-bit word of md5 over the checksummed columns'
  canonical string forms (``concat_ws`` with a \\x1f separator; NULL →
  \\x00 sentinel so (NULL, "x") ≠ ("", "x"));
* per group: the exact integer SUM of those words — order-independent
  (addition commutes) AND duplicate-sensitive (unlike XOR, where a
  duplicated row cancels itself out and a pair of identical corruptions
  is invisible). Sums stay far inside BIGINT (2³² per row ⇒ ~4×10⁹ rows
  per group before overflow — and a wraparound would still compare
  consistently on both sides of an equal comparison).

Caveat the docstring owes its user: the row canonicalization hashes
STRING CASTS, so checksummed columns must have engine-stable string
forms (ints, strings, decimals; doubles are stable in the non-exponent
range; high-precision timestamps can format differently across engines
— prefer casting those to epoch integers first).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _row_word(cols: list[str]):
    payload = F.concat_ws("\x1f", *[
        F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in cols
    ])
    return F.conv(F.substring(F.md5(payload), 1, 8), 16, 10).cast("bigint")


def table_checksum(
    df: DataFrame, group_cols: list[str], cols: list[str]
) -> DataFrame:
    """(group…, n, ck): row count + order-independent checksum of
    ``cols`` per group. One aggregate pass, map-side partials."""
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_row_word(cols)).alias("ck"),
    )


def reconcile(
    a: DataFrame, b: DataFrame, group_cols: list[str], cols: list[str]
) -> DataFrame:
    """Per-group comparison of two tables: (group…, n_a, n_b, ck_match).
    Groups missing from one side surface with n = 0 there. Only groups
    with ``NOT ck_match`` (or count mismatch) need row-level diffing."""
    ca = table_checksum(a, group_cols, cols).withColumnsRenamed(
        {"n": "n_a", "ck": "_ck_a"})
    cb = table_checksum(b, group_cols, cols).withColumnsRenamed(
        {"n": "n_b", "ck": "_ck_b"})
    return (
        ca.join(cb, on=group_cols, how="full_outer")
        .select(
            *group_cols,
            F.coalesce("n_a", F.lit(0)).alias("n_a"),
            F.coalesce("n_b", F.lit(0)).alias("n_b"),
            (F.coalesce("_ck_a", F.lit(-1)) == F.coalesce("_ck_b", F.lit(-2)))
            .alias("ck_match"),
        )
    )
