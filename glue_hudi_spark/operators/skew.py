"""Skew-handling plan transforms: salting for hot keys.

AQE's skew-join splitting handles most cases automatically
(``spark.sql.adaptive.skewJoin.enabled``, on in ``session.get_spark``), but
two shapes still benefit from explicit salting at 100 TB:

* **Aggregation on a low-cardinality / hot-keyed column** — one reducer per
  hot key becomes the straggler. ``salted_agg`` splits each key into
  ``salt_buckets`` partial groups (map-side-friendly), aggregates partials,
  then re-aggregates the partials per real key: two small shuffles instead
  of one skewed one. Results are identical to the plain groupBy (all
  supported aggregates are decomposable).
* **Join with a hot build key** — ``salted_join`` explodes the small side
  ``salt_buckets``× (one copy per salt) and salts the big side
  deterministically, so a hot key's rows spread over N reducers.

Both transforms are *plan* rewrites: result sets are bit-identical to the
unsalted equivalents (verified by the oracle gate), and the salt column is
derived from deterministic hashing — same results every run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# decomposable aggregates: (partial_fn, final_fn) over the partial column
_DECOMPOSABLE = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``aggs``: output_name → (agg_fn, input_col) with agg_fn in
    sum|count|min|max (the decomposable set). Example::

        salted_agg(events, ["event_type"],
                   {"n": ("count", "event_id"), "total": ("sum", "value")})

    is result-identical to ``events.groupBy("event_type").agg(...)`` but
    never concentrates one key on one reducer.
    """
    for name, (fn, _) in aggs.items():
        if fn not in _DECOMPOSABLE:
            raise ValueError(f"{name}: '{fn}' is not decomposable; use "
                             f"{sorted(_DECOMPOSABLE)}")
    # deterministic spread: hash of the whole row modulo buckets
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))
    )
    partial = salted.groupBy(*keys, "_salt").agg(
        *[
            _DECOMPOSABLE[fn][0](col).alias(f"_p_{name}")
            for name, (fn, col) in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            _DECOMPOSABLE[fn][1](f"_p_{name}").alias(name)
            for name, (fn, col) in aggs.items()
        ]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    keys: list[str],
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: ``small`` is exploded ``salt_buckets``× (one row
    per salt value), ``big`` rows take a deterministic salt — the join key
    becomes (keys…, salt), spreading each hot key over N reducers.

    Result-identical to ``big.join(small, keys, how)`` for ``how`` in
    {inner, left, left_outer, left_semi, left_anti} — the only sides the
    salting construction preserves. Right/full-outer (and right_semi/anti)
    would emit each unmatched small-side row ``salt_buckets`` times, so
    they are rejected; swap the operands instead.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} would duplicate unmatched small-side "
            f"rows {salt_buckets}x; use one of {sorted(allowed)} or swap sides"
        )
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    small_x = small.withColumn("_salt", salts)
    big_s = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_buckets))
    )
    return big_s.join(small_x, on=[*keys, "_salt"], how=how).drop("_salt")
