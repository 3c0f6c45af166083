"""Probabilistic sketches as portable DataFrame aggregations.

Sketches are the scale answer to "how many distinct / how frequent" when
the exact answer needs a full shuffle of the key space: a HyperLogLog
register array is m integers however many rows feed it, and a Count-Min
table is d×w counters — both combine map-side, ship O(m) bytes per
partition, and never materialize the key set. (The reference engine gets
the same capability from Hudi's metadata stats only for file pruning;
these are the query-side versions every warehouse — Redshift, BigQuery,
Spark's own approx_count_distinct — exposes.)

Spark ships approx_count_distinct (HLL++) natively, but its register
layout is engine-private — a DuckDB oracle cannot replay it. These
implementations trade a few lines of expression code for a sketch that is
*bit-for-bit reproducible in ANSI SQL*:

* hashes are md5-derived 32-bit words (`conv(substr(md5(k), ...))` —
  the same spelling `operators.sampling.hash_fraction` established);
* HLL rank uses `length(bin(w))` — integer bit-length, no log();
* register harmonics use `1 / (1 << rho)` — dyadic rationals whose
  512-term sums are EXACT in binary doubles (significand span 42 bits
  < 53), so summation order cannot matter;
* the HLL constant alpha_m and the final division are pure IEEE ops on
  literals — identical in any IEEE engine. The small-range linear-
  counting branch (m·ln(m/zeros), implemented in ``hll_estimate``)
  needs ln(); cross-engine libm last-ulp drift is fenced by rounding
  the final estimate to 6 dp (the repo's float-gate convention) and by
  branch conditions that compare IEEE-identical doubles, so both
  engines take the same arm and produce the same rounded value.

All expressions are JVM-side (no UDFs); both sketches are one narrow
aggregation over the fact table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

HLL_P = 9
HLL_M = 1 << HLL_P  # 512 registers


def _h32(key: Column, off: int = 1) -> Column:
    """32-bit unsigned word ``off`` (1-based hex offset) of md5(key)."""
    return F.conv(
        F.substring(F.md5(key.cast("string")), off, 8), 16, 10
    ).cast("bigint")


def hll_sketch(df: DataFrame, key: str) -> DataFrame:
    """(idx, rho) register array: idx = h32 % m, rho = leading-zero rank
    of an independent 32-bit word (33 for w = 0). One groupBy over m
    distinct register ids — partial-aggregated map-side, so the shuffle
    carries at most m rows per input partition regardless of row count."""
    k = F.col(key)
    w = _h32(k, 9)
    rho = F.when(w > 0, F.lit(33) - F.length(F.bin(w))).otherwise(F.lit(33))
    return (
        df.select((_h32(k) % HLL_M).alias("idx"), rho.alias("rho"))
        .groupBy("idx")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(regs: DataFrame) -> DataFrame:
    """HLL estimate from a register array: alpha_m·m²/Σ2^(-rho) (absent
    registers contributing 2^0), switching to linear counting
    (m·ln(m/zero_registers)) below 2.5m — the standard small-range
    correction, without which the raw estimator is badly biased exactly
    where small tables land. The branch condition compares IEEE-identical
    doubles, so both engines take the same arm; ln() inputs are exact
    integer ratios and the result is rounded to 6 dp (the repo's float
    gate convention — a potential last-ulp libm difference cannot reach
    the hash)."""
    alpha = 0.7213 / (1.0 + 1.079 / HLL_M)
    # SQL form: the Python shiftleft() binding takes a literal bit count,
    # the SQL function takes a column
    inv = F.expr("1.0 / cast(shiftleft(cast(1 as bigint), rho) as double)")
    agg = regs.agg(F.sum(inv).alias("_sum"), F.count(F.lit(1)).alias("_nz"))
    zeros = (F.lit(HLL_M) - F.col("_nz")).cast("double")
    raw = (
        F.lit(alpha) * F.lit(float(HLL_M)) * F.lit(float(HLL_M))
        / (F.col("_sum") + zeros)
    )
    linear = F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / zeros)
    est = F.when(
        (raw <= F.lit(2.5 * HLL_M)) & (zeros > 0), linear
    ).otherwise(raw)
    return agg.select(F.round(est, 6).alias("hll_estimate"))


CMS_D = 4    # hash rows
CMS_W = 256  # buckets per row


def cms_build(df: DataFrame, key: str) -> DataFrame:
    """Count-Min table as a (row, bucket, cnt) DataFrame: d independent
    md5-salted hashes, one groupBy producing ≤ d·w counters. Merges
    across partitions/batches by summing cnt — the linearity that makes
    CMS the streaming/distributed frequency sketch."""
    k = F.col(key).cast("string")
    # one posexplode over the d salted hashes, NOT a d-way union of
    # per-row projections — the union form scanned the input d times
    # (measured in the plan); identical (row, bucket) rows, one scan
    u = df.select(
        F.posexplode(F.array(*[
            (F.conv(F.substring(
                F.md5(F.concat(F.lit(f"{r}:"), k)), 1, 8), 16, 10)
             .cast("bigint") % CMS_W)
            for r in range(CMS_D)
        ])).alias("row", "bucket")
    )
    return u.groupBy("row", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def cms_probe(table: DataFrame, probes: DataFrame, key: str) -> DataFrame:
    """Point-frequency estimates: min over the d counters each probe key
    hashes to. Never underestimates; overestimate bounded by collisions
    (εN with ε = e/w at depth ln(1/δ)=d). The probe set joins the d·w
    counter table — broadcast-sized by construction."""
    k = F.col(key).cast("string")
    exploded = probes.select(
        F.col(key),
        F.explode(F.array(*[F.lit(r) for r in range(CMS_D)])).alias("row"),
    ).withColumn(
        "bucket",
        F.conv(
            F.substring(F.md5(F.concat(F.concat(F.col("row").cast("string"),
                                                F.lit(":")), k)), 1, 8),
            16, 10,
        ).cast("bigint") % CMS_W,
    )
    return (
        exploded.join(F.broadcast(table), ["row", "bucket"], "left")
        .fillna(0, subset=["cnt"])
        .groupBy(key)
        .agg(F.min("cnt").alias("est_count"))
    )
