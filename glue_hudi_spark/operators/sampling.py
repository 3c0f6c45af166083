"""Deterministic sampling for training-data pipelines.

A 100 TB corpus is never trained on whole: it's stratified (per language /
source rates), budgeted (take the best documents until a token budget is
hit), and mixed (combine corpora at target proportions). All three need to
be *deterministic* — re-running the pipeline must pick the same rows, with
no RNG state on any executor — and *map-sided* where possible.

Design:

* ``hash_fraction`` maps each row's key to a uniform [0, 1) double via
  md5 (engine-portable, so the DuckDB oracle can replay it bit-for-bit —
  never Spark's native ``hash()``). Sampling a row is then a pure filter:
  no shuffle, no RNG, stable under retries/speculative execution.
* ``stratified_sample`` is a single map-side filter — at any scale its
  cost is one scan.
* ``token_budget_sample`` needs a per-stratum running total, i.e. one
  shuffle on the stratum key + a window sort within each stratum. That is
  the minimal data movement for a prefix-sum semantics; strata are
  processed independently so the plan parallelizes across them.
* ``mix_corpora`` computes per-source keep rates from the (metadata-sized)
  per-source counts, then delegates to the same map-side filter.

The reference engine has no sampling surface; these extend it for LLM
data curation (assignment brief) alongside operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 2^32 — hash_fraction takes the top 8 hex chars (32 bits) of the md5
_HASH_SPACE = float(1 << 32)


def hash_fraction(key) -> Column:
    """Uniform-ish [0, 1) double derived deterministically from ``key``.

    ``conv(substr(md5(k), 1, 8), 16, 10) / 2^32`` — the same expression a
    SQL oracle can spell (DuckDB: ``concat('0x', substr(md5(k), 1, 8))::
    BIGINT / 4294967296.0``). md5 of the *string* form, so int and string
    keys agree across engines.
    """
    k = key if isinstance(key, Column) else F.col(key)
    return (
        F.conv(F.substring(F.md5(k.cast("string")), 1, 8), 16, 10)
        .cast("bigint") / F.lit(_HASH_SPACE)
    )


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    rates: dict[str, float],
    key_col: str,
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row with its stratum's probability, deterministically.

    Map-side only: rate lookup is a literal CASE over the (small) rates
    dict and the keep decision is ``hash_fraction(key) < rate``. Rows in
    strata absent from ``rates`` keep with ``default_rate`` (0 = drop).
    """
    rate = F.lit(float(default_rate))
    for stratum, r in sorted(rates.items()):
        rate = F.when(
            F.col(stratum_col) == F.lit(stratum), F.lit(float(r))
        ).otherwise(rate)
    return df.filter(hash_fraction(key_col) < rate)


def token_budget_sample(
    df: DataFrame,
    token_col: str,
    budget: int,
    stratum_col: str | None = None,
    order_by: list[Column] | None = None,
) -> DataFrame:
    """Greedy prefix take: walk rows in priority order, keep while the
    running token total stays within ``budget`` (per stratum).

    ``order_by`` ranks desirability (e.g. quality desc, id asc for a
    deterministic tie-break) — the FIRST rows in that order are kept, so
    the budget buys the best documents, not a random subset.

    Scale: one shuffle on the stratum key, sort within each stratum —
    the minimum for running-total semantics. With ``stratum_col=None``
    the whole input is one sequential prefix scan (Spark executes the
    unpartitioned window on a single task); only use that for
    driver-bounded inputs — at corpus scale always budget per stratum.
    """
    order = order_by or [F.col(token_col).desc()]
    part = [stratum_col] if stratum_col else []
    w = (
        Window.partitionBy(*part)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("_running_tokens", F.sum(F.col(token_col)).over(w))
        .filter(F.col("_running_tokens") <= F.lit(int(budget)))
        .drop("_running_tokens")
    )


def mix_corpora(
    df: DataFrame,
    source_col: str,
    weights: dict[str, float],
    key_col: str,
) -> DataFrame:
    """Down-sample sources so the output mixes at ``weights`` proportions.

    The largest output satisfying every proportion with keep-rates ≤ 1 is
    ``T = min_s(n_s / w_s)`` rows; each source keeps ``w_s * T / n_s`` of
    its rows. Per-source counts are ONE aggregation (metadata-sized
    collect — one row per source); the sampling itself is the map-side
    hash filter. Sources missing from ``weights`` are dropped.
    """
    total_w = sum(weights.values())
    norm = {s: w / total_w for s, w in weights.items()}
    counts = {
        r[source_col]: r["n"]
        for r in df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n")).collect()
        if r[source_col] in norm
    }
    missing = set(norm) - set(counts)
    if missing:
        raise ValueError(f"sources absent from input: {sorted(missing)}")
    t = min(counts[s] / norm[s] for s in norm)
    rates = {s: min(1.0, norm[s] * t / counts[s]) for s in norm}
    return stratified_sample(df, source_col, rates, key_col)
