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
* ``token_budget_sample`` needs per-stratum running totals — but NOT one
  sort task per stratum. It range-partitions on (stratum, priority),
  prefix-sums per-slab token masses driver-side (metadata), and windows
  only the slab where each stratum's budget boundary lands; all other
  rows are kept or dropped by a map-side flag.
* ``mix_corpora`` computes per-source keep rates from the (metadata-sized)
  per-source counts, then delegates to the same map-side filter.

The reference engine has no sampling surface; these extend it for LLM
data curation (assignment brief) alongside operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

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
    partitions: int | None = None,
) -> DataFrame:
    """Greedy prefix take: walk rows in priority order, keep while the
    running token total stays within ``budget`` (per stratum).

    ``order_by`` ranks desirability (e.g. quality desc, id asc for a
    deterministic tie-break) — the FIRST rows in that order are kept, so
    the budget buys the best documents, not a random subset. Token counts
    must be non-negative (they are counts).

    Scale (distributed prefix-sum, NOT one sort task per stratum — a
    100 TB corpus with five languages must not sort each language on a
    single reducer):

    1. Range-partition on (stratum, order) — each stratum spans a run of
       consecutive balanced partitions; rows are sorted within each.
    2. ONE metadata-sized aggregation collects each (partition, stratum)
       slab's token mass; the driver prefix-sums slab masses per stratum,
       giving every slab its running-total offset, and classifies it:
       ``keep`` (offset + mass fits the budget — every row survives,
       no sort needed), ``drop`` (offset already past the budget —
       nothing survives), or ``walk`` (the budget boundary lands inside).
    3. Only ``walk`` slabs — at most one per stratum — pay a window
       cumsum; the exact greedy filter is ``offset + within-slab
       running ≤ budget``. Everything else is a map-side flag filter.

    The partitioned frame is localCheckpoint-ed so the mass pass and the
    final pass see identical partition ids (and the range shuffle runs
    once). Semantics are EXACTLY the single-window formulation: running
    totals accumulate over all prior rows in order, kept or not (greedy
    prefix, not bin packing).
    """
    order = order_by or [F.col(token_col).desc()]
    spark = df.sparkSession
    if partitions is None:
        partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    strat = [F.col(stratum_col)] if stratum_col else []
    ranged = (
        df.repartitionByRange(int(partitions), *strat, *order)
        .sortWithinPartitions(*strat, *order)
        .withColumn("_ghs_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )

    grp = ["_ghs_pid"] + ([stratum_col] if stratum_col else [])
    slabs = ranged.groupBy(*grp).agg(
        F.coalesce(F.sum(token_col), F.lit(0)).alias("_ghs_mass")
    ).collect()
    slabs.sort(key=lambda r: r["_ghs_pid"])

    budget = int(budget)
    acc: dict = {}
    meta_rows = []
    for r in slabs:
        s = r[stratum_col] if stratum_col else None
        off = acc.get(s, 0)
        mass = r["_ghs_mass"]
        if off + mass <= budget:
            flag = "keep"
        elif off > budget:
            flag = "drop"
        else:  # boundary slab (off == budget still walks: 0-token rows fit)
            flag = "walk"
        meta_rows.append((r["_ghs_pid"], s, off, flag))
        acc[s] = off + mass

    meta_fields = [T.StructField("_ghs_mpid", T.IntegerType())]
    if stratum_col:
        meta_fields.append(
            T.StructField("_ghs_stratum", df.schema[stratum_col].dataType)
        )
    else:
        meta_rows = [(p, o, fl) for p, _, o, fl in meta_rows]
    meta_fields += [
        T.StructField("_ghs_offset", T.LongType()),
        T.StructField("_ghs_flag", T.StringType()),
    ]
    meta = spark.createDataFrame(meta_rows, T.StructType(meta_fields))

    cond = ranged["_ghs_pid"] == meta["_ghs_mpid"]
    if stratum_col:
        cond = cond & ranged[stratum_col].eqNullSafe(meta["_ghs_stratum"])
    j = ranged.join(F.broadcast(meta), on=cond, how="inner")

    kept = j.filter(F.col("_ghs_flag") == "keep")
    w = (
        Window.partitionBy("_ghs_pid", *([stratum_col] if stratum_col else []))
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    walked = (
        j.filter(F.col("_ghs_flag") == "walk")
        .withColumn(
            "_ghs_run", F.col("_ghs_offset") + F.sum(F.col(token_col)).over(w)
        )
        .filter(F.col("_ghs_run") <= F.lit(budget))
        .drop("_ghs_run")
    )
    return kept.unionByName(walked).select(*df.columns)


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
