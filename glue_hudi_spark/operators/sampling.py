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


def stratum_fixed_sample(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    n: int,
    oversample: float = 4.0,
) -> DataFrame:
    """Exactly ``n`` rows per stratum (fewer if the stratum is smaller),
    chosen as the n SMALLEST ``hash_fraction(key)`` values — the
    deterministic equivalent of per-stratum reservoir sampling: uniform
    over the stratum, stable under re-runs/retries, oracle-replayable.

    Scale shape (NOT a corpus-wide window): a corpus-sized
    ``row_number() OVER (PARTITION BY stratum)`` funnels each stratum
    through one reducer. Instead:

    1. one metadata-sized count per stratum;
    2. a map-side threshold filter ``frac < oversample·n/count`` leaves
       ~oversample·n candidate rows per stratum;
    3. a deficit check (second metadata count) — if some stratum's hash
       draw was adversarial enough to leave < n survivors (probability
       exponentially small in ``oversample``), its threshold is lifted
       to 1.0, keeping the result EXACTLY the top-n-by-hash regardless;
    4. the row_number window runs on the surviving sliver only.

    Output keeps ``df``'s columns plus ``sample_rank`` (1..n in hash
    order, ties by key).
    """
    if n <= 0:
        raise ValueError("n must be positive")
    frac = hash_fraction(key_col)
    counts = {
        r["s"]: r["c"]
        for r in df.groupBy(F.col(stratum_col).alias("s"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }

    def _thr_expr(thresholds: dict) -> Column:
        t = F.lit(0.0)
        for s, v in sorted(thresholds.items()):
            t = F.when(F.col(stratum_col) == F.lit(s), F.lit(v)).otherwise(t)
        return t

    thresholds = {
        s: min(1.0, (oversample * n) / c) if c > 0 else 1.0
        for s, c in counts.items()
    }
    surv = df.filter(frac < _thr_expr(thresholds))
    deficit = {
        r["s"]
        for r in surv.groupBy(F.col(stratum_col).alias("s"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
        if r["c"] < n and thresholds.get(r["s"], 1.0) < 1.0
    }
    if deficit:
        widened = {s: (1.0 if s in deficit else v) for s, v in thresholds.items()}
        surv = df.filter(frac < _thr_expr(widened))
    w = Window.partitionBy(stratum_col).orderBy(
        frac.asc(), F.col(key_col).asc()
    )
    return (
        surv.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= n)
    )


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


def pack_sequences(
    df: DataFrame,
    token_col: str,
    bin_capacity: int,
    key_col: str,
    num_shards: int = 32,
    order_by: list[Column] | None = None,
) -> DataFrame:
    """Assign each document to a training context window: concatenate the
    shard's documents in ``order_by`` order and slice the token stream
    into ``bin_capacity``-token bins (LM sequence packing — documents may
    straddle a boundary; each is tagged with the bin where it STARTS and
    its token offset within that bin).

    Adds (shard_id, bin_id, bin_offset) to ``df``'s columns:

    * ``shard_id`` — md5-hash shard in [0, num_shards): deterministic,
      uniform, engine-portable (a SQL oracle replays it bit-for-bit).
    * ``bin_id`` — floor(tokens-before-this-doc / capacity) within the
      shard.
    * ``bin_offset`` — tokens-before MOD capacity: where in the context
      window the doc starts.

    Scale: ONE shuffle (the per-shard window). Each shard is a single
    sorted task, so ``num_shards`` must scale with the cluster — at 32
    shards this is a local[32] fit; a 1000-executor run packs with
    num_shards in the tens of thousands (shard count is free: any value
    gives a valid packing, and the hash spreads documents evenly).
    """
    order = order_by or [F.col(key_col).asc()]
    shard = F.floor(hash_fraction(key_col) * F.lit(float(num_shards))).cast("int")
    w = (
        Window.partitionBy("_ghs_shard")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_before = F.sum(F.col(token_col)).over(w) - F.col(token_col)
    return (
        df.withColumn("_ghs_shard", shard)
        .withColumn("_ghs_before", cum_before)
        .select(
            *df.columns,
            F.col("_ghs_shard").alias("shard_id"),
            F.floor(F.col("_ghs_before") / F.lit(float(bin_capacity)))
            .cast("bigint")
            .alias("bin_id"),
            (F.col("_ghs_before") % F.lit(int(bin_capacity)))
            .cast("bigint")
            .alias("bin_offset"),
        )
    )


def temperature_mix(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-flattened stratum resampling (the multilingual
    'alpha sampling' of mBERT/XLM-R: target share ∝ n_s^alpha, so small
    languages are up-weighted relative to their corpus share).

    The keep rate has a closed form with no cross-stratum float sums:
    target share f_s ∝ n_s^α ⇒ the largest output meeting every share
    with rates ≤ 1 keeps ``(n_min / n_s)^(1-α)`` of stratum s — 1.0 for
    the smallest stratum, monotonically flattening as α → 0 (α=1 keeps
    everything, α=0 equalizes strata). For α=0.5 this is computed as
    ``sqrt(n_min)/sqrt(n_s)`` — correctly-rounded IEEE ops, so a SQL
    oracle reproduces the thresholds bit-for-bit (general α goes through
    ``pow``, which is only ~1-ulp reproducible across engines).

    One metadata-sized count aggregate; the resampling itself is the
    map-side hash filter of ``stratified_sample``.
    """
    import math

    counts = {
        r[stratum_col]: r["n"]
        for r in df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    if not counts:
        return df.filter(F.lit(False))
    n_min = min(counts.values())
    if alpha == 0.5:
        rates = {s: math.sqrt(n_min) / math.sqrt(n) for s, n in counts.items()}
    else:
        e = 1.0 - float(alpha)
        rates = {s: (n_min**e) / (n**e) for s, n in counts.items()}
    return stratified_sample(df, stratum_col, rates, key_col, default_rate=0.0)


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


def global_row_number(
    df: DataFrame, order_cols: list, rn_col: str = "_rn",
    partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """EXACT 1-based global row number by ``order_cols`` WITHOUT the
    single-reducer funnel of ``row_number().over(Window.orderBy(...))``
    — the window form pulls the whole table through ONE task, the
    classic global-sort straggler.

    Distributed shape: range-repartition on the order columns (range
    boundaries make partition i's rows all precede partition i+1's),
    rank WITHIN each partition (a partition-local window), then add
    per-partition offsets — a metadata-sized count collect, one row per
    partition. The ranged projection is localCheckpoint-ed first: the
    range sampler is nondeterministic, and the counts and the ranks
    must see the SAME boundaries.

    ``order_cols`` are Column expressions (use ``F.col(c).desc()`` for
    descending). Returns (df + rn_col, total_rows).
    """
    spark = df.sparkSession
    n = partitions or spark.sparkContext.defaultParallelism
    cols = [c if isinstance(c, Column) else F.col(c) for c in order_cols]
    ranged = (df.repartitionByRange(n, *cols)
              .withColumn("_gpid", F.spark_partition_id())
              .localCheckpoint(eager=True))
    counts = {r["_gpid"]: r["c"] for r in
              ranged.groupBy("_gpid").agg(
                  F.count(F.lit(1)).alias("c")).collect()}
    offsets, acc = [], 0
    for p in sorted(counts):
        offsets.append((p, acc))
        acc += counts[p]
    off = spark.createDataFrame(offsets or [(0, 0)],
                                "_gpid int, _goff long")
    w = Window.partitionBy("_gpid").orderBy(*cols)
    out = (
        ranged.withColumn("_lrn", F.row_number().over(w))
        .join(F.broadcast(off), on="_gpid")
        .withColumn(rn_col, (F.col("_goff") + F.col("_lrn")).cast("bigint"))
        .drop("_gpid", "_lrn", "_goff")
    )
    return out, acc


def ntile_of(rn, total: int, n: int):
    """The bucket SQL ``ntile(n)`` assigns to global rank ``rn`` of
    ``total`` rows — larger buckets first, sizes differ by ≤1. Lets a
    distributed ``global_row_number`` reproduce window-ntile output
    exactly without the window."""
    q, r = divmod(total, n)
    if q == 0:
        return rn.cast("int")
    head = r * (q + 1)
    return (
        F.when(rn <= head, ((rn - 1) / (q + 1)).cast("int") + 1)
        .otherwise(F.lit(r) + ((rn - head - 1) / q).cast("int") + 1)
    )
