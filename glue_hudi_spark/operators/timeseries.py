"""Time-series resampling with gap fill — TimescaleDB's
``time_bucket_gapfill`` + ``locf`` family, expressed as DataFrame ops.

The reference engine has no time-series surface (SURVEY §2.5); this is a
large-pipeline extension in the hypertable-rollup family: regularize an
event stream onto a fixed grid (one row per key per bucket, observed or
not) so downstream windows/joins see dense, aligned series.

Shape (all built-in, JVM-side — no UDF):

* bucket observed rows with ``date_trunc(unit, ts)`` and aggregate;
* per key, take ``[min(bucket), max(bucket)]`` and explode
  ``sequence(lo, hi, interval 1 <unit>)`` into the dense grid;
* left-join observations back on ``(keys..., bucket)`` — an equi-join,
  hash-partitionable, AQE-skew-handled;
* carry the last observation forward with
  ``last(col, ignorenulls=True)`` over a per-key ordered window.

Scale: grid size is keys x span-buckets — each key's explode factor is
bounded by ITS OWN span, so the stage is embarrassingly parallel and
never quadratic. The groupBy, the grid join, and the locf window all
shuffle on the same key columns, so AQE coalesces them into one
partitioning. The failure mode at 100 TB is a poisoned timestamp (one
row in 1970 or 9999 stretches that key's grid to millions of buckets);
``max_buckets`` caps the per-key span and the ``_gf_clamped`` flag makes
the clamp auditable instead of silent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_UNITS = ("minute", "hour", "day", "week", "month", "year")


def resample_gapfill(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    values: "dict[str, Column]",
    unit: str = "day",
    locf: bool = True,
    max_buckets: int | None = None,
    interpolate: bool = False,
) -> DataFrame:
    """Dense per-key time grid with aggregated observations and gaps.

    ``values``: output name -> aggregate expression over the rows of one
    (key, bucket) group, e.g. ``{"day_value": F.sum("value")}``.

    Returns one row per (keys..., bucket) in each key's observed span:
    the aggregated columns (NULL on gap buckets), ``is_gap`` (no row
    observed in the bucket), and — with ``locf`` — a ``<name>_locf``
    column per value carrying the last non-null observation forward.

    ``max_buckets``: cap each key's grid at this many bucket rows
    measured from the key's FIRST observation; keys that exceed it are
    clamped (buckets past the cap dropped) and flagged via
    ``_gf_clamped`` so a quality gate can quarantine them — one corrupt
    timestamp must not explode a key's grid to millions of rows.

    ``interpolate`` (TimescaleDB's ``interpolate``): adds a
    ``<name>_interp`` DOUBLE per value — gap buckets take the linear
    blend of the nearest non-null observations on each side (positioned
    by bucket index, so unevenly-spanned gaps blend proportionally);
    buckets before the first / after the last observation stay NULL
    (no extrapolation); observed buckets pass their own value through.

    Rows with a NULL ``ts_col`` are dropped up front: they belong to no
    bucket, and letting them linger in the aggregation would silently
    lose their values at the grid join. Quarantine them BEFORE calling
    this (the same DQ posture as the clamp flag).
    """
    if unit not in _UNITS:
        raise ValueError(f"resample_gapfill: unit must be one of {_UNITS}")
    if not values:
        raise ValueError("resample_gapfill: need at least one value agg")
    if max_buckets is not None and max_buckets < 1:
        raise ValueError("resample_gapfill: max_buckets must be >= 1")
    df = df.filter(F.col(ts_col).isNotNull())
    bucket = F.date_trunc(unit, F.col(ts_col))
    obs = df.groupBy(*keys, bucket.alias("bucket")).agg(
        *[v.alias(k) for k, v in values.items()],
        F.lit(True).alias("_gf_obs"),
    )
    span = obs.groupBy(*keys).agg(
        F.min("bucket").alias("_lo"), F.max("bucket").alias("_hi"))
    if max_buckets is not None:
        # lo itself is the first bucket row, so the cap is lo + (N-1)
        # steps — a clamped key emits exactly max_buckets rows
        cap = F.col("_lo") + F.expr(
            f"interval {int(max_buckets) - 1} {unit}")
        span = span.select(
            *keys, "_lo",
            F.least(F.col("_hi"), cap).alias("_hi"),
            (F.col("_hi") > cap).alias("_gf_clamped"),
        )
    step = F.expr(f"interval 1 {unit}")
    grid = span.select(
        *keys,
        F.explode(F.sequence("_lo", "_hi", step)).alias("bucket"),
        *([F.col("_gf_clamped")] if max_buckets is not None else []),
    )
    out = grid.join(obs, [*keys, "bucket"], "left")
    cols: list[Column] = [
        *[F.col(k) for k in keys],
        F.col("bucket"),
        *[F.col(k) for k in values],
        F.col("_gf_obs").isNull().alias("is_gap"),
    ]
    if locf:
        w = (Window.partitionBy(*keys).orderBy("bucket")
             .rowsBetween(Window.unboundedPreceding, 0))
        cols += [F.last(k, ignorenulls=True).over(w).alias(f"{k}_locf")
                 for k in values]
    if interpolate:
        wb = (Window.partitionBy(*keys).orderBy("bucket")
              .rowsBetween(Window.unboundedPreceding, 0))
        wf = (Window.partitionBy(*keys).orderBy("bucket")
              .rowsBetween(0, Window.unboundedFollowing))
        rn = F.row_number().over(
            Window.partitionBy(*keys).orderBy("bucket"))
        for k in values:
            v = F.col(k).cast("double")
            anchor = F.when(v.isNotNull(), rn)
            pv = F.last(v, ignorenulls=True).over(wb)
            nv = F.first(v, ignorenulls=True).over(wf)
            pp = F.last(anchor, ignorenulls=True).over(wb)
            np_ = F.first(anchor, ignorenulls=True).over(wf)
            cols.append(
                F.when(v.isNotNull(), v)
                .when(
                    pv.isNotNull() & nv.isNotNull(),
                    pv + (nv - pv) * (rn - pp) / (np_ - pp))
                .alias(f"{k}_interp"))
    if max_buckets is not None:
        cols.append(F.col("_gf_clamped"))
    return out.select(*cols)


_PACK_COL = "__ghs_pack__"


def derive_pack_buckets(n_rows: int, target_rows: int = 1_000_000) -> int:
    """Default bucket count for the packed LTTB exchange: enough
    buckets that one pandas batch carries ~``target_rows`` rows (so a
    100x input can't silently build worker-OOM Arrow batches), floored
    at 1024 (the measured sweet spot for amortizing per-group Arrow
    overhead at probe scales)."""
    return max(1024, -(-int(n_rows) // int(target_rows)))


def lttb_downsample(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    n_out: int = 100,
    pack_buckets: int | None = None,
) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling, per key.

    The standard visualization downsampler (Steinarsson 2013; TimescaleDB
    ships it as ``lttb``): reduce each key's series to ``n_out`` points
    that preserve its visual shape — first and last points anchored, the
    interior split into ``n_out - 2`` buckets, and from each bucket the
    point forming the largest triangle with the previously selected
    point and the next bucket's centroid.

    The selection is inherently sequential WITHIN a key (each pick
    depends on the previous one), so this is the documented
    Pandas-UDF path (SURVEY §7.2: built-ins can't express it):
    ``applyInPandas`` — numpy vectorized per bucket inside. Scale
    contract: parallelism is across keys; ONE key's series must fit a
    worker (the same contract as any per-entity sequential model), and
    at 100 TB the per-key series for a dashboard-sized query is bounded
    by retention x sample rate, not by corpus size. Null values are
    dropped before selection (a NaN triangle area would poison every
    comparison).

    Many-tiny-keys regime (r11 verdict #3): grouping the Arrow exchange
    BY KEY pays a fixed per-group Arrow/pandas tax — 36 s at 6M rows /
    90k keys vs 7 s for the same rows under few keys. So the exchange
    groups by ``xxhash64(keys) % pack_buckets`` instead: one pandas
    batch carries ~keys/pack_buckets whole series, sorted ONCE by
    (keys, ts); key runs are then contiguous slices found with numpy
    (no per-key pandas objects at all), and only the inherently
    sequential bucket loop runs per key. Per-group overhead is
    amortized ~keys-per-bucket-fold. With few keys (fewer than
    buckets) only non-empty buckets materialize, so the packed plan
    degenerates to the per-key one; telemetry-shaped key counts
    (millions) keep per-bucket payloads bounded by rows/buckets, and a
    same-key series is never split across buckets.

    ``pack_buckets=None`` (default) auto-sizes via
    ``derive_pack_buckets``: one extra count of the projected input,
    then ``max(1024, rows / 1M)`` — a batch targets ~1M rows, so a
    100x caller can't silently build worker-OOM Arrow batches. Pass an
    explicit int to skip the count (e.g. when the size is known).
    """
    import numpy as np
    import pandas as pd

    if n_out < 3:
        raise ValueError("lttb_downsample: n_out must be >= 3")
    proj = df.select(*keys, ts_col, value_col)
    if _PACK_COL in proj.columns:
        raise ValueError(
            f"lttb_downsample: input column {_PACK_COL!r} collides with "
            "the packed exchange's helper column — rename it first")
    if pack_buckets is None:
        # auto-size from the input (one metadata-cheap count over the
        # projected columns): target ~1M rows per pandas batch so the
        # default survives a 100x scale-up without a caller-tuned knob
        pack_buckets = derive_pack_buckets(proj.count())
    if pack_buckets < 1:
        raise ValueError("lttb_downsample: pack_buckets must be >= 1")
    schema = proj.schema

    def _select(x, y):
        """Pure-numpy LTTB over one key's (time-sorted) series; returns
        the selected local indices, ascending."""
        n = len(x)
        # bucket edges over the interior points [1, n-1)
        edges = np.linspace(1, n - 1, n_out - 1).astype("int64")
        sel = [0]
        for i in range(n_out - 2):
            lo, hi = edges[i], edges[i + 1]
            if i + 2 < len(edges):
                nlo, nhi = edges[i + 1], edges[i + 2]
            else:
                nlo, nhi = n - 1, n
            ax, ay = x[sel[-1]], y[sel[-1]]
            cx, cy = x[nlo:nhi].mean(), y[nlo:nhi].mean()
            bx, by = x[lo:hi], y[lo:hi]
            area = np.abs((ax - cx) * (by - ay) - (ax - bx) * (cy - ay))
            sel.append(lo + int(area.argmax()))
        sel.append(n - 1)
        return np.asarray(sel, dtype="int64")

    def _packed(pdf):
        pdf = pdf.drop(columns=_PACK_COL) \
                 .dropna(subset=[ts_col, value_col])
        if not len(pdf):
            return pdf
        pdf = pdf.sort_values([*keys, ts_col], kind="mergesort") \
                 .reset_index(drop=True)
        if not keys:
            # keys=[]: one global series — the whole batch is one run
            starts = np.array([0])
            ends = np.array([len(pdf)])
        else:
            if len(keys) == 1:
                codes, _ = pd.factorize(pdf[keys[0]], use_na_sentinel=False)
            else:
                codes, _ = pd.factorize(
                    pd.MultiIndex.from_frame(pdf[keys]),
                    use_na_sentinel=False)
            change = np.flatnonzero(np.diff(codes)) + 1
            starts = np.concatenate(([0], change))
            ends = np.concatenate((change, [len(pdf)]))
        x_all = pdf[ts_col].to_numpy()
        if np.issubdtype(x_all.dtype, np.datetime64):
            x_all = x_all.astype("datetime64[ns]").astype("int64")
        x_all = x_all.astype("float64")
        y_all = pdf[value_col].to_numpy(dtype="float64")
        take = []
        for s, e in zip(starts, ends):
            if e - s <= n_out:
                take.append(np.arange(s, e))
            else:
                take.append(_select(x_all[s:e], y_all[s:e]) + s)
        return pdf.iloc[np.concatenate(take)]

    packed = proj.withColumn(
        _PACK_COL,
        F.pmod(F.xxhash64(*keys), F.lit(int(pack_buckets)))
        if keys else F.lit(0))  # keys=[]: one global series, one bucket
    return packed.groupBy(_PACK_COL).applyInPandas(_packed, schema)
