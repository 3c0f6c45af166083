"""Similarity search over an embedding column (``array<float>``).

Two paths, same output contract (query_id, neighbor_id, rank[, sim]):

* ``cosine_topk``       — exact brute force: query set × corpus with
  JVM-side ``zip_with``/``aggregate`` dot products. Correctness baseline;
  cost O(|Q|·|C|·d). Fine when |Q| is small or the corpus is a broadcast.
* ``lsh_bucketed_topk`` — the scale path: sign-bit bucketing (a
  deterministic random-hyperplane LSH degenerate: the coordinate axes of
  the first ``m`` dimensions are the hyperplanes). Queries only score
  candidates in their own bucket → the cross product shrinks ~2^m× at some
  recall cost. Bucket id is SQL-expressible, so the DuckDB oracle can
  replicate the exact same candidate sets.

Scale notes: the corpus side is never collected; the query side should be
small (broadcast) — Spark's AQE will broadcast it automatically under the
configured threshold. For 100 TB corpora the bucketed path additionally
prunes with a bucket equi-join before any distance math. Final top-k never
funnels through a per-query window: every path finishes with the two-stage
partial-top-k aggregation (``_topk_per_query``), so reducer parallelism is
|Q|×|partitions|, not |Q|. IVF assignment is a per-row argmax against an
inlined centroid literal — zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda s, x: s + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda s, x: s + x,
        )
    )


def cosine(a, b):
    """Cosine similarity between two array columns, rounded to 6 dp so the
    value is stable across summation implementations/engines."""
    return F.round(_dot(a, b) / (_norm(a) * _norm(b)), 6)


def _topk_per_query(scored: DataFrame, k: int) -> DataFrame:
    """Top-k of ``scored`` (query_id, neighbor_id, sim) per query — WITHOUT
    a window partitioned only by query_id.

    A plain ``Window.partitionBy("query_id")`` funnels the entire scored
    candidate set into |Q| reducers — with 5 queries over a 100 TB corpus
    that's a straggler by construction. Instead:

    1. partial top-k per (query, input partition): groupBy spreads over
       |Q|×|P| reducers and each emits ≤k candidates;
    2. final top-k merges the ≤|Q|×|P|×k survivors — a tiny second shuffle.

    Ordering matches the window formulation exactly: sim DESC, neighbor_id
    ASC (the struct's first field is -sim so one ascending sort_array gives
    both). Rank is dense 1..k by that order.
    """
    cand = F.struct(
        (-F.col("sim")).alias("_ns"),
        F.col("neighbor_id").alias("nid"),
        F.col("sim").alias("sim"),
    )
    partial = scored.groupBy(
        "query_id", F.spark_partition_id().alias("_pid")
    ).agg(F.slice(F.sort_array(F.collect_list(cand)), 1, k).alias("_cand"))
    final = partial.groupBy("query_id").agg(
        F.slice(F.sort_array(F.flatten(F.collect_list("_cand"))), 1, k).alias("_cand")
    )
    exploded = final.select(
        "query_id", F.posexplode("_cand").alias("_pos", "_c")
    )
    return exploded.select(
        "query_id",
        F.col("_c.nid").alias("neighbor_id"),
        (F.col("_pos") + 1).cast("int").alias("rank"),
        F.col("_c.sim").alias("sim"),
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Excludes self-matches (same id). Ties break on neighbor id ascending so
    results are fully deterministic.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    ).withColumn("_nq", _norm(F.col("q_vec")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    ).withColumn("_nc", _norm(F.col("c_vec")))
    # norms live BELOW the join (the join barrier keeps the projection
    # there), so each pair pays one dot product, not two extra d-folds;
    # nq*nc keeps the exact multiplication order of cosine()
    scored = (
        F.broadcast(q).crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "sim",
            F.round(
                _dot(F.col("q_vec"), F.col("c_vec"))
                / (F.col("_nq") * F.col("_nc")),
                6,
            ),
        )
    )
    return _topk_per_query(scored, k)


def auto_signbit_m(n_rows: int, target_bucket_rows: int = 10_000) -> int:
    """Bucket-count heuristic: enough sign bits that the EXPECTED bucket
    holds ~``target_bucket_rows`` vectors, so the within-bucket quadratic
    term stays bounded as the corpus grows (a FIXED m=4 → 16 buckets is
    O(n²/16) — quadratic again at 100 TB). Clamped to [1, 24]."""
    import math

    if n_rows <= target_bucket_rows:
        return 1
    return max(1, min(24, math.ceil(math.log2(n_rows / target_bucket_rows))))


def signbit_bucket(vec_col="embedding", m: int = 4, offset: int = 0):
    """Deterministic LSH bucket id: m sign bits of coordinates
    [offset, offset+m).  bucket = Σ_i (vec[offset+i] >= 0) << i — identical
    arithmetic in any engine. Size ``m`` with ``auto_signbit_m`` so bucket
    population stays bounded as the corpus scales; use several ``offset``
    values for the multi-band OR-construction (a true pair is missed only
    if EVERY band splits it)."""
    acc = F.lit(0)
    for i in range(m):
        acc = acc + F.when(
            F.col(vec_col)[offset + i].cast("double") >= 0, F.lit(2 ** i)
        ).otherwise(F.lit(0))
    return acc


def _py_norm(cv) -> float:
    """Driver-side centroid norm with the SAME left-fold summation order as
    ``_norm`` (init 0.0, += x² in array order), so the inlined literal is
    bit-identical to what the JVM fold would produce — the 6-dp rounding in
    ``cosine`` sits right at the oracle hash boundary."""
    import math

    acc = 0.0
    for x in cv:
        acc = acc + float(x) * float(x)
    return math.sqrt(acc)


def _f_sql(x) -> str:
    """A double as an EXACT Spark SQL literal: ``repr`` is Python's
    shortest-roundtrip decimal and the SQL parser's Double.parseDouble
    restores the identical bits (pinned incl. exponent forms/denormals
    by tests); the ``D`` suffix keeps Spark from typing plain decimals
    as DECIMAL."""
    return f"{float(x)!r}D"


def _arr_sql(xs) -> str:
    return "array(" + ", ".join(_f_sql(x) for x in xs) + ")"


def _dot_sql(a: str, b: str) -> str:
    """SQL text of ``_dot`` — the same zip_with/aggregate fold, parsed
    JVM-side. The assignment builders below render their whole
    expression as ONE ``F.expr`` string because constructing the
    centroid trees node-by-node through py4j dominated small-corpus
    latency: a measured 2.1 s of pure driver-side expression BUILD for
    one pq_encode projection (8 subspaces × 8 centroids), 0.38 s as
    text — execution plans and results are identical."""
    return (f"aggregate(zip_with({a}, {b}, (x, y) -> "
            f"CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0.0D, "
            f"(s, x) -> s + x)")


def _norm_sql(a: str) -> str:
    return (f"sqrt(aggregate(transform({a}, x -> "
            f"CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 0.0D, "
            f"(s, x) -> s + x))")


def _vec_sql(vec) -> str:
    """SQL text of the vector operand: pass through strings; render a
    Column through its node's own SQL form (``Column.toString`` — e.g.
    ``slice(CAST(embedding AS ARRAY<DOUBLE>), 1, 8)``). Callers pass
    simple shapes only — a bare column or slice(cast(col)) — which
    re-parse to the identical tree."""
    if isinstance(vec, str):
        return vec
    return vec._jc.toString()


def _scored_cells_sql(cents: list[tuple], vec_sql: str) -> str:
    """SQL text of the array of struct(-sim, cell) for ``vec`` against an
    inlined centroid literal — the shared core of argmax assignment (min
    element) and multi-probe (first p of the sorted array).

    The row norm is evaluated ONCE per row: it enters the per-centroid
    lambda as a ``zip_with`` operand (``array_repeat(nv, k)`` — the
    argument sits OUTSIDE the lambda, so Catalyst evaluates the d-element
    fold a single time and the lambda reads a bound variable). Centroid
    norms are driver-side literals. The round-2 version called
    ``cosine(vec, cv)`` inside the lambda — no CSE across lambda args
    meant k norm-folds per row, the one bench regression of the round."""
    cent_arr = "array(" + ", ".join(
        f"named_struct('cell', {int(cell)}L, 'cv', {_arr_sql(cv)}, "
        f"'cn', {_f_sql(_py_norm(cv))})"
        for cell, cv in cents
    ) + ")"
    return (
        f"zip_with({cent_arr}, "
        f"array_repeat({_norm_sql(vec_sql)}, {len(cents)}), "
        f"(c, nv) -> named_struct("
        f"'_ns', -round({_dot_sql(vec_sql, 'c.cv')} / (nv * c.cn), 6), "
        f"'cell', c.cell))"
    )


def _nearest_cell_expr(cents: list[tuple], vec):
    """Column expr: nearest-centroid cell id for ``vec`` against an inlined
    centroid literal. Lexicographic ``array_min`` over (-sim, cell) = max
    similarity, ties to the lowest cell id — zero shuffle, zero row
    amplification. Built as one SQL string (see ``_dot_sql``)."""
    return F.expr(
        f"array_min({_scored_cells_sql(cents, _vec_sql(vec))}).cell")


def _l2sq(a, b):
    """Rounded squared-L2 distance via three dot folds:
    ||a-b||² = a·a - 2 a·b + b·b — the identity keeps the arithmetic a
    composition of the same ``_dot`` fold the cosine path uses, so a SQL
    oracle (list_dot_product) reproduces the value bit-for-bit under the
    shared round(…, 6)."""
    return F.round(
        _dot(a, a) - F.lit(2.0) * _dot(a, b) + _dot(b, b), 6
    )


def _py_sumsq(cv) -> float:
    """Driver-side Σx² with the SAME left-fold order as ``_dot(b, b)`` so
    the inlined literal is bit-identical to the JVM fold."""
    acc = 0.0
    for x in cv:
        acc = acc + float(x) * float(x)
    return acc


def _nearest_cell_expr_l2(cents: list[tuple], vec):
    """L2 counterpart of ``_nearest_cell_expr``: argmin of rounded squared
    distance, ties to the lowest cell id.

    Same compile-cost discipline as the cosine version: centroids enter as
    ONE array literal (constant data, not code), vec·vec is folded once
    per row via the ``zip_with`` operand trick, and centroid Σx² terms are
    driver-side literals — generated code is O(d) per row regardless of
    the centroid count (the unrolled per-centroid form made codegen
    compilation, not execution, the dominant cost). Arithmetic is the
    identical ((a·a - 2a·b) + b·b) round-6 composition the SQL oracle
    spells. Built as one SQL string (see ``_dot_sql``)."""
    vec_sql = _vec_sql(vec)
    cent_arr = "array(" + ", ".join(
        f"named_struct('cell', {int(cell)}L, 'cv', {_arr_sql(cv)}, "
        f"'cn2', {_f_sql(_py_sumsq(cv))})"
        for cell, cv in cents
    ) + ")"
    return F.expr(
        f"array_min(zip_with({cent_arr}, "
        f"array_repeat({_dot_sql(vec_sql, vec_sql)}, {len(cents)}), "
        f"(c, dvv) -> named_struct("
        f"'d', round(dvv - 2.0D * {_dot_sql(vec_sql, 'c.cv')} + c.cn2, 6), "
        f"'cell', c.cell))).cell"
    )


def _probe_cells_expr(cents: list[tuple], vec, nprobe: int):
    """Array of the ``nprobe`` nearest cell ids (sim desc, ties to lowest
    cell) — the multi-probe variant of ``_nearest_cell_expr``."""
    return F.expr(
        f"transform(slice(sort_array("
        f"{_scored_cells_sql(cents, _vec_sql(vec))}), 1, {int(nprobe)}), "
        f"s -> s.cell)")


def _collect_centroids(centroids: DataFrame, id_col: str, vec_col: str) -> list[tuple]:
    cents = sorted(
        (
            (r["cell"], [float(x) for x in r["cv"]])
            for r in centroids.select(
                F.col(id_col).alias("cell"), F.col(vec_col).alias("cv")
            ).collect()
        ),
        key=lambda t: t[0],
    )
    if not cents:
        raise ValueError("empty centroid set")
    return cents


# above this many centroids the inlined literal stops being the right
# plan: O(k·d) expression nodes per operator are codegen-hostile, and the
# broadcast-join path amortizes the centroid table across the stage.
INLINE_CENTROID_MAX = 64


def _assign_by_join(vectors: DataFrame, cents: list[tuple]) -> DataFrame:
    """Large-k assignment: broadcast the centroid table, score every
    (row, centroid) pair, argmin map-side.

    Plan shape: broadcast nested-loop join amplifies each row k× INSIDE its
    partition; the immediately following groupBy(id) partial-aggregates the
    k copies back to one row map-side (min over struct(-sim, cell), with
    first(v) carrying the vector), so only one small row per input row ever
    reaches the exchange. Same arithmetic as the literal path — norms
    computed once per row below the join, centroid norms precomputed."""
    spark = vectors.sparkSession
    cdf = spark.createDataFrame(
        [(int(cell), [float(x) for x in cv], _py_norm(cv)) for cell, cv in cents],
        "cell bigint, cv array<double>, cn double",
    )
    scored = (
        vectors.withColumn("_nv", _norm(F.col("v")))
        .crossJoin(F.broadcast(cdf))
        .withColumn(
            "_ns",
            -F.round(
                _dot(F.col("v"), F.col("cv")) / (F.col("_nv") * F.col("cn")), 6
            ),
        )
    )
    best = scored.groupBy("id").agg(
        F.min(F.struct(F.col("_ns"), F.col("cell"))).alias("_b"),
        F.first("v").alias("v"),
    )
    return best.select("id", "v", F.col("_b.cell").alias("cell"))


def ivf_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its nearest centroid (max cosine, ties to the
    lowest centroid id) → (id, vec, cell).

    The centroid set is metadata-sized by construction, so it is collected
    once. Up to ``INLINE_CENTROID_MAX`` centroids it is inlined as an
    array-of-structs LITERAL and assignment is a per-row ``array_min``
    argmax inside the scan projection — ZERO shuffle, zero row
    amplification. (The previous corpus×centroids crossJoin + per-id
    window re-shuffled the whole corpus 8×-amplified.) Beyond that the
    broadcast-join path (``_assign_by_join``) takes over — same result,
    plan sized for hundreds of centroids.
    """
    cents = _collect_centroids(centroids, id_col, vec_col)
    keyed = vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    if len(cents) > INLINE_CENTROID_MAX:
        return _assign_by_join(keyed, cents)
    return keyed.withColumn("cell", _nearest_cell_expr(cents, F.col("v")))


def kmeans_centroids(
    vectors: DataFrame,
    n_centroids: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "cosine",
) -> list[tuple]:
    """Deterministic Lloyd's k-means over an embedding column, returning
    driver-side centroids [(cell, [components…]), …] — the training step in
    front of IVF (the plan-shape slot the untrained variant documents).

    Scale shape per iteration: assignment is the zero-shuffle inlined-
    literal argmax; the update is ONE narrow groupBy(cell) with d parallel
    aggregates (map-side partial sums). Nothing but the d-wide per-cell
    sums ever reaches a reducer. Determinism (so a SQL oracle can replay
    training exactly):

    * init = the ``n_centroids`` lowest-id vectors; cell keeps that seed id;
    * component means use exact DECIMAL(28,12) sums cast to double then
      ROUND(…, 9) — summation-order independent;
    * empty cells retain their previous centroid;
    * cosine ties assign to the lowest cell id.
    """
    df = vectors.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    seed = df.orderBy("id").limit(n_centroids).collect()
    cents = [(r["id"], [float(x) for x in r["v"]]) for r in seed]
    if not cents:
        raise ValueError("kmeans_centroids: empty input")
    dim = len(cents[0][1])
    mean_exprs = [
        F.round(
            F.sum(F.col("v")[i].cast("decimal(28,12)")).cast("double")
            / F.count(F.lit(1)),
            9,
        ).alias(f"c{i}")
        for i in range(dim)
    ]
    for _ in range(iters):
        nearest = (
            _nearest_cell_expr if metric == "cosine" else _nearest_cell_expr_l2
        )
        assigned = df.withColumn("cell", nearest(cents, F.col("v")))
        rows = assigned.groupBy("cell").agg(*mean_exprs).collect()
        got = {}
        for r in rows:
            comps = [r[f"c{i}"] for i in range(dim)]
            if any(c is None for c in comps):
                # non-ANSI DECIMAL(28,12) sum overflow yields NULL — fail
                # loudly instead of poisoning centroids mid-training
                raise ValueError(
                    f"kmeans_centroids: NULL mean component for cell "
                    f"{r['cell']} (decimal sum overflow — embedding "
                    f"magnitudes too large for DECIMAL(28,12))"
                )
            got[r["cell"]] = [float(c) for c in comps]
        cents = [(cell, got.get(cell, prev)) for cell, prev in cents]
    return cents


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 8,
    train_iters: int = 0,
    nprobe: int = 1,
) -> DataFrame:
    """IVF-style ANN: inverted lists keyed by nearest centroid.

    ``train_iters=0``: centroids are the ``n_centroids`` lowest-id corpus
    vectors (train-free). ``train_iters>0``: centroids are refined with
    that many deterministic Lloyd's iterations (``kmeans_centroids``) —
    same plan shape, better-balanced cells.

    ``nprobe``: each query probes its ``nprobe`` nearest cells (the
    standard IVF recall knob — nprobe=1 misses true neighbors that sit
    just across a cell boundary). Probing explodes the QUERY side only
    (nprobe× a small set); the corpus stays one-cell-per-row, the
    candidate join stays an equi-join on ``cell``, and a candidate can't
    repeat (corpus cells are disjoint). nprobe = n_centroids degenerates
    to exact brute force.
    """
    if train_iters > 0:
        cents = kmeans_centroids(corpus, n_centroids, train_iters, id_col, vec_col)
    else:
        cents = _collect_centroids(
            corpus.filter(F.col(id_col) < n_centroids), id_col, vec_col
        )
    keyed_c = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    keyed_q = queries.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    if len(cents) > INLINE_CENTROID_MAX:
        c_assigned = _assign_by_join(keyed_c, cents)
    else:
        c_assigned = keyed_c.withColumn("cell", _nearest_cell_expr(cents, F.col("v")))
    if nprobe <= 1:
        if len(cents) > INLINE_CENTROID_MAX:
            q_assigned = _assign_by_join(keyed_q, cents)
        else:
            q_assigned = keyed_q.withColumn(
                "cell", _nearest_cell_expr(cents, F.col("v"))
            )
    else:
        q_assigned = keyed_q.select(
            "id", "v",
            F.explode(_probe_cells_expr(cents, F.col("v"), nprobe)).alias("cell"),
        )
    q = q_assigned.select(
        F.col("id").alias("query_id"), F.col("v").alias("q_vec"), "cell"
    ).withColumn("_nq", _norm(F.col("q_vec")))
    cjoin = c_assigned.select(
        F.col("id").alias("neighbor_id"), F.col("v").alias("c_vec"), "cell"
    ).withColumn("_nc", _norm(F.col("c_vec")))
    scored = (
        q.join(cjoin, on="cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "sim",
            F.round(
                _dot(F.col("q_vec"), F.col("c_vec"))
                / (F.col("_nq") * F.col("_nc")),
                6,
            ),
        )
    )
    return _topk_per_query(scored, k)


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's sign-bit
    bucket (IVF-style inverted list with 2^m deterministic centroids), then
    exact cosine within the bucket. Equi-join on bucket → shuffle-friendly,
    no cross product."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        signbit_bucket(vec_col, m).alias("bucket"),
    ).withColumn("_nq", _norm(F.col("q_vec")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        signbit_bucket(vec_col, m).alias("bucket"),
    ).withColumn("_nc", _norm(F.col("c_vec")))
    scored = (
        q.join(c, on="bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "sim",
            F.round(
                _dot(F.col("q_vec"), F.col("c_vec"))
                / (F.col("_nq") * F.col("_nc")),
                6,
            ),
        )
    )
    return _topk_per_query(scored, k)


# ------------------------------------------------- product quantization


def pq_train(
    corpus: DataFrame,
    m: int = 8,
    n_codes: int = 8,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[tuple]]:
    """Train per-subspace PQ codebooks: split d-dim vectors into ``m``
    contiguous subvectors and run deterministic L2 k-means independently
    in each subspace. Returns ``m`` codebooks of ``n_codes`` centroids.

    ALL subspaces train together, not as m sequential jobs: the seeds
    are the n_codes lowest-id rows' subvectors (one collect serves every
    subspace — they slice the same rows), and each Lloyd's iteration is
    ONE job over a posexploded (subspace, subvector) frame — assignment
    is a per-subspace inlined argmin selected by subspace id, the update
    is a single groupBy(subspace, cell) with subdim-wide exact-DECIMAL
    means. Job count is 1 + iters regardless of m (the sequential
    per-subspace form paid ~2m tiny jobs of pure scheduling overhead).
    Per-subspace semantics are identical to kmeans_centroids(metric='l2')
    on the sliced projection — the SQL oracle replays subspaces
    independently and hashes the same."""
    seed_rows = (
        corpus.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        .orderBy("id")
        .limit(n_codes)
        .collect()
    )
    if not seed_rows:
        raise ValueError("pq_train: empty input")
    dim = len(seed_rows[0]["v"])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    sd = dim // m
    books = [
        [
            (r["id"], [float(x) for x in r["v"][s * sd : (s + 1) * sd]])
            for r in seed_rows
        ]
        for s in range(m)
    ]
    v = F.col(vec_col).cast("array<double>")
    exploded = corpus.select(
        F.col(id_col),
        F.posexplode(
            F.array(*[F.slice(v, s * sd + 1, sd) for s in range(m)])
        ).alias("s", "subv"),
    )
    mean_exprs = [
        F.round(
            F.sum(F.col("subv")[i].cast("decimal(28,12)")).cast("double")
            / F.count(F.lit(1)),
            9,
        ).alias(f"c{i}")
        for i in range(sd)
    ]
    for _ in range(iters):
        cell = F.lit(None).cast("long")
        for s in reversed(range(m)):
            cell = F.when(
                F.col("s") == s, _nearest_cell_expr_l2(books[s], F.col("subv"))
            ).otherwise(cell)
        rows = (
            exploded.withColumn("cell", cell)
            .groupBy("s", "cell")
            .agg(*mean_exprs)
            .collect()
        )
        got: dict = {}
        for r in rows:
            comps = [r[f"c{i}"] for i in range(sd)]
            if any(c is None for c in comps):
                raise ValueError(
                    f"pq_train: NULL mean component for subspace {r['s']} "
                    f"cell {r['cell']} (DECIMAL(28,12) sum overflow)"
                )
            got[(r["s"], r["cell"])] = [float(c) for c in comps]
        books = [
            [(cell_id, got.get((s, cell_id), prev)) for cell_id, prev in books[s]]
            for s in range(m)
        ]
    return books


def pq_encode(
    corpus: DataFrame,
    books: list[list[tuple]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode each vector as ``m`` small codes (nearest codebook centroid
    per subspace, argmin rounded L2, ties to the lowest code). Pure
    projection — zero shuffle; the encoded table carries m ints per row
    instead of d doubles (the PQ memory win: 8 codes vs 64 components
    here; 16-32× at production dims)."""
    sd = len(books[0][0][1])
    v = F.col(vec_col).cast("array<double>")
    return corpus.select(
        F.col(id_col),
        *[
            _nearest_cell_expr_l2(
                books[s], F.slice(v, s * sd + 1, sd)
            ).alias(f"code{s}")
            for s in range(len(books))
        ],
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = 8,
    n_codes: int = 8,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ approximate nearest neighbors (asymmetric distance): rank corpus
    vectors by Σ_s ||q_s - centroid(code_s)||² — the query stays exact,
    the corpus is represented by its codes.

    Scale shape: training is m× the IVF training cost on (d/m)-wide
    projections; encoding is a zero-shuffle projection; search reads the
    CODES table only (m ints per corpus row — the full embedding column
    is never rescanned), broadcasts the tiny query side, and finishes
    with the shared two-stage partial top-k (no per-query window).
    Returns (query_id, neighbor_id, rank, dist) — dist ascending, ties to
    the lowest neighbor id."""
    books = pq_train(corpus, m, n_codes, iters, id_col, vec_col)
    enc = pq_encode(corpus, books, id_col, vec_col)
    sd = len(books[0][0][1])
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("q_vec")
    )

    # per-subspace distance: element_at over the inlined codebook literal,
    # selected by the corpus row's code — m lookups + m small L2 folds per
    # (query, row) pair, never a d-wide fold over corpus data. The whole
    # m-term sum is ONE SQL string (see _dot_sql): the same ((a·a - 2a·b)
    # + b·b) round-6 terms, left-associated adds.
    def sub_dist_sql(s: int) -> str:
        book_arr = "array(" + ", ".join(
            _arr_sql(cv) for _, cv in books[s]) + ")"
        cent = f"element_at({book_arr}, CAST(code{s} AS INT) + 1)"
        qs = f"slice(q_vec, {s * sd + 1}, {sd})"
        return (f"round({_dot_sql(qs, qs)} - 2.0D * {_dot_sql(qs, cent)}"
                f" + {_dot_sql(cent, cent)}, 6)")

    scored = (
        F.broadcast(q).crossJoin(enc.withColumnRenamed(id_col, "neighbor_id"))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "dist", F.expr(" + ".join(sub_dist_sql(s) for s in range(m))))
    )
    ranked = _topk_per_query(scored.withColumn("sim", -F.col("dist")), k)
    return ranked.select(
        "query_id", "neighbor_id", "rank", (-F.col("sim")).alias("dist")
    )


def centroid_outliers(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 20,
) -> DataFrame:
    """Top-k embedding outliers: the vectors farthest (L2) from the corpus
    centroid — the standard cheap screen for mis-embedded / off-manifold
    rows before clustering or ANN indexing.

    Engine-exact centroid: float sums are order-dependent, so each
    component is quantized to 1e-6 integers (round-half-away-from-zero —
    identical in Spark and DuckDB) and summed as BIGINT — exact and
    order-independent — then divided once. The distance pass compares
    each row against the centroid INLINED as a constant double array
    (zip_with over a literal: code is O(d) per row, no shuffle), and the
    top-k runs as TakeOrderedAndProject (per-partition heaps + driver
    merge of k rows — never a global sort). Distances round to 6 dp so
    per-row summation order can't leak into the hash gate.

    Two jobs: one 64-group centroid aggregate (map-side partials, a
    metadata-sized collect), one scan + top-k. Returns
    (id_col, dist, rank) with rank 1 = farthest, ties to the lowest id.
    """
    from pyspark.sql import Window

    comp = df.select(
        F.col(id_col), F.posexplode(F.col(vec_col)).alias("pos", "x")
    )
    q = F.round(F.col("x").cast("double") * F.lit(1_000_000.0), 0).cast("bigint")
    cent_rows = comp.groupBy("pos").agg(
        F.sum(q).alias("s"), F.count(F.lit(1)).alias("n")
    ).collect()
    if not cent_rows:
        return df.select(
            F.col(id_col),
            F.lit(0.0).alias("dist"),
            F.lit(0).cast("bigint").alias("rank"),
        ).limit(0)
    cent = [0.0] * (max(r["pos"] for r in cent_rows) + 1)
    for r in cent_rows:
        cent[r["pos"]] = r["s"] / (r["n"] * 1_000_000.0)
    carr = F.array(*[F.lit(c) for c in cent])
    d2 = F.aggregate(
        F.zip_with(
            F.col(vec_col),
            carr,
            lambda x, c: (x.cast("double") - c) * (x.cast("double") - c),
        ),
        F.lit(0.0),
        lambda s, x: s + x,
    )
    top = (
        df.select(F.col(id_col), F.round(F.sqrt(d2), 6).alias("dist"))
        .orderBy(F.col("dist").desc(), F.col(id_col).asc())
        .limit(int(k))
    )
    w = Window.orderBy(F.col("dist").desc(), F.col(id_col).asc())
    return top.withColumn("rank", F.row_number().over(w).cast("bigint"))
