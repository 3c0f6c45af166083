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
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        F.broadcast(q).crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", cosine(F.col("q_vec"), F.col("c_vec")))
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


def _nearest_cell_expr(cents: list[tuple], vec):
    """Column expr: nearest-centroid cell id for ``vec`` against an inlined
    centroid literal. Lexicographic ``array_min`` over (-sim, cell) = max
    similarity, ties to the lowest cell id — zero shuffle, zero row
    amplification."""
    cent_arr = F.array(
        *[
            F.struct(
                F.lit(cell).alias("cell"),
                F.array(*[F.lit(float(x)) for x in cv]).alias("cv"),
            )
            for cell, cv in cents
        ]
    )
    best = F.array_min(
        F.transform(
            cent_arr,
            lambda c: F.struct(
                (-cosine(vec, c["cv"])).alias("_ns"),
                c["cell"].alias("cell"),
            ),
        )
    )
    return best["cell"]


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


def ivf_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its nearest centroid (max cosine, ties to the
    lowest centroid id) → (id, vec, cell).

    The centroid set is metadata-sized by construction, so it is collected
    once and inlined as an array-of-structs LITERAL; assignment is then a
    per-row ``array_min`` argmax inside the scan projection — ZERO shuffle,
    zero row amplification. (The previous corpus×centroids crossJoin +
    per-id window re-shuffled the whole corpus 8×-amplified.)
    """
    cents = _collect_centroids(centroids, id_col, vec_col)
    return vectors.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    ).withColumn("cell", _nearest_cell_expr(cents, F.col("v")))


def kmeans_centroids(
    vectors: DataFrame,
    n_centroids: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
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
        assigned = df.withColumn("cell", _nearest_cell_expr(cents, F.col("v")))
        rows = assigned.groupBy("cell").agg(*mean_exprs).collect()
        got = {r["cell"]: [float(r[f"c{i}"]) for i in range(dim)] for r in rows}
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
) -> DataFrame:
    """IVF-style ANN: inverted lists keyed by nearest centroid.

    ``train_iters=0``: centroids are the ``n_centroids`` lowest-id corpus
    vectors (train-free). ``train_iters>0``: centroids are refined with
    that many deterministic Lloyd's iterations (``kmeans_centroids``) —
    same plan shape, better-balanced cells. Queries probe only their own
    cell (nprobe=1), so the candidate join is an equi-join on ``cell``:
    candidate count shrinks ~n_centroids× versus brute force. Recall
    follows the usual IVF curve.
    """
    if train_iters > 0:
        cents = kmeans_centroids(corpus, n_centroids, train_iters, id_col, vec_col)
        c_assigned = corpus.select(
            F.col(id_col).alias("id"), F.col(vec_col).alias("v")
        ).withColumn("cell", _nearest_cell_expr(cents, F.col("v")))
        q_assigned = queries.select(
            F.col(id_col).alias("id"), F.col(vec_col).alias("v")
        ).withColumn("cell", _nearest_cell_expr(cents, F.col("v")))
    else:
        centroids = corpus.filter(F.col(id_col) < n_centroids)
        c_assigned = ivf_assign(corpus, centroids, id_col, vec_col)
        q_assigned = ivf_assign(queries, centroids, id_col, vec_col)
    q = q_assigned.select(
        F.col("id").alias("query_id"), F.col("v").alias("q_vec"), "cell"
    )
    cjoin = c_assigned.select(
        F.col("id").alias("neighbor_id"), F.col("v").alias("c_vec"), "cell"
    )
    scored = (
        q.join(cjoin, on="cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", cosine(F.col("q_vec"), F.col("c_vec")))
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
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        signbit_bucket(vec_col, m).alias("bucket"),
    )
    scored = (
        q.join(c, on="bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", cosine(F.col("q_vec"), F.col("c_vec")))
    )
    return _topk_per_query(scored, k)
