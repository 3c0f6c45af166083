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
prunes with a bucket equi-join before any distance math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
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
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def signbit_bucket(vec_col="embedding", m: int = 4):
    """Deterministic LSH bucket id: m sign bits of the first m coordinates.
    bucket = Σ_i (vec[i] >= 0) << i  — identical arithmetic in any engine."""
    acc = F.lit(0)
    for i in range(m):
        acc = acc + F.when(
            F.col(vec_col)[i].cast("double") >= 0, F.lit(2 ** i)
        ).otherwise(F.lit(0))
    return acc


def ivf_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its nearest centroid (max cosine, ties to the
    lowest centroid id) → (id, vec, cell). The centroid set is broadcast
    (it is tiny by construction); assignment is one narrow pass over the
    corpus — the IVF 'train-free' building block."""
    c = centroids.select(
        F.col(id_col).alias("cell"), F.col(vec_col).alias("cent_vec")
    )
    scored = (
        vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .crossJoin(F.broadcast(c))
        .withColumn("csim", cosine(F.col("v"), F.col("cent_vec")))
    )
    w = Window.partitionBy("id").orderBy(F.col("csim").desc(), F.col("cell").asc())
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("id", "v", "cell")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 8,
) -> DataFrame:
    """IVF-style ANN: inverted lists keyed by nearest centroid.

    Centroids are the first ``n_centroids`` corpus vectors (deterministic,
    train-free — a k-means step would slot in here without changing the
    plan shape). Queries probe only their own cell (nprobe=1), so the
    candidate join is an equi-join on ``cell``: candidate count shrinks
    ~n_centroids× versus brute force. Recall follows the usual IVF curve.
    """
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
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


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
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )
