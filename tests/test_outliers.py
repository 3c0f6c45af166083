"""Embedding outlier detection (similarity.centroid_outliers).

Engine parity is pinned by the ``embedding_outliers`` oracle gate; these
tests pin the geometry and the plan shape.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from glue_hudi_spark.operators import similarity


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def test_farthest_vector_ranks_first(spark):
    # centroid ~ origin; vec 99 sits far away on axis 0
    rows = [(i, [0.1 * ((-1) ** i), 0.0]) for i in range(10)]
    rows.append((99, [50.0, 0.0]))
    out = similarity.centroid_outliers(_emb(spark, rows), k=3).collect()
    assert out[0]["vec_id"] == 99 and out[0]["rank"] == 1
    assert len(out) == 3
    assert [r["rank"] for r in out] == [1, 2, 3]


def test_ties_break_by_id(spark):
    # four corners, all equidistant from the exact centroid (0.5, 0.5)
    rows = [(1, [0.0, 0.0]), (2, [1.0, 1.0]), (3, [0.0, 1.0]), (4, [1.0, 0.0])]
    out = similarity.centroid_outliers(_emb(spark, rows), k=4).collect()
    assert [r["vec_id"] for r in out] == [1, 2, 3, 4]
    assert len({r["dist"] for r in out}) == 1


def test_k_bounds_output(spark):
    rows = [(i, [float(i), 0.0]) for i in range(50)]
    out = similarity.centroid_outliers(_emb(spark, rows), k=7)
    assert out.count() == 7


def test_no_global_sort_in_plan(spark):
    """Top-k must be TakeOrderedAndProject, not a full Sort + Limit."""
    rows = [(i, [float(i % 5), 1.0]) for i in range(100)]
    plan = similarity.centroid_outliers(_emb(spark, rows), k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
