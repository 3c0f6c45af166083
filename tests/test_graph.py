"""operators/graph.py fixed-point PageRank: structural properties the
oracle gate can't see (partitioning invariance, known-graph values)."""

from __future__ import annotations

from pyspark.sql import Row

from glue_hudi_spark.operators import graph as G


def _pr(spark, edges, **kw):
    df = spark.createDataFrame([Row(src=s, dst=d, w=w) for s, d, w in edges])
    return {r["id"]: r["rank_fp"] for r in G.pagerank(df, **kw).collect()}


def test_symmetric_cycle_is_uniform(spark):
    # a→b→c→a with equal weights: every node keeps exactly 1/3
    r = _pr(spark, [("a", "b", 1), ("b", "c", 1), ("c", "a", 1)])
    assert len(set(r.values())) == 1
    assert abs(r["a"] - G.PR_SCALE // 3) <= 1


def test_sink_attracts_mass(spark):
    # star into d: d must outrank the sources
    r = _pr(spark, [("a", "d", 1), ("b", "d", 1), ("c", "d", 1)])
    assert r["d"] > r["a"] == r["b"] == r["c"]


def test_weights_matter(spark):
    # a splits 9:1 between b and c → b outranks c
    r = _pr(spark, [("a", "b", 9), ("a", "c", 1)])
    assert r["b"] > r["c"]


def test_partitioning_invariance(spark):
    """Same graph, adversarial repartitioning: fixed-point integer sums
    are order-independent, so ranks must be bit-identical."""
    edges = [(f"n{i}", f"n{(i * 7 + 3) % 11}", (i % 5) + 1) for i in range(40)]
    df1 = spark.createDataFrame([Row(src=s, dst=d, w=w) for s, d, w in edges])
    df2 = df1.repartition(13, "dst")
    r1 = {r["id"]: r["rank_fp"] for r in G.pagerank(df1).collect()}
    r2 = {r["id"]: r["rank_fp"] for r in G.pagerank(df2).collect()}
    assert r1 == r2


def test_damping_bounds_validated(spark):
    import pytest
    df = spark.createDataFrame([Row(src="a", dst="b", w=1)])
    with pytest.raises(ValueError):
        G.pagerank(df, damping_pct=0)
    with pytest.raises(ValueError):
        G.pagerank(df, damping_pct=100)


def test_pagerank_overflow_guard_fires(spark):
    """Weights whose per-source sum would overflow the bigint fixed-point
    must fail the action loudly (assert_true in the out-weight aggregate),
    not silently corrupt ranks."""
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError

    e = spark.createDataFrame(
        [("a", "b", 2**63 // G.PR_SCALE + 1)],
        "src string, dst string, w long")
    with _pytest.raises(Exception) as exc:
        G.pagerank(e, iters=1).collect()
    assert "rescale weights" in str(exc.value) or "ASSERT" in str(exc.value).upper()


def test_label_propagation_two_blocs(spark):
    """Two dense triangles joined by one weak edge resolve into two
    communities; the min-label tie-break keeps the result deterministic."""
    from glue_hudi_spark.operators.graph import label_propagation

    edges = spark.createDataFrame(
        [("a", "b", 10), ("b", "c", 10), ("a", "c", 10),
         ("x", "y", 10), ("y", "z", 10), ("x", "z", 10),
         ("c", "x", 1)],                      # weak bridge
        "src string, dst string, w int")
    out = {r["id"]: r["community"]
           for r in label_propagation(edges, iters=3).collect()}
    assert len(set(out[n] for n in "abc")) == 1
    assert len(set(out[n] for n in "xyz")) == 1
    assert out["a"] != out["x"]


def test_label_propagation_deterministic_ties(spark):
    """Equal-weight neighbors: the smallest label wins every round."""
    from glue_hudi_spark.operators.graph import label_propagation

    edges = spark.createDataFrame(
        [("m", "a", 5), ("m", "z", 5)], "src string, dst string, w int")
    out = {r["id"]: r["community"]
           for r in label_propagation(edges, iters=1).collect()}
    assert out["m"] == "a"          # tie -> lexicographically smallest
