"""Batch perceptron (operators.classify): exact integer training — hand-
computed rounds, convergence freeze, and the application path."""

from __future__ import annotations

import pytest

from glue_hudi_spark.operators import classify


def _feats(spark, rows):
    return spark.createDataFrame(rows, "y long, b long, x long")


def test_hand_computed_rounds(spark):
    # separable 1-D data with bias: y=+1 at x=2,3; y=-1 at x=-1,-2
    f = _feats(spark, [(1, 1, 2), (1, 1, 3), (-1, 1, -1), (-1, 1, -2)])
    out = classify.perceptron_train(f, ["b", "x"], rounds=3)
    # round 1: w=0 → all 4 misclassified; delta = Σ y·x = (b: 1+1-1-1=0,
    # x: 2+3+1+2=8) → w=(0,8)
    assert out[0] == {"round": 1, "n_mis": 4, "b": 0, "x": 8}
    # round 2: margins y·8x = 16,24,8,16 all >0 → converged, w frozen
    assert out[1] == {"round": 2, "n_mis": 0, "b": 0, "x": 8}
    assert out[2] == {"round": 3, "n_mis": 0, "b": 0, "x": 8}


def test_nonseparable_updates_are_exact_sums(spark):
    # y=+1 at x=1, y=-1 at x=1 (conflict) plus a clean point
    f = _feats(spark, [(1, 1, 1), (-1, 1, 1), (1, 1, 5)])
    out = classify.perceptron_train(f, ["b", "x"], rounds=2)
    # round 1: all 3 mis (w=0): delta b = 1-1+1 = 1, x = 1-1+5 = 5
    assert out[0] == {"round": 1, "n_mis": 3, "b": 1, "x": 5}
    # round 2 under w=(1,5): margins: +1·6>0 ok; -1·6<0 mis; +1·26>0 ok
    # delta from the one mis point: b -1, x -1 → w=(0,4)
    assert out[1] == {"round": 2, "n_mis": 1, "b": 0, "x": 4}


def test_classify_applies_weights(spark):
    f = _feats(spark, [(1, 1, 2), (-1, 1, -2)])
    pred = classify.classify(f, {"b": 0, "x": 8}, ["b", "x"])
    rows = {(r["y"], r["pred"]) for r in pred.collect()}
    assert rows == {(1, 1), (-1, -1)}


def test_rounds_validation():
    with pytest.raises(ValueError):
        classify.perceptron_train(None, ["x"], rounds=0)


def test_training_round_is_one_partial_aggregate_pass(spark):
    """Each perceptron round must compile to ONE map-side-combined
    aggregate over the (filtered) feature table — no join, no window,
    no second scan: the shape that makes K rounds K linear passes at
    corpus scale."""
    from pyspark.sql import functions as F
    from glue_hudi_spark.plans import lint

    f = _feats(spark, [(1, 1, 2), (-1, 1, -2)] * 50)
    # the exact per-round plan perceptron_train builds (w = [3, -1])
    dot = f["b"] * F.lit(3).cast("long") + f["x"] * F.lit(-1).cast("long")
    agg = (f.filter(f["y"] * dot <= 0)
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum(f["y"] * f["b"]).alias("b"),
                F.sum(f["y"] * f["x"]).alias("x")))
    plan = lint.plan_text(agg)
    assert "partial" in plan.lower()       # map-side combine
    assert "Join" not in plan and "Window" not in plan
    lint.assert_no_python_eval(agg)
