"""plans.lint: every assertion fires on a plan that violates it and
passes on one that honors it."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from glue_hudi_spark.plans import lint


def _docs(spark):
    return spark.createDataFrame(
        [(i, f"g{i % 3}", float(i)) for i in range(100)],
        "id long, g string, v double")


def test_no_cartesian_passes_equi_and_scalar_append(spark):
    d = _docs(spark)
    j = d.join(d.withColumnRenamed("v", "v2").select("id", "v2"), on="id")
    lint.assert_no_cartesian(j)
    scalar = d.crossJoin(F.broadcast(d.agg(F.max("v").alias("mx"))))
    lint.assert_no_cartesian(scalar)  # sanctioned 1-row append


def test_no_cartesian_rejects_true_cross(spark):
    d = _docs(spark)
    cross = d.crossJoin(d.select(F.col("id").alias("id2")))
    with pytest.raises(lint.PlanLintError):
        lint.assert_no_cartesian(cross)


def test_no_cartesian_checks_the_build_side_not_the_whole_plan(spark):
    """A global aggregate ELSEWHERE in the plan must not whitelist a
    genuine O(n·m) BNLJ — the scalar-row exemption is positional (the
    BNLJ's broadcast build side), not a plan-wide grep."""
    d = _docs(spark)
    # multi-row broadcast BNLJ ... whose PROBE side contains a scalar agg
    probe = d.crossJoin(F.broadcast(d.agg(F.max("v").alias("mx"))))
    bad = probe.crossJoin(
        F.broadcast(d.select(F.col("id").alias("id2")).limit(50)))
    with pytest.raises(lint.PlanLintError, match="build side"):
        lint.assert_no_cartesian(bad)
    # and a scalar append nested under other operators still passes
    ok = probe.groupBy("g").agg(F.sum("v").alias("s"))
    lint.assert_no_cartesian(ok)


def test_python_eval_detected(spark):
    from pyspark.sql.functions import udf

    d = _docs(spark)
    lint.assert_no_python_eval(d.select((F.col("v") * 2).alias("w")))
    slow = udf(lambda x: x * 2, "double")
    with pytest.raises(lint.PlanLintError):
        lint.assert_no_python_eval(d.select(slow("v").alias("w")))


def test_pushdown_and_pruning(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    _docs(spark).write.parquet(p)
    df = spark.read.parquet(p).filter(F.col("id") > 10).select("id", "g")
    lint.assert_pushed_filter(df, "GreaterThan(id")
    lint.assert_max_read_columns(df, 2)
    with pytest.raises(lint.PlanLintError):
        lint.assert_max_read_columns(spark.read.parquet(p), 2)
    with pytest.raises(lint.PlanLintError):
        lint.assert_pushed_filter(df, "LessThan(v")


def test_shuffle_budget(spark):
    d = _docs(spark)
    one = d.groupBy("g").agg(F.sum("v").alias("s"))
    assert lint.count_shuffles(one) == 1
    lint.assert_max_shuffles(one, 1)
    with pytest.raises(lint.PlanLintError):
        lint.assert_max_shuffles(one.orderBy("s"), 1)


def test_broadcast_only(spark):
    d = _docs(spark)
    dim = spark.createDataFrame([("g0", "x"), ("g1", "y")], "g string, tag string")
    lint.assert_broadcast_joins_only(d.join(F.broadcast(dim), on="g"))
    big = d.withColumnRenamed("v", "v2")
    with pytest.raises(lint.PlanLintError):
        lint.assert_broadcast_joins_only(
            d.join(big.hint("merge"), on="id"))


def test_no_cartesian_accepts_one_row_literal_builds(spark):
    """A broadcast side that is provably ONE row — a SQL literal relation
    (Scan OneRowRelation) or a single-element Range — is the sanctioned
    constant-append pattern, same as the group-less aggregate."""
    d = spark.range(100).withColumn("v", F.col("id") * 2.0)
    lit = spark.sql("SELECT 7.5 AS thr")
    lint.assert_no_cartesian(d.crossJoin(F.broadcast(lit)))
    one = spark.range(1).select(F.col("id").alias("k"))
    lint.assert_no_cartesian(d.crossJoin(F.broadcast(one)))


def test_no_cartesian_still_rejects_multi_row_range_build(spark):
    """A multi-element Range build side stays an O(n·m) violation — the
    one-row acceptance must not leak past provable single rows."""
    import pytest as _pytest

    d = spark.range(100)
    many = spark.range(50).select(F.col("id").alias("k"))
    with _pytest.raises(lint.PlanLintError):
        lint.assert_no_cartesian(d.crossJoin(F.broadcast(many)))
