"""Salting transforms must be result-identical to their plain equivalents."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from glue_hudi_spark.operators.skew import salted_agg, salted_join


@pytest.fixture()
def skewed(spark):
    # one hot key (90%), two cold keys
    rows = [Row(k="hot" if i % 10 else "cold" + str(i % 2), v=float(i)) for i in range(1000)]
    return spark.createDataFrame(rows)


def test_salted_agg_equals_plain_groupby(spark, skewed):
    plain = {
        (r["k"],): (r["n"], r["s"], r["mx"])
        for r in skewed.groupBy("k")
        .agg(F.count("v").alias("n"), F.sum("v").alias("s"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        (r["k"],): (r["n"], r["s"], r["mx"])
        for r in salted_agg(
            skewed, ["k"], {"n": ("count", "v"), "s": ("sum", "v"), "mx": ("max", "v")},
            salt_buckets=8,
        ).collect()
    }
    assert salted == plain


def test_salted_agg_rejects_non_decomposable(spark, skewed):
    with pytest.raises(ValueError, match="decomposable"):
        salted_agg(skewed, ["k"], {"a": ("avg", "v")})


def test_salted_join_equals_plain_join(spark, skewed):
    dim = spark.createDataFrame(
        [Row(k="hot", label="H"), Row(k="cold0", label="C0"), Row(k="missing", label="M")]
    )
    plain = sorted(
        (r["k"], r["v"], r["label"]) for r in skewed.join(dim, on="k").collect()
    )
    salted = sorted(
        (r["k"], r["v"], r["label"]) for r in salted_join(skewed, dim, ["k"], 8).collect()
    )
    assert salted == plain
    # left join preserves unmatched big-side rows
    n_left = salted_join(skewed, dim.filter("k = 'hot'"), ["k"], 8, how="left").count()
    assert n_left == skewed.count()


def test_salted_join_rejects_small_side_outer(spark, skewed):
    big, small = skewed
    for how in ("right", "full", "right_outer", "full_outer"):
        with pytest.raises(ValueError, match="duplicate unmatched"):
            salted_join(big, small, ["k"], how=how)
