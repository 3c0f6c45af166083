"""Embedding-column functions (functions/vectors.py): quantization error
bounds, normalization, Matryoshka truncation."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from glue_hudi_spark.functions import vectors as VX


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (0, [1.0, -2.0, 3.0, -4.0]),
        (1, [0.0, 0.0, 0.0, 0.0]),          # zero vector
        (2, [127.0, -127.0, 63.5, 0.25]),
        (3, [1e-6, -1e-6, 5e-7, 0.0]),      # tiny magnitudes
    ]
    return spark.createDataFrame(rows, "vec_id bigint, v array<double>")


def test_quantize_roundtrip_error_bound(spark, vecs):
    out = vecs.select(
        "vec_id", "v",
        VX.int8_scale("v").alias("s"),
        VX.quantize_int8("v").alias("codes"),
    ).collect()
    for r in out:
        if r["s"] == 0.0:
            assert all(c == 0 for c in r["codes"])
            continue
        assert all(-127 <= c <= 127 for c in r["codes"])
        for x, c in zip(r["v"], r["codes"]):
            # symmetric round-half-up: |x - c*s| <= s/2
            assert abs(x - c * r["s"]) <= r["s"] / 2 + 1e-12


def test_quantize_saturates_at_extremes(spark, vecs):
    r = {x["vec_id"]: x["codes"] for x in
         vecs.select("vec_id", VX.quantize_int8("v").alias("codes")).collect()}
    assert r[2][0] == 127 and r[2][1] == -127


def test_l2_normalize_unit_norm(spark, vecs):
    out = vecs.select("vec_id", VX.l2_normalize("v").alias("u")).collect()
    for r in out:
        n = math.sqrt(sum(x * x for x in r["u"]))
        if r["vec_id"] == 1:
            assert n == 0.0  # zero vector unchanged
        else:
            assert abs(n - 1.0) < 1e-12


def test_truncate_dims(spark, vecs):
    out = {r["vec_id"]: r["t"] for r in
           vecs.select("vec_id", VX.truncate_dims("v", 2).alias("t")).collect()}
    assert all(len(t) == 2 for t in out.values())
    n = math.sqrt(sum(x * x for x in out[0]))
    assert abs(n - 1.0) < 1e-12
    raw = {r["vec_id"]: r["t"] for r in
           vecs.select("vec_id",
                       VX.truncate_dims("v", 2, renormalize=False).alias("t"))
           .collect()}
    assert raw[0] == [1.0, -2.0]
