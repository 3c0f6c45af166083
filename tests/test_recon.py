"""Reconciliation checksums: duplicate sensitivity (the XOR trap),
missing-group surfacing, corruption localization."""

from __future__ import annotations

from pyspark.sql import Row

from glue_hudi_spark.operators import recon


def _df(spark, rows):
    return spark.createDataFrame([Row(g=g, k=k, v=v) for g, k, v in rows])


def _mismatches(df):
    return {r["g"] for r in df.collect()
            if not r["ck_match"] or r["n_a"] != r["n_b"]}


def test_identical_tables_fully_match(spark):
    a = _df(spark, [("g1", 1, "x"), ("g1", 2, "y"), ("g2", 3, "z")])
    out = recon.reconcile(a, a, ["g"], ["k", "v"])
    assert _mismatches(out) == set()


def test_corruption_localized_to_its_group(spark):
    a = _df(spark, [("g1", 1, "x"), ("g2", 2, "y"), ("g3", 3, "z")])
    b = _df(spark, [("g1", 1, "x"), ("g2", 2, "CORRUPT"), ("g3", 3, "z")])
    assert _mismatches(recon.reconcile(a, b, ["g"], ["k", "v"])) == {"g2"}


def test_duplicated_row_detected_unlike_xor(spark):
    """A duplicated row changes the SUM checksum (an XOR checksum would
    cancel the pair and miss it)."""
    a = _df(spark, [("g1", 1, "x")])
    b = _df(spark, [("g1", 1, "x"), ("g1", 1, "x")])
    assert _mismatches(recon.reconcile(a, b, ["g"], ["k", "v"])) == {"g1"}


def test_missing_group_surfaces_with_zero_count(spark):
    a = _df(spark, [("g1", 1, "x"), ("g2", 2, "y")])
    b = _df(spark, [("g1", 1, "x")])
    rows = {r["g"]: r for r in recon.reconcile(a, b, ["g"], ["k", "v"]).collect()}
    assert rows["g2"]["n_b"] == 0 and not rows["g2"]["ck_match"]


def test_null_vs_empty_string_distinguished(spark):
    a = spark.createDataFrame([("g1", 1, None)], "g string, k int, v string")
    b = spark.createDataFrame([("g1", 1, "")], "g string, k int, v string")
    assert _mismatches(recon.reconcile(a, b, ["g"], ["k", "v"])) == {"g1"}
