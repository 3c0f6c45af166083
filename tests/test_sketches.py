"""Estimator-quality pins for the portable sketches (hash parity with the
DuckDB oracle is covered by test_oracle_parity; these check the sketches
are actually good estimators, not just deterministic ones)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from glue_hudi_spark.functions import sketches as SK

SF_DIR = os.environ.get("GHS_PARITY_SF_DIR", "/root/testdata/sf0.001")


def test_hll_estimate_within_expected_error(spark):
    row = entry_mod.events_hll_distinct(spark, SF_DIR).collect()[0]
    est, exact = row["hll_estimate"], row["exact_distinct"]
    # raw HLL (no small-range correction) at m=512: standard error
    # 1.04/sqrt(512) ≈ 4.6%; allow 4 sigma plus small-range bias headroom
    assert exact > 0
    assert abs(est - exact) / exact < 0.25, (est, exact)


def test_cms_never_undercounts_and_is_tight(spark):
    rows = entry_mod.events_cms_heavy_hitters(spark, SF_DIR).collect()
    assert len(rows) == 10
    for r in rows:
        assert r["est_count"] >= r["exact_count"], r
        # ε = e/w ≈ 1.06% of total mass; events row count bounds the mass
        total = entry_mod._t(spark, SF_DIR, "events").count()
        assert r["est_count"] - r["exact_count"] <= 0.05 * total, r


def test_cms_merges_linearly(spark):
    """Union-then-build equals build-then-sum — the property that lets the
    sketch run per-partition / per-batch and merge."""
    ev = entry_mod._t(spark, SF_DIR, "events").select("user_id")
    a = ev.filter(F.col("user_id") % 2 == 0)
    b = ev.filter(F.col("user_id") % 2 == 1)
    whole = SK.cms_build(ev, "user_id")
    merged = (
        SK.cms_build(a, "user_id")
        .unionByName(SK.cms_build(b, "user_id"))
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    diff = whole.alias("w").join(
        merged.alias("m"), ["row", "bucket"], "full"
    ).filter("coalesce(w.cnt, -1) <> coalesce(m.cnt, -1)")
    assert diff.count() == 0
