"""operators/expectations.py: seeded-violation counts, one-pass plan."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from glue_hudi_spark.operators import expectations as EX


def _report(df, rules):
    return {r["rule"]: (r["violations"], r["total"])
            for r in EX.check_expectations(df, rules).collect()}


def test_each_rule_counts_seeded_violations(spark):
    df = spark.createDataFrame([
        Row(id=1, code="A", val=5.0, ref=10),
        Row(id=2, code="B", val=-1.0, ref=10),   # val out of range
        Row(id=2, code="A", val=3.0, ref=11),    # dup id, ref orphan
        Row(id=3, code="X", val=None, ref=None), # bad code, null val+ref
    ])
    dim = spark.createDataFrame([Row(k=10)])
    rules = [
        EX.not_null("ref_not_null", "ref"),
        EX.accepted_values("code_domain", "code", ["A", "B"]),
        EX.in_range("val_range", "val", 0.0, 10.0),
        EX.predicate("val_under_4", F.col("val") < 4.0),
        EX.unique("id_unique", ["id"]),
        EX.foreign_key("ref_fk", "ref", dim, "k"),
    ]
    rep = _report(df, rules)
    assert rep["ref_not_null"] == (1, 4)
    assert rep["code_domain"] == (1, 4)
    # -1 out of range and NULL both violate
    assert rep["val_range"] == (2, 4)
    # 5.0 >= 4 violates; NULL predicate violates
    assert rep["val_under_4"] == (2, 4)
    # one duplicated group of 3 distinct ids
    assert rep["id_unique"] == (1, 3)
    # ref=11 orphan and ref=NULL both fail to resolve
    assert rep["ref_fk"] == (2, 4)


def test_clean_table_gates_green(spark):
    df = spark.createDataFrame([Row(id=i, v=float(i)) for i in range(5)])
    rules = [EX.not_null("nn", "v"), EX.unique("u", ["id"]),
             EX.in_range("r", "v", 0.0, 10.0)]
    rep = _report(df, rules)
    assert all(v == 0 for v, _ in rep.values())


def test_row_local_rules_share_one_scan(spark):
    """All row-local rules must compile into a single aggregate over a
    single scan — rule count must not multiply scans."""
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("m"))
    rules = [
        EX.not_null("a", "m"),
        EX.in_range("b", "m", 0, 5),
        EX.predicate("c", F.col("id") < 50),
    ]
    plan = EX.check_expectations(df, rules)._jdf.queryExecution() \
        .optimizedPlan().toString()
    assert plan.count("Range (0, 100") == 1, plan


def test_duplicate_rule_names_rejected(spark):
    import pytest
    df = spark.range(1)
    with pytest.raises(ValueError):
        EX.check_expectations(df, [EX.not_null("x", "id"),
                                   EX.unique("x", ["id"])])
