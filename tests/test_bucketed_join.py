"""Bucketed co-located joins: same-bucketed tables must join with no
Exchange (shuffle) in the physical plan, and results must match the
plain join."""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from glue_hudi_spark.catalog import save_bucketed_table


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture()
def bucketed_pair(spark):
    # warehouse dir is static (set by the session fixture); isolate by db
    spark.sql("DROP DATABASE IF EXISTS bktest CASCADE")
    spark.sql("CREATE DATABASE bktest")
    orders = spark.range(10_000).select(
        F.col("id").alias("o_key"), (F.col("id") % 97).alias("o_val")
    )
    items = spark.range(30_000).select(
        (F.col("id") % 10_000).alias("o_key"), F.col("id").alias("i_val")
    )
    save_bucketed_table(spark, orders, "bktest.orders_b", ["o_key"], 8)
    save_bucketed_table(spark, items, "bktest.items_b", ["o_key"], 8)
    yield orders, items
    spark.sql("DROP DATABASE bktest CASCADE")


def test_bucketed_join_has_no_shuffle(spark, bucketed_pair):
    orders, items = bucketed_pair
    a = spark.table("bktest.orders_b")
    b = spark.table("bktest.items_b")
    # disable broadcast so the join strategy decision is about shuffles
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, on="o_key")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert len(re.findall(r"\bExchange\b", plan)) == 0, (
            "bucketed join must not shuffle"
        )
        # and an equivalent non-bucketed join DOES shuffle
        plain = orders.join(items, on="o_key")
        assert len(re.findall(r"\bExchange\b", _plan(plain))) >= 2
        # results identical
        assert joined.count() == plain.count()
        s = joined.agg(F.sum(F.col("o_val") * F.col("i_val")).alias("x")).collect()[0]["x"]
        p = plain.agg(F.sum(F.col("o_val") * F.col("i_val")).alias("x")).collect()[0]["x"]
        assert s == p
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
