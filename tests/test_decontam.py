"""Benchmark decontamination (operators/decontam.py).

Semantics pinned here; engine-parity is pinned by the oracle gate
(``corpus_decontaminate`` in tests/test_oracle_parity.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from glue_hudi_spark.operators import decontam


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_verbatim_benchmark_doc_is_fully_contaminated(spark):
    train = _docs(spark, [
        (1, "a b c d e f g h"),          # verbatim in benchmark
        (2, "z y x w v u t s"),          # disjoint
    ])
    bench = _docs(spark, [(100, "a b c d e f g h")])
    out = {
        r["doc_id"]: r
        for r in decontam.ngram_overlap(train, bench, n=5).collect()
    }
    assert out[1]["overlap_ratio"] == 1.0 and out[1]["contaminated"]
    assert out[2]["n_hit"] == 0 and not out[2]["contaminated"]


def test_partial_overlap_ratio(spark):
    # 8 tokens -> 4 distinct 5-grams; sharing the first 5 tokens with the
    # benchmark hits exactly 1 of them.
    train = _docs(spark, [(1, "a b c d e X Y Z")])
    bench = _docs(spark, [(100, "a b c d e q r s")])
    row = decontam.ngram_overlap(train, bench, n=5, flag_threshold=0.5).collect()[0]
    assert row["n_grams"] == 4
    assert row["n_hit"] == 1
    assert row["overlap_ratio"] == 0.25
    assert not row["contaminated"]


def test_short_docs_yield_no_grams(spark):
    train = _docs(spark, [(1, "a b c"), (2, "a b c d e f")])
    bench = _docs(spark, [(100, "nothing shared here at all six")])
    rows = decontam.ngram_overlap(train, bench, n=5).collect()
    assert {r["doc_id"] for r in rows} == {2}


def test_case_and_duplicate_grams_normalized(spark):
    # duplicated grams count once (distinct per doc); case-insensitive
    train = _docs(spark, [(1, "A b C d E a B c D e a b c d e")])
    bench = _docs(spark, [(100, "a b c d e")])
    row = decontam.ngram_overlap(train, bench, n=5).collect()[0]
    assert row["n_hit"] >= 1
    assert row["n_grams"] == row["n_grams"]  # distinct set, no dup inflation
    assert row["n_grams"] <= 11


def test_no_shuffle_of_gram_text(spark):
    """The join key must be the md5 hash (fixed width), never gram text."""
    train = _docs(spark, [(1, "a b c d e f")])
    bench = _docs(spark, [(100, "a b c d e f")])
    plan = decontam.ngram_overlap(train, bench)._jdf.queryExecution().toString()
    assert "md5" in plan
