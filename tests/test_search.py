"""operators/search.py BM25: ranking behavior the hash gate can't see."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from glue_hudi_spark.operators import search as SRCH


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)])


def test_tf_and_rarity_order_the_ranking(spark):
    d = _docs(spark, [
        "cat cat cat dog",      # 0: heavy on 'cat'
        "cat dog bird fish",    # 1: one of each
        "dog dog dog dog",      # 2: no query terms but 'dog'
        "bird bird cat lion",   # 3: rare term 'bird' twice + cat
    ])
    rows = SRCH.bm25_topk(d, ["cat", "bird"], k=4).collect()
    ranked = [r["doc_id"] for r in rows]
    # doc 3 matches both terms (bird is rarer); doc 2 matches neither
    assert ranked[0] == 3
    assert ranked[-1] == 2 and rows[-1]["score"] == 0.0 or 2 not in ranked


def test_no_match_returns_empty_scores_not_errors(spark):
    d = _docs(spark, ["alpha beta", "gamma delta"])
    rows = SRCH.bm25_topk(d, ["zeta"], k=5).collect()
    # no posting rows → pivot yields no rows at all
    assert rows == []


def test_k_limits_and_ties_break_by_doc_id(spark):
    d = _docs(spark, ["same text here"] * 6)
    rows = SRCH.bm25_topk(d, ["same"], k=3).collect()
    assert [r["doc_id"] for r in rows] == [0, 1, 2]
    assert len({r["score"] for r in rows}) == 1


def test_input_validation(spark):
    d = _docs(spark, ["x"])
    with pytest.raises(ValueError):
        SRCH.bm25_topk(d, [])
    with pytest.raises(ValueError):
        SRCH.bm25_topk(d, ["a", "a"])
