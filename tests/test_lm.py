"""Unigram LM scoring (operators/lm.py): hand-computed probabilities,
OOV floor behavior, and the vocabulary-sized-model contract."""

from __future__ import annotations

import math

from glue_hudi_spark.operators import lm


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_train_matches_hand_computed_distribution(spark):
    d = _docs(spark, [(1, "a a b"), (2, "b c")])
    model = {r["tok"]: r for r in lm.unigram_train(d).collect()}
    # N=5 tokens, V=3 vocab -> denom 8
    assert set(model) == {"a", "b", "c"}
    assert model["a"]["cnt"] == 2
    assert math.isclose(model["a"]["logp"], math.log(3 / 8))
    assert math.isclose(model["b"]["logp"], math.log(3 / 8))
    assert math.isclose(model["c"]["logp"], math.log(2 / 8))
    assert math.isclose(model["a"]["oov_logp"], math.log(1 / 8))


def test_score_means_token_logprobs_and_floors_oov(spark):
    train = _docs(spark, [(1, "a a b"), (2, "b c")])
    model = lm.unigram_train(train)
    # doc 3 contains 'z' (OOV) -> smoothing floor log(1/8)
    scored = {
        r["doc_id"]: r
        for r in lm.unigram_score(_docs(spark, [(3, "a z")]), model).collect()
    }
    want = (math.log(3 / 8) + math.log(1 / 8)) / 2
    assert scored[3]["n_tokens"] == 2
    assert math.isclose(scored[3]["avg_logp"], want)


def test_low_probability_doc_scores_below_corpus_like_doc(spark):
    corpus = _docs(
        spark,
        [(i, "the cat sat on the mat") for i in range(20)]
        + [(100, "zq xv qj kz")],
    )
    model = lm.unigram_train(corpus)
    got = {r["doc_id"]: r["avg_logp"]
           for r in lm.unigram_score(corpus, model).collect()}
    assert got[100] < got[0], "gibberish must score below corpus-like text"


def test_model_is_vocabulary_sized(spark):
    d = _docs(spark, [(i, "alpha beta gamma") for i in range(50)])
    assert lm.unigram_train(d).count() == 3
