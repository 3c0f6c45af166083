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


def test_bigram_counts_and_backoff(spark):
    import math as m

    train = _docs(spark, [(1, "a b a b c")])
    bi = {(r["w1"], r["w2"]): (r["c12"], r["c1"])
          for r in lm.bigram_train(train).collect()}
    # pairs: (a,b)x2 (b,a) (b,c); c1: a->2, b->2
    assert bi == {("a", "b"): (2, 2), ("b", "a"): (1, 2), ("b", "c"): (1, 2)}

    uni = lm.unigram_train(train)
    # "a b" seen -> ln(2/2)=0; "b z" unseen -> ln(.4)+oov ln(1/8)
    # (N=5 tokens, V=3 -> denom 8)
    scored = {r["doc_id"]: r for r in
              lm.bigram_score(_docs(spark, [(9, "a b z")]), lm.bigram_train(train), uni).collect()}
    want = (m.log(2 / 2) + (m.log(0.4) + m.log(1 / 8))) / 2
    assert scored[9]["n_bigrams"] == 2
    assert m.isclose(scored[9]["avg_logp"], want)


def test_single_token_docs_have_no_bigrams(spark):
    train = _docs(spark, [(1, "a b")])
    out = lm.bigram_score(
        _docs(spark, [(5, "solo"), (6, "a b")]),
        lm.bigram_train(train), lm.unigram_train(train))
    assert {r["doc_id"] for r in out.collect()} == {6}


def test_model_save_load_roundtrip_scores_identically(spark, tmp_path):
    train = _docs(spark, [(1, "a a b"), (2, "b c")])
    model = lm.unigram_train(train)
    p = str(tmp_path / "uni_model")
    lm.save_model(model, p)
    loaded = lm.load_model(spark, p)
    score = _docs(spark, [(9, "a z")])
    a = lm.unigram_score(score, model).collect()[0]["avg_logp"]
    b = lm.unigram_score(score, loaded).collect()[0]["avg_logp"]
    assert a == b


def test_score_pair_matches_two_single_scores(spark):
    """unigram_score_pair == two unigram_score passes, in one token pass."""
    from glue_hudi_spark.operators import lm

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a a d"), (3, "zz qq")], "doc_id long, text string")
    ma = lm.unigram_train(docs.filter("doc_id = 1"))
    mb = lm.unigram_train(docs)
    pair = {r["doc_id"]: (r["avg_logp_a"], r["avg_logp_b"], r["n_tokens"])
            for r in lm.unigram_score_pair(docs, ma, mb).collect()}
    sa = {r["doc_id"]: r["avg_logp"]
          for r in lm.unigram_score(docs, ma).collect()}
    sb = {r["doc_id"]: r["avg_logp"]
          for r in lm.unigram_score(docs, mb).collect()}
    for d in (1, 2, 3):
        assert abs(pair[d][0] - sa[d]) < 1e-12
        assert abs(pair[d][1] - sb[d]) < 1e-12
    assert pair[1][2] == 3


def test_bpe_train_classic_example(spark):
    # Sennrich et al.'s worked example: es → est → est</w> dominate
    from glue_hudi_spark.operators import lm

    docs = spark.createDataFrame([
        ("low low low low low",),
        ("lower lower newest newest newest",),
        ("newest newest newest widest widest",),
    ], "text string")
    merges = lm.bpe_train(docs, rounds=5)
    got = [(m["left"], m["right"]) for m in merges]
    assert got == [("e", "s"), ("es", "t"), ("est", "</w>"),
                   ("l", "o"), ("lo", "w")]
    # segmentation applies merges in training order, greedy-exact
    seg = lm.bpe_segment(
        spark.createDataFrame([("newest lowest",)], "text string"), merges)
    toks = seg.select("bpe_tokens").collect()[0][0]
    # "lowest" gets the full chain l+o → lo+w → "low" then "est</w>"
    assert toks == ["n", "e", "w", "est</w>", "low", "est</w>"]


def test_bpe_greedy_self_pair(spark):
    # 'aaaa' under merge (a,a): greedy left-to-right gives aa|aa, never
    # the overlapping a|aa|a — the wrapped-encoding replace must agree
    from glue_hudi_spark.operators import lm

    docs = spark.createDataFrame([("aaaa aaaa aaaa",)], "text string")
    merges = lm.bpe_train(docs, rounds=2)
    assert (merges[0]["left"], merges[0]["right"]) == ("a", "a")
    # round 2 ties (aa,aa) with (aa,</w>) at 3 — lexicographic tie-break
    # picks (aa,</w>) ('<' sorts below 'a'), deterministically
    assert (merges[1]["left"], merges[1]["right"]) == ("aa", "</w>")
    seg = lm.bpe_segment(docs, merges)
    toks = seg.select("bpe_tokens").collect()[0][0]
    # greedy self-pair: a a a a → aa aa (never the overlapping a aa a),
    # then (aa,</w>) merges the tail
    assert toks[:2] == ["aa", "aa</w>"]


def test_bpe_min_count_stops_early(spark):
    from glue_hudi_spark.operators import lm

    docs = spark.createDataFrame([("xy",)], "text string")
    merges = lm.bpe_train(docs, rounds=5, min_count=2)
    assert merges == []  # every pair is a singleton


def test_bpe_segment_chunked_equals_unchunked(spark):
    """Property: chunked merge application (chunk_size=2, so the 4-round
    merge list spans multiple checkpointed passes) produces exactly the
    unchunked segmentation."""
    docs = spark.createDataFrame(
        [(1, "low lower lowest newest new widest"),
         (2, "low low low newest widest wide")],
        "doc_id long, text string")
    merges = lm.bpe_train(docs, rounds=4, min_count=1)
    assert len(merges) == 4
    one = {r["doc_id"]: r["bpe_tokens"] for r in lm.bpe_segment(
        docs, merges, chunk_size=1000).collect()}
    chunked = {r["doc_id"]: r["bpe_tokens"] for r in lm.bpe_segment(
        docs, merges, chunk_size=2).collect()}
    assert one == chunked and len(one) == 2


def test_bpe_segment_256_merges_no_expression_blowup(spark):
    """A production-scale merge list (256 rules, mostly non-matching)
    must run through the default chunk_size without blowing the codegen
    expression tree — the chunked passes bound per-stage depth."""
    docs = spark.createDataFrame(
        [(1, "aaab abab baaa"), (2, "abba baab abab")],
        "doc_id long, text string")
    real = lm.bpe_train(docs, rounds=2, min_count=1)
    # pad with well-formed rules that never match the corpus: applying a
    # non-matching replace is a semantic no-op, so the expected output is
    # the real-rules-only segmentation
    fake = [{"round": i, "left": f"x{i}", "right": f"y{i}", "pair_count": 1}
            for i in range(len(real) + 1, 257)]
    merges = real + fake
    assert len(merges) == 256
    want = {r["doc_id"]: r["bpe_tokens"]
            for r in lm.bpe_segment(docs, real).collect()}
    got = {r["doc_id"]: r["bpe_tokens"]
           for r in lm.bpe_segment(docs, merges).collect()}
    assert got == want
