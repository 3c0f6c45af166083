"""Deterministic sampling operators (operators/sampling.py).

The oracle gate (corpus_stratified_sample / corpus_token_budget /
corpus_mixed) proves engine parity; these tests pin the semantic
properties parity can't see: determinism across runs, rate monotonicity,
budget edge cases, and mix proportions.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from glue_hudi_spark.operators import sampling


def _docs(spark, n=2000):
    return spark.createDataFrame(
        [(i, ["en", "fr", "de", "zh"][i % 4], f"src{i % 3}", 10 + i % 90)
         for i in range(n)],
        "doc_id bigint, lang string, source string, n_tokens bigint",
    )


def test_stratified_sample_deterministic_and_proportional(spark):
    d = _docs(spark)
    rates = {"en": 0.5, "fr": 0.1, "de": 1.0}
    a = sampling.stratified_sample(d, "lang", rates, "doc_id")
    b = sampling.stratified_sample(d, "lang", rates, "doc_id")
    ra = {r["doc_id"] for r in a.collect()}
    assert ra == {r["doc_id"] for r in b.collect()}  # no RNG anywhere
    by_lang = {r["lang"]: r["n"] for r in
               a.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert by_lang["de"] == 500           # rate 1.0 keeps everything
    assert "zh" not in by_lang            # default_rate 0 drops the stratum
    assert 150 <= by_lang["en"] <= 350    # ~250 expected at rate 0.5
    assert 10 <= by_lang["fr"] <= 110     # ~50 expected at rate 0.1
    # subset property: raising a rate only adds rows
    wider = sampling.stratified_sample(d, "lang", {**rates, "fr": 0.5}, "doc_id")
    assert ra <= {r["doc_id"] for r in wider.collect()}


def test_stratified_sample_is_map_side(spark):
    plan = sampling.stratified_sample(
        _docs(spark), "lang", {"en": 0.5}, "doc_id"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure filter: one scan, no shuffle


def test_token_budget_prefix_semantics(spark):
    d = spark.createDataFrame(
        [(1, "en", 50, 0.9), (2, "en", 40, 0.8), (3, "en", 30, 0.7),
         (4, "en", 100, 0.6), (5, "fr", 500, 0.9), (6, "fr", 90, 0.5)],
        "doc_id bigint, lang string, n_tokens bigint, quality double",
    )
    out = sampling.token_budget_sample(
        d, "n_tokens", budget=100, stratum_col="lang",
        order_by=[F.col("quality").desc(), F.col("doc_id").asc()],
    )
    got = {r["doc_id"] for r in out.collect()}
    # en: 50 + 40 fits, +30 would overflow → {1, 2}; doc 4 (worse quality)
    # can't "fill the gap" — greedy prefix, not bin packing.
    # fr: the best doc alone (500) overflows → nothing from fr.
    assert got == {1, 2}


def test_token_budget_unstratified(spark):
    d = spark.createDataFrame(
        [(i, 10) for i in range(10)], "doc_id bigint, n_tokens bigint"
    )
    out = sampling.token_budget_sample(
        d, "n_tokens", budget=35, order_by=[F.col("doc_id").asc()]
    )
    assert {r["doc_id"] for r in out.collect()} == {0, 1, 2}


def test_mix_corpora_proportions(spark):
    d = _docs(spark, 3000)  # 1000 per src0/src1/src2
    out = sampling.mix_corpora(
        d, "source", {"src0": 2.0, "src1": 1.0, "src2": 1.0}, "doc_id"
    )
    by_src = {r["source"]: r["n"] for r in
              out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    # t = min(1000/0.5, 1000/0.25, 1000/0.25) = 2000 →
    # rates: src0 = 1.0 (keep all), src1 = src2 = 0.5 (~500 each)
    assert by_src["src0"] == 1000
    assert 400 <= by_src["src1"] <= 600
    assert 400 <= by_src["src2"] <= 600
    assert len(by_src) == 3


def test_mix_corpora_missing_source_raises(spark):
    with pytest.raises(ValueError, match="absent"):
        sampling.mix_corpora(
            _docs(spark, 30), "source", {"src0": 1.0, "nope": 1.0}, "doc_id"
        )


# ---------------------------------------------------------------------------
# token_budget_sample is a distributed prefix-sum (range partition +
# slab offsets + boundary-only window); it must agree exactly with the
# naive single-window formulation on any input, at any partition count.
# ---------------------------------------------------------------------------

def _naive_budget(rows, budget, stratified):
    # rows: (doc_id, lang, n_tokens, quality); order: quality desc, id asc
    from collections import defaultdict
    run = defaultdict(int)
    keep = set()
    for did, lang, tok, q in sorted(rows, key=lambda r: (-r[3], r[0])):
        s = lang if stratified else None
        run[s] += tok
        if run[s] <= budget:
            keep.add(did)
    return keep


@pytest.mark.parametrize("partitions", [1, 3, 7])
@pytest.mark.parametrize("stratified", [True, False])
def test_token_budget_matches_naive(spark, partitions, stratified):
    import random
    rng = random.Random(42)
    rows = [
        (i, f"lang{rng.randrange(4)}", rng.randrange(0, 60),
         round(rng.random(), 6))
        for i in range(300)
    ]
    d = spark.createDataFrame(
        rows, "doc_id bigint, lang string, n_tokens bigint, quality double"
    )
    out = sampling.token_budget_sample(
        d, "n_tokens", budget=500,
        stratum_col="lang" if stratified else None,
        order_by=[F.col("quality").desc(), F.col("doc_id").asc()],
        partitions=partitions,
    )
    got = {r["doc_id"] for r in out.collect()}
    assert got == _naive_budget(rows, 500, stratified)


def test_token_budget_null_stratum_rows_survive(spark):
    d = spark.createDataFrame(
        [(1, None, 10), (2, None, 10), (3, "en", 10)],
        "doc_id bigint, lang string, n_tokens bigint",
    )
    out = sampling.token_budget_sample(
        d, "n_tokens", budget=15, stratum_col="lang",
        order_by=[F.col("doc_id").asc()],
    )
    # null is a stratum like any other (eqNullSafe join): doc 1 fits its
    # budget, doc 2 overflows it, doc 3 fits en's
    assert {r["doc_id"] for r in out.collect()} == {1, 3}


# ------------------------------------------------------------- packing


def test_pack_sequences_invariants(spark):
    d = _docs(spark, 500)
    out = sampling.pack_sequences(
        d, "n_tokens", bin_capacity=256, key_col="doc_id", num_shards=4,
        order_by=[F.col("doc_id").asc()],
    ).collect()
    assert len(out) == 500                      # every doc assigned once
    assert {r["shard_id"] for r in out} <= set(range(4))
    for r in out:
        assert 0 <= r["bin_offset"] < 256       # start lies inside its bin
        assert r["bin_id"] >= 0
    # reconstruct each shard's stream: in doc_id order, bin boundaries
    # advance exactly with the running token total
    by_shard: dict = {}
    for r in sorted(out, key=lambda r: (r["shard_id"], r["doc_id"])):
        run = by_shard.get(r["shard_id"], 0)
        assert r["bin_id"] == run // 256
        assert r["bin_offset"] == run % 256
        by_shard[r["shard_id"]] = run + r["n_tokens"]


def test_pack_sequences_deterministic_and_dense(spark):
    d = _docs(spark, 300)
    a = sampling.pack_sequences(d, "n_tokens", 512, "doc_id", num_shards=2)
    b = sampling.pack_sequences(d, "n_tokens", 512, "doc_id", num_shards=2)
    rows_a = sorted(map(tuple, a.collect()))
    assert rows_a == sorted(map(tuple, b.collect()))
    # bins are dense per shard: 0..max with no gaps (stream slicing)
    import collections
    bins = collections.defaultdict(set)
    for r in a.collect():
        bins[r["shard_id"]].add(r["bin_id"])
    for s, ids in bins.items():
        assert min(ids) == 0
        # a bin with no doc START can exist only if one doc spans it
        # entirely; with 256-max docs and 512 bins that can't happen here
        assert ids == set(range(max(ids) + 1))


# -------------------------------------------------------- temperature


def test_temperature_mix_alpha_bounds(spark):
    d = _docs(spark, 2000)
    # alpha=1: keep everything (rates all 1.0)
    full = sampling.temperature_mix(d, "lang", "doc_id", alpha=1.0)
    assert full.count() == 2000
    # alpha=0.5: smallest stratum kept whole, larger ones downsampled
    # (_docs gives each lang exactly 500 rows -> all rates 1.0)
    eq = sampling.temperature_mix(d, "lang", "doc_id", alpha=0.5)
    assert eq.count() == 2000


def test_temperature_mix_flattens_shares(spark):
    rows = [(i, "big" if i < 9000 else "small") for i in range(10000)]
    d = spark.createDataFrame(rows, "doc_id bigint, lang string")
    out = sampling.temperature_mix(d, "lang", "doc_id", alpha=0.5)
    by = {r["lang"]: r["n"] for r in
          out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert by["small"] == 1000                  # n_min kept whole
    # big keeps sqrt(1000/9000) = 1/3 -> ~3000
    assert 2500 <= by["big"] <= 3500
    # alpha=0 equalizes expected counts: big keeps ~1000
    out0 = sampling.temperature_mix(d, "lang", "doc_id", alpha=0.0)
    by0 = {r["lang"]: r["n"] for r in
           out0.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert by0["small"] == 1000
    assert 800 <= by0["big"] <= 1200


def test_temperature_mix_deterministic_subset(spark):
    d = _docs(spark, 1000)
    a = sampling.temperature_mix(d, "source", "doc_id", alpha=0.3)
    ids = {r["doc_id"] for r in a.collect()}
    assert ids == {r["doc_id"] for r in
                   sampling.temperature_mix(d, "source", "doc_id", alpha=0.3).collect()}
    # output is a subset of the input rows
    assert ids <= {r["doc_id"] for r in d.collect()}


def _naive_topn_by_hash(spark, d, stratum, key, n):
    from pyspark.sql import Window
    w = Window.partitionBy(stratum).orderBy(
        sampling.hash_fraction(key).asc(), F.col(key).asc())
    return (d.withColumn("sample_rank", F.row_number().over(w))
            .filter(F.col("sample_rank") <= n))


def test_stratum_fixed_sample_exact_topn(spark):
    d = _docs(spark)
    out = sampling.stratum_fixed_sample(d, "lang", "doc_id", n=30)
    got = {(r["lang"], r["doc_id"], r["sample_rank"]) for r in out.collect()}
    want = {(r["lang"], r["doc_id"], r["sample_rank"])
            for r in _naive_topn_by_hash(spark, d, "lang", "doc_id", 30).collect()}
    assert got == want
    by = {r["lang"]: r["n"] for r in
          out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert all(v == 30 for v in by.values())


def test_stratum_fixed_sample_deficit_path_is_exact(spark):
    # oversample 0.05 under-selects every stratum; the deficit check must
    # widen to 1.0 and still return exactly the top-n-by-hash
    d = _docs(spark, 400)
    out = sampling.stratum_fixed_sample(d, "lang", "doc_id", n=50, oversample=0.05)
    want = {(r["lang"], r["doc_id"]) for r in
            _naive_topn_by_hash(spark, d, "lang", "doc_id", 50).collect()}
    assert {(r["lang"], r["doc_id"]) for r in out.collect()} == want


def test_stratum_fixed_sample_small_stratum_kept_whole(spark):
    rows = [(i, "big") for i in range(500)] + [(1000 + i, "tiny") for i in range(7)]
    d = spark.createDataFrame(rows, "doc_id bigint, lang string")
    out = sampling.stratum_fixed_sample(d, "lang", "doc_id", n=20)
    by = {r["lang"]: r["n"] for r in
          out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert by == {"big": 20, "tiny": 7}


def test_global_row_number_matches_window(spark):
    from glue_hudi_spark.operators import sampling

    df = spark.range(500).selectExpr(
        "id", "pmod(hash(id), 97) AS v").repartition(7)
    ranked, total = sampling.global_row_number(
        df, [F.col("v").desc(), F.col("id").asc()], rn_col="rn")
    assert total == 500
    rows = {r["id"]: r["rn"] for r in ranked.collect()}
    from pyspark.sql import Window
    w = Window.orderBy(F.col("v").desc(), F.col("id").asc())
    want = {r["id"]: r["rn"] for r in
            df.withColumn("rn", F.row_number().over(w)).collect()}
    assert rows == want
    # the plan has NO global (partitionless) window — that's the point
    plan = ranked._jdf.queryExecution().executedPlan().toString()
    assert "_gpid" not in ranked.columns


def test_ntile_of_matches_sql_ntile(spark):
    from glue_hudi_spark.operators import sampling

    for total, n in [(503, 10), (500, 10), (7, 10), (10, 10), (1, 10)]:
        df = spark.range(1, total + 1).select(
            F.col("id").alias("rn"))
        got = {r["rn"]: r["b"] for r in df.select(
            "rn", sampling.ntile_of(F.col("rn"), total, n).alias("b")
        ).collect()}
        from pyspark.sql import Window
        want = {r["rn"]: r["b"] for r in df.select(
            "rn", F.ntile(n).over(Window.orderBy("rn")).alias("b")
        ).collect()}
        assert got == want, (total, n)
