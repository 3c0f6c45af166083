"""Unigram language-model scoring — the perplexity-proxy quality signal.

Production curation pipelines (CCNet, RefinedWeb, Dolma) score documents
with a language model and drop the tail; the cheap, fully-distributed
version is a UNIGRAM model learned from the corpus itself: a document
whose tokens are collectively improbable under the corpus distribution
is boilerplate, lorem-ipsum, encoding noise, or another language — the
same screen KenLM provides, minus the external model artifact.

Spark shape (scales to 100 TB):

* ``unigram_train`` — one token-count aggregate over the exploded corpus
  (map-side partial combine; the result is VOCABULARY-sized, not
  corpus-sized). Add-one smoothing so unseen tokens score finitely.
* ``unigram_score`` — posexplode → hash-join tokens to the model on the
  token key → per-doc mean log-prob re-aggregate. The model join is a
  plain equi-join: at web scale the vocabulary (10^7-10^8 rows) exceeds
  broadcast limits, and Spark's AQE will broadcast it automatically
  whenever it IS small — declare, don't hand-schedule. OOV tokens take
  the smoothed floor log(1/(N+V)) via coalesce, no second pass.

Determinism across engines: log() is libm and the per-doc sum order is
engine-dependent, so consumers that hash-compare results must round
(this repo's 6-dp convention) — drift is ~1e-13 on values O(-10).

No reference counterpart (the reference stops at CDC merge); this is
part of the training-data extension surface, reference-cited only at
the suite level (SURVEY.md §2-ext).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def unigram_train(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Learn the smoothed unigram distribution of a corpus.

    Returns a vocabulary-sized model: (tok, cnt, logp) where
    ``logp = ln((cnt + 1) / (N + V))`` with N = total tokens and
    V = vocabulary size — add-one (Laplace) smoothing, so the same
    ``1/(N+V)`` floor prices out-of-vocabulary tokens at score time.
    """
    toks = docs.select(
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok")
    )
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    totals = counts.agg(
        F.sum("cnt").alias("_n"), F.count(F.lit(1)).alias("_v"))
    return (
        counts.crossJoin(F.broadcast(totals))  # 1-row scalar append
        .select(
            "tok", "cnt",
            F.log((F.col("cnt") + 1).cast("double")
                  / (F.col("_n") + F.col("_v")).cast("double")).alias("logp"),
            F.log(F.lit(1.0) / (F.col("_n") + F.col("_v")).cast("double"))
            .alias("oov_logp"),
        )
    )


def save_model(model: DataFrame, path: str) -> None:
    """Persist a unigram model (train once, score many curation runs —
    the model is vocabulary-sized parquet, and re-training per run both
    wastes a corpus pass and silently shifts the score scale between
    runs)."""
    model.write.mode("overwrite").parquet(path)


def load_model(spark, path: str) -> DataFrame:
    """Load a model written by ``save_model``."""
    return spark.read.parquet(path)


def bigram_train(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Bigram counts + left-context totals: (w1, w2, c12, c1).

    Adjacent pairs come straight from the token array
    (``arrays_zip(t[:-1], t[1:])``) — no positional self-join, no
    shuffle before the count aggregate. Output is bigram-vocabulary-
    sized."""
    t = F.split(F.trim(F.col(text_col)), r"\s+")
    pairs = docs.select(
        F.explode(
            F.arrays_zip(
                F.slice(t, 1, F.greatest(F.size(t) - 1, F.lit(0))),
                F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0))),
            )
        ).alias("p")
    ).select(F.col("p.0").alias("w1"), F.col("p.1").alias("w2"))
    c12 = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    return c12.join(c1, on="w1")


def bigram_score(
    docs: DataFrame,
    bigrams: DataFrame,
    unigram_model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    backoff_pct: int = 40,
) -> DataFrame:
    """Per-document mean bigram log-prob with STUPID BACKOFF: seen
    bigrams score ln(c12/c1); unseen ones back off to
    ln(0.4 · p_unigram(w2)) — Brants et al.'s large-scale-LM recipe
    (no discounting state to train, exactly what a distributed scorer
    wants). Documents with fewer than 2 tokens have no bigrams and are
    absent from the output. Two equi-joins (bigram table, unigram
    model) — both vocabulary-sized; AQE broadcasts them when small."""
    t = F.split(F.trim(F.col(text_col)), r"\s+")
    pairs = docs.select(
        F.col(id_col),
        F.explode(
            F.arrays_zip(
                F.slice(t, 1, F.greatest(F.size(t) - 1, F.lit(0))),
                F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0))),
            )
        ).alias("p"),
    ).select(id_col, F.col("p.0").alias("w1"), F.col("p.1").alias("w2"))
    uni = unigram_model.select(
        F.col("tok").alias("w2"), F.col("logp").alias("uni_logp"))
    # the OOV floor must be a broadcast SCALAR: taking oov_logp off the
    # left-joined model row would be NULL exactly when the join misses —
    # i.e. precisely for the OOV tokens it exists to price
    floor = unigram_model.agg(F.min("oov_logp").alias("_floor"))
    backoff = F.log(F.lit(backoff_pct / 100.0))
    scored = (
        pairs.join(bigrams.select("w1", "w2", "c12", "c1"),
                   on=["w1", "w2"], how="left")
        .join(uni, on="w2", how="left")
        .crossJoin(F.broadcast(floor))
        .select(
            id_col,
            F.when(
                F.col("c12").isNotNull(),
                F.log(F.col("c12").cast("double") / F.col("c1").cast("double")),
            ).otherwise(
                backoff + F.coalesce(F.col("uni_logp"), F.col("_floor"))
            ).alias("lp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.avg("lp").alias("avg_logp"),
    )


def unigram_score(
    docs: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every document: mean token log-prob under ``model``.

    Returns (id_col, n_tokens, avg_logp). Lower = less corpus-like.
    One explode + one equi-join on the token + one per-doc aggregate;
    nothing wider than (doc_id, token) shuffles.
    """
    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    )
    # oov_logp is constant across the model; carry it through the join so
    # a missed token coalesces to the smoothing floor without a second
    # scalar lookup
    floor = model.agg(F.min("oov_logp").alias("_floor"))
    scored = (
        toks.join(model.select("tok", "logp"), on="tok", how="left")
        .crossJoin(F.broadcast(floor))
        .select(
            id_col,
            F.coalesce(F.col("logp"), F.col("_floor")).alias("lp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.avg("lp").alias("avg_logp"),
    )


def unigram_score_pair(
    docs: DataFrame,
    model_a: DataFrame,
    model_b: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every document under TWO unigram models in one token pass —
    the log-likelihood-ratio shape (DSIR importance weights, domain
    classifiers) needs both scores per doc, and scoring twice would
    explode and shuffle the corpus tokens twice. One explode, two
    vocabulary-sized left equi-joins, one per-doc aggregate.

    Returns (id_col, n_tokens, avg_logp_a, avg_logp_b).
    """
    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    )
    floor_a = model_a.agg(F.min("oov_logp").alias("_fa"))
    floor_b = model_b.agg(F.min("oov_logp").alias("_fb"))
    scored = (
        toks
        .join(model_a.select("tok", F.col("logp").alias("_la")),
              on="tok", how="left")
        .join(model_b.select("tok", F.col("logp").alias("_lb")),
              on="tok", how="left")
        .crossJoin(F.broadcast(floor_a))
        .crossJoin(F.broadcast(floor_b))
        .select(
            id_col,
            F.coalesce(F.col("_la"), F.col("_fa")).alias("_lpa"),
            F.coalesce(F.col("_lb"), F.col("_fb")).alias("_lpb"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.avg("_lpa").alias("avg_logp_a"),
        F.avg("_lpb").alias("avg_logp_b"),
    )
