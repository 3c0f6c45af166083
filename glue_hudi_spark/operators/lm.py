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
    # the count table feeds the totals aggregate AND the final model
    # projection, and the model itself is referenced per score join +
    # per OOV-floor aggregate by every consumer — left unshared, each
    # reference re-tokenizes the corpus (corpus_dsir_weights planned 10
    # documents scans). Lazy checkpoints: ONE corpus token pass per
    # train, vocabulary-sized stores, construction stays lazy.
    counts = toks.groupBy("tok").agg(
        F.count(F.lit(1)).alias("cnt")).localCheckpoint(eager=False)
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
        .localCheckpoint(eager=False)
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
    # same sharing discipline as unigram_train: one corpus pair pass,
    # bigram-vocabulary-sized stores
    c12 = pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("c12")).localCheckpoint(eager=False)
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    return c12.join(c1, on="w1").localCheckpoint(eager=False)


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


# ----------------------------------------------------------------- BPE

# Symbol-sequence encoding for distributed BPE: each symbol is wrapped
# in \x1f and symbols are joined with one space — so the merge rule
# (a, b) is ONE literal string replace of "\x1fa\x1f \x1fb\x1f" with
# "\x1fab\x1f". Adjacent matches share NO characters (each match
# consumes exactly its own two wrapped tokens), which makes a plain
# global replace EXACTLY the left-to-right greedy merge BPE specifies —
# including self-pairs ("a a a" merges once) — and lets a SQL oracle
# replay training with the identical replace() call. (A space-delimited
# encoding would make adjacent matches share their separator and global
# replace would skip every second occurrence.)
_BPE_SEP = "\x1f"


def _bpe_wrap(tok_col):
    """word → initial wrapped symbol string: characters + </w>."""
    chars = F.split(F.col(tok_col), "")
    syms = F.concat(chars, F.array(F.lit("</w>")))
    return F.concat(
        F.lit(_BPE_SEP),
        F.array_join(syms, f"{_BPE_SEP} {_BPE_SEP}"),
        F.lit(_BPE_SEP),
    )


def bpe_train(docs: DataFrame, text_col: str = "text",
              rounds: int = 4, min_count: int = 2) -> list[dict]:
    """Learn ``rounds`` BPE merge rules from a corpus, distributed.

    The classic algorithm, Spark-first: token frequencies are ONE
    corpus pass (groupBy); every training round then runs over the
    VOCABULARY table (distinct words × weights — thousands of rows
    however many terabytes the corpus is), never the corpus again:

    1. explode each word's adjacent symbol pairs, weighted by word
       count (map-side combinable sum);
    2. argmax pair (ties → lexicographic smallest (left, right), pairs
       below ``min_count`` excluded) — ONE driver-sized row collected;
    3. apply the merge to every word with one literal string replace
       of the wrapped encoding (see ``_BPE_SEP``) — greedy-exact.

    Deterministic end to end, so a SQL oracle replays the full training
    loop as unrolled CTEs with scalar-subquery replaces. Returns
    [{round, left, right, pair_count}, ...]; merges stop early when no
    pair clears ``min_count``.
    """
    vocab = (
        docs.select(F.explode(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok").agg(F.count(F.lit(1)).alias("w"))
        .select(_bpe_wrap("tok").alias("seq"), "w")
    )
    from glue_hudi_spark.checkpoints import release_checkpoint

    merges: list[dict] = []
    prev_ckpt = None
    for rnd in range(1, rounds + 1):
        vocab = vocab.localCheckpoint(eager=True)  # truncate replace chain
        # the eager checkpoint above just consumed the previous round's
        # (via the replace projection) — drop the dead table now instead
        # of leaking one per round until the ContextCleaner's periodic GC
        if prev_ckpt is not None:
            release_checkpoint(prev_ckpt)
        prev_ckpt = vocab
        syms = F.transform(
            F.split(F.col("seq"), " "),
            lambda s: F.regexp_replace(s, _BPE_SEP, ""),
        )
        pairs = (
            vocab.select(F.col("w"), syms.alias("ss"))
            .select(
                "w",
                F.explode(F.when(
                    F.size("ss") >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size("ss") - 1),
                        lambda i: F.struct(
                            F.element_at("ss", i).alias("l"),
                            F.element_at("ss", i + 1).alias("r")),
                    )).otherwise(F.array())).alias("p"),
            )
            .groupBy("p.l", "p.r").agg(F.sum("w").alias("cnt"))
            .filter(F.col("cnt") >= min_count)
        )
        best = (pairs.orderBy(F.col("cnt").desc(), F.col("l").asc(),
                              F.col("r").asc())
                .limit(1).collect())
        if not best:
            break
        b = best[0]
        merges.append({"round": rnd, "left": b["l"], "right": b["r"],
                       "pair_count": int(b["cnt"])})
        tgt = f"{_BPE_SEP}{b['l']}{_BPE_SEP} {_BPE_SEP}{b['r']}{_BPE_SEP}"
        rep = f"{_BPE_SEP}{b['l']}{b['r']}{_BPE_SEP}"
        vocab = vocab.select(
            F.replace(F.col("seq"), F.lit(tgt), F.lit(rep)).alias("seq"),
            "w")
    # only the merges list leaves this function — the last vocab
    # checkpoint is dead too
    if prev_ckpt is not None:
        release_checkpoint(prev_ckpt)
    return merges


def bpe_segment(df: DataFrame, merges: list[dict], text_col: str = "text",
                out_col: str = "bpe_tokens",
                chunk_size: int = 64) -> DataFrame:
    """Apply learned merges to a corpus: per token, the same wrapped
    encoding + the merge replaces in training order, then unwrap to the
    final subword array. Pure string expressions — zero shuffles, zero
    UDFs.

    Merge application is CHUNKED: each pass applies ≤ ``chunk_size``
    replaces, and passes are separated by a lazy ``localCheckpoint`` so
    Catalyst's project-collapsing can't fuse them back into one
    expression tree — without the break, a 10k-merge production
    vocabulary unrolls into a 10k-deep nested ``replace`` chain and
    blows whole-stage codegen (the same expression-size failure family
    BASELINE.md documents for unrolled centroids). ≤ ``chunk_size``
    merges stay a single pass with no checkpoint — identical plan to
    the unchunked original. The checkpoint materializes the
    (doc columns + wrapped-seq array) projection per pass; passes are
    O(corpus) each, so total cost is ceil(#merges/chunk_size) linear
    scans — exactly how training (``bpe_train``) already bounds its
    per-round replace chain."""
    if chunk_size < 1:
        raise ValueError("chunk_size must be >= 1")
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")

    def wrap(tok):
        chars = F.split(tok, "")
        syms = F.concat(chars, F.array(F.lit("</w>")))
        return F.concat(F.lit(_BPE_SEP),
                        F.array_join(syms, f"{_BPE_SEP} {_BPE_SEP}"),
                        F.lit(_BPE_SEP))

    def apply_chunk(seq, chunk):
        for m in chunk:
            tgt = (f"{_BPE_SEP}{m['left']}{_BPE_SEP} "
                   f"{_BPE_SEP}{m['right']}{_BPE_SEP}")
            rep = f"{_BPE_SEP}{m['left']}{m['right']}{_BPE_SEP}"
            seq = F.replace(seq, F.lit(tgt), F.lit(rep))
        return seq

    seq_col = f"_{out_col}_seq"
    out = df.withColumn(seq_col, F.transform(toks, wrap))
    chunks = [merges[i:i + chunk_size]
              for i in range(0, len(merges), chunk_size)]
    for i, chunk in enumerate(chunks):
        if i > 0:
            # lazy lineage break between passes: bounds the per-stage
            # expression depth at chunk_size replaces
            out = out.localCheckpoint(eager=False)
        # NB: bind the chunk via a closure factory, not a lambda default
        # arg — F.transform dispatches on lambda ARITY, so a second
        # parameter would receive the element-index column
        def pass_fn(c):
            return lambda s: apply_chunk(s, c)

        out = out.withColumn(
            seq_col, F.transform(F.col(seq_col), pass_fn(chunk)))
    return out.withColumn(
        out_col,
        F.flatten(F.transform(
            F.col(seq_col),
            lambda seq: F.transform(
                F.split(seq, " "),
                lambda s: F.regexp_replace(s, _BPE_SEP, ""))))
    ).drop(seq_col)
