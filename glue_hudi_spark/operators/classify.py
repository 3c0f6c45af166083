"""Distributed linear-classifier training with EXACT integer arithmetic.

Curation pipelines train small linear models over document features
(quality filters, language/domain classifiers — the fastText-classifier
role in CCNet/RefinedWeb). The distributed-and-auditable version here is
the BATCH PERCEPTRON over integer features:

    round k:  margin_i = y_i · (w_{k-1} · x_i)
              w_k = w_{k-1} + Σ_{margin_i ≤ 0} y_i · x_i

Why this exact form:

* Each round is ONE aggregate pass over the features (map-side combined
  sums of y·x over the misclassified set) — the driver holds only the
  weight vector, so the shape is K linear scans however many terabytes
  the corpus is. This is the same pass structure SGD-free large-batch
  training uses; swap the update rule without touching the dataflow.
* Integer features + integer updates ⇒ BIT-EXACT determinism across
  engines and summation orders (float gradient sums are
  order-dependent and unauditable) — a SQL oracle replays training as
  unrolled CTEs and hash-matches every round's weights.

Fixed round count, no early stop: a converged round contributes a zero
delta and identical weights — keeping the output schema and the oracle
replay trivially aligned.

No reference counterpart (the reference stops at CDC merge); part of
the training-data extension surface (SURVEY §2-ext).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def perceptron_train(
    feats: DataFrame,
    feature_cols: list[str],
    label_col: str = "y",
    rounds: int = 3,
) -> list[dict]:
    """Train a batch perceptron on integer features.

    ``feats``: one row per example with BIGINT ``feature_cols`` and a
    ±1 BIGINT ``label_col``. Returns one dict per round:
    ``{"round": k, "n_mis": misclassified-under-w_{k-1}, "<col>": w_k}``.

    The label+feature projection is persisted once as compressed
    columnar batches with disk spill (K passes must not recompute the
    feature pipeline, and a row-object localCheckpoint of the same data
    is several × larger — it GC-killed an 8 GB driver at 60M rows where
    this cache holds comfortably); each round is then a single filtered
    map-side-combined aggregate.
    """
    from pyspark import StorageLevel

    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    feats = feats.select(
        F.col(label_col).cast("long").alias(label_col),
        *[F.col(c).cast("long").alias(c) for c in feature_cols],
    ).persist(StorageLevel.MEMORY_AND_DISK)
    w = [0] * len(feature_cols)
    out: list[dict] = []
    for k in range(1, rounds + 1):
        dot = None
        for i, c in enumerate(feature_cols):
            term = F.col(c) * F.lit(w[i]).cast("long")
            dot = term if dot is None else dot + term
        mis = feats.filter(F.col(label_col) * dot <= 0)
        agg = mis.agg(
            F.count(F.lit(1)).alias("_n"),
            *[
                F.coalesce(F.sum(F.col(label_col) * F.col(c)), F.lit(0))
                .cast("long").alias(c)
                for c in feature_cols
            ],
        ).first()
        n_mis = int(agg["_n"])
        if n_mis:
            w = [w[i] + int(agg[c]) for i, c in enumerate(feature_cols)]
        out.append({"round": k, "n_mis": n_mis,
                    **{c: w[i] for i, c in enumerate(feature_cols)}})
    feats.unpersist()
    return out


#: the standard byte-level text featurization (bias, space count,
#: ' the '/' de ' marker counts, length band) — the CCNet-style
#: is-English screen's feature set, shared by the flagship training
#: query and the curation pipeline's classifier stage so one SQL
#: oracle replays both.
TEXT_FEATURE_COLS = ["f_bias", "f_spaces", "f_the", "f_de", "f_len"]


def text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the :data:`TEXT_FEATURE_COLS` integer features — pure
    column expressions (JVM-side, codegen'd), zero shuffles, exactly
    replayable in ANSI SQL (length/replace arithmetic only)."""
    t = text_col
    return df.withColumns({
        "f_bias": F.lit(1).cast("long"),
        "f_spaces": F.expr(
            f"CAST(length({t}) - length(replace({t}, ' ', '')) AS BIGINT)"),
        "f_the": F.expr(
            f"CAST((length({t}) - length(replace({t}, ' the ', ''))) "
            "div 5 AS BIGINT)"),
        "f_de": F.expr(
            f"CAST((length({t}) - length(replace({t}, ' de ', ''))) "
            "div 4 AS BIGINT)"),
        "f_len": F.expr(f"CAST(length({t}) div 100 AS BIGINT)"),
    })


def classify(feats: DataFrame, weights: dict, feature_cols: list[str],
             out_col: str = "pred") -> DataFrame:
    """Apply trained weights: ``pred = +1 if w·x > 0 else -1`` — pure
    column expressions, zero shuffles."""
    dot = None
    for c in feature_cols:
        term = F.col(c) * F.lit(int(weights[c])).cast("long")
        dot = term if dot is None else dot + term
    return feats.withColumn(
        out_col, F.when(dot > 0, F.lit(1)).otherwise(F.lit(-1)))
