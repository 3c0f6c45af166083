"""Benchmark decontamination: flag training documents that share n-grams
with an evaluation/benchmark set.

The standard pre-training hygiene pass (GPT-3 §C / PaLM-style): build the
set of word n-grams occurring in any benchmark document, then score every
training document by the fraction of ITS n-grams that also occur in the
benchmark set, and flag documents above a threshold for removal.

Scale shape (the part that must survive 100 TB):

* n-grams are md5-HASHED before they leave the row — the join key is a
  fixed-width string, never the gram text, so shuffle bytes are bounded
  by gram COUNT, not document length.
* the benchmark side collapses to ``DISTINCT gram_hash`` — benchmark
  suites are thousands of documents, so this side is broadcast-sized in
  practice; the plan is left to AQE, which broadcasts it when small.
* the training side is one explode (linear in corpus tokens) + two
  hash-aggregates + one equi-join on the hash. No all-pairs stage exists
  anywhere.

The gram arrays are built with ``transform`` over an index sequence on a
PRE-PROJECTED token-array column (Catalyst does no CSE across lambda
arguments — referencing the raw ``split(...)`` expression inside the
lambda would re-run the regex split per gram, O(tokens²·len) per doc; a
column reference is O(1) per element).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def doc_ngram_hashes(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """(id, gram) rows: the DISTINCT md5-hashed word n-grams per document.

    Documents shorter than ``n`` tokens yield no rows (they have no
    n-grams — callers wanting them in downstream stats must left-join).
    """
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    base = df.select(F.col(id_col).alias("id"), toks.alias("_toks"))
    m = F.size(F.col("_toks")) - F.lit(n - 1)
    grams = F.when(
        m > 0,
        F.transform(
            F.sequence(F.lit(1), m),
            lambda i: F.md5(F.array_join(F.slice(F.col("_toks"), i, n), " ")),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return base.select(
        "id", F.explode(F.array_distinct(grams)).alias("gram")
    )


def ngram_overlap(
    train: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    flag_threshold: float = 0.5,
) -> DataFrame:
    """Per-training-document benchmark-overlap report.

    Returns (id_col, n_grams, n_hit, overlap_ratio, contaminated):
    distinct n-grams in the doc, how many also occur anywhere in
    ``benchmark``, their ratio (rounded to 6), and the flag
    ``overlap_ratio >= flag_threshold``.

    Training documents with fewer than ``n`` tokens have no n-grams and
    are absent from the report (nothing to decontaminate on).
    """
    tg = doc_ngram_hashes(train, id_col, text_col, n)
    bg = doc_ngram_hashes(benchmark, id_col, text_col, n).select("gram").distinct()
    tot = tg.groupBy("id").agg(F.count(F.lit(1)).alias("n_grams"))
    hit = tg.join(bg, "gram").groupBy("id").agg(F.count(F.lit(1)).alias("n_hit"))
    ratio = F.col("n_hit").cast("double") / F.col("n_grams").cast("double")
    return (
        tot.join(hit, "id", "left")
        .withColumn("n_hit", F.coalesce(F.col("n_hit"), F.lit(0)).cast("bigint"))
        .select(
            F.col("id").alias(id_col),
            "n_grams",
            "n_hit",
            F.round(ratio, 6).alias("overlap_ratio"),
            (ratio >= F.lit(flag_threshold)).alias("contaminated"),
        )
    )
