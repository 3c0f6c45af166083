"""Inverted-index text retrieval: BM25 top-k over a document corpus.

The retrieval side of a training-data pipeline (dedup finds near-copies;
search finds RELEVANT documents — for decontamination audits, targeted
corpus inspection, eval-set curation). Scale shape:

* the posting list (term, doc_id, tf) is built by explode + groupBy —
  but the query terms filter BEFORE the aggregate, so the shuffle
  carries only the matched postings, not the whole corpus vocabulary;
* per-term document frequencies and the average document length are
  metadata-sized aggregates broadcast into the scoring join;
* scoring pivots each query term into its own column, so the final score
  is a FIXED-ORDER sum of per-term contributions — a grouped float SUM
  would be summation-order dependent and unhashable across engines;
* top-k = TakeOrderedAndProject (per-partition heaps), ties to doc_id.

Float discipline (the oracle replays every formula): constants are
literals on both sides (never computed in float arithmetic — k1+1 is
spelled 2.2, 1-b is 0.25; 0.75/0.25 are exact binary), division chains
are written in identical association order, idf's ln() is rounded to
6 dp at the only step that touches libm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from glue_hudi_spark.functions.text import tokens

K1 = 1.2
K1_PLUS_1 = 2.2   # literal, not K1 + 1.0 (float addition ≠ literal bits)
B = 0.75          # exact in binary
ONE_MINUS_B = 0.25


def doc_postings(
    docs: DataFrame, terms: list[str],
    id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """(doc_id, term, tf) for the query terms only — the term filter sits
    directly on the exploded tokens, so only matching postings reach the
    groupBy."""
    return (
        docs.select(F.col(id_col).alias("doc_id"),
                    F.explode(tokens(text_col)).alias("term"))
        .filter(F.col("term").isin(*terms))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def bm25_topk(
    docs: DataFrame, terms: list[str], k: int = 10,
    id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """Top-k documents by BM25 for an AND-less bag-of-terms query.

    idf_t = round(ln((N - df_t + 0.5) / (df_t + 0.5) + 1), 6)
    score  = Σ_t idf_t · (tf·2.2 / (tf + 1.2·(0.25 + 0.75·dl/avgdl)))

    Returns (doc_id, score) with score rounded to 6 dp, ordered
    score DESC, doc_id ASC, limit k.
    """
    if not terms:
        raise ValueError("bm25_topk: empty query")
    if len(set(terms)) != len(terms):
        raise ValueError("bm25_topk: duplicate query terms")

    base = docs.select(F.col(id_col).alias("doc_id"),
                       F.col(text_col).alias("text"))
    # lens feeds the corpus stats AND the per-posting normalization, and
    # postings feed the document frequencies AND the contributions — left
    # as plain subtrees each reference re-tokenizes the corpus from
    # parquet (5 scans of `documents` per query, measured in the plan).
    # LAZY localCheckpoints keep construction lazy (first action
    # materializes, later references read the stored blocks): 2 scans,
    # one tokenization each.
    lens = base.select(
        "doc_id", F.size(tokens("text")).cast("bigint").alias("dl")
    ).localCheckpoint(eager=False)
    stats = lens.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
    ).select(
        "n_docs",
        (F.col("sum_dl").cast("double") / F.col("n_docs")).alias("avgdl"),
    )

    post = doc_postings(docs, terms, id_col, text_col).localCheckpoint(
        eager=False)
    dfreq = post.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df_t"))
    idf = dfreq.crossJoin(F.broadcast(stats)).select(
        "term",
        F.round(
            F.log(
                (F.col("n_docs") - F.col("df_t") + F.lit(0.5))
                / (F.col("df_t") + F.lit(0.5))
                + F.lit(1.0)
            ),
            6,
        ).alias("idf"),
    )

    contrib = (
        post.join(F.broadcast(idf), on="term")
        .join(lens, on="doc_id")
        .crossJoin(F.broadcast(stats.select("avgdl")))
        .select(
            "doc_id", "term",
            (
                F.col("idf")
                * (
                    F.col("tf") * F.lit(K1_PLUS_1)
                    / (
                        F.col("tf")
                        + F.lit(K1)
                        * (F.lit(ONE_MINUS_B)
                           + (F.lit(B) * F.col("dl")) / F.col("avgdl"))
                    )
                )
            ).alias("c"),
        )
    )
    # fixed-order sum: one pivoted column per term, added left-to-right in
    # the caller-given term order — never a grouped float SUM
    pivoted = contrib.groupBy("doc_id").pivot("term", terms).agg(F.first("c"))
    total = F.coalesce(F.col(f"`{terms[0]}`"), F.lit(0.0))
    for t in terms[1:]:
        total = total + F.coalesce(F.col(f"`{t}`"), F.lit(0.0))
    return (
        pivoted.select("doc_id", F.round(total, 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )
