"""Config-driven corpus-curation pipeline.

The reference's whole control plane is "behavior lives in a control
table, the job is generic" (loadControlData.py:1-14 seeds the DynamoDB
control table; processData.py:42-51 reads it and processData.py:395-402
drives the per-table loop off pure config). This module extends that idea to the LLM-data
extensions: a curation pipeline is DATA — an ordered list of stage
configs — not code, so the same generic runner serves every corpus and
a stage swap is a config edit, not a deploy.

    {
      "id_col": "doc_id", "text_col": "text",
      "stages": [
        {"op": "quality_filter", "min_quality": 0.6},
        {"op": "lm_filter", "min_avg_logp": -9.5},
        {"op": "exact_dedup"},
        {"op": "minhash_dedup", "num_hashes": 16, "bands": 8,
         "verify_threshold": 0.5},
        {"op": "token_budget", "budget": 3000, "stratum_col": "lang"}
      ]
    }

Every stage maps to an operator this repo gates individually (the
composed flagship ``corpus_curation`` is exactly the config above minus
``lm_filter``), so the pipeline inherits each operator's scale shape;
the runner adds NO shuffles of its own — it only chains DataFrames.
``run_to_table`` lands the survivors in a ``NativeTable`` with the
stage-by-stage row counts recorded in the commit stats, the same
audit-trail convention as ``write_audit_publish``.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame, functions as F

from glue_hudi_spark.functions import text as TX
from glue_hudi_spark.operators import dedup, lm, sampling


class CurationConfigError(ValueError):
    """Malformed pipeline config — raised at BUILD time, not mid-run."""


def _stage_quality_filter(df: DataFrame, cfg: dict, ctx: dict) -> DataFrame:
    min_q = cfg.get("min_quality", 0.5)
    if "quality" not in df.columns:
        df = df.withColumn("quality", TX.quality_score(ctx["text_col"]))
    return df.filter(F.col("quality") >= F.lit(min_q))


def _stage_lm_filter(df: DataFrame, cfg: dict, ctx: dict) -> DataFrame:
    """Perplexity-proxy screen: drop docs whose mean unigram log-prob
    falls below the floor. With ``model_path`` the stage scores against
    a PRE-TRAINED model (train once with ``lm.save_model``, reuse across
    runs — stable score scale, no per-run corpus pass); otherwise the
    model trains on the stage's input (post earlier filters) —
    vocabulary-sized, never collected."""
    floor = cfg.get("min_avg_logp")
    if floor is None:
        raise CurationConfigError("lm_filter requires min_avg_logp")
    if cfg.get("model_path"):
        model = lm.load_model(df.sparkSession, cfg["model_path"])
    else:
        model = lm.unigram_train(df, ctx["text_col"])
    scored = lm.unigram_score(df, model, ctx["id_col"], ctx["text_col"])
    ok = scored.filter(F.col("avg_logp") >= F.lit(float(floor))).select(
        ctx["id_col"])
    return df.join(ok, on=ctx["id_col"], how="left_semi")


def _stage_exact_dedup(df: DataFrame, cfg: dict, ctx: dict) -> DataFrame:
    winners = dedup.exact_dedup(df, ctx["id_col"], ctx["text_col"]).select(
        F.col("keep_id").alias(ctx["id_col"]))
    return df.join(winners, on=ctx["id_col"], how="left_semi")


def _stage_minhash_dedup(df: DataFrame, cfg: dict, ctx: dict) -> DataFrame:
    pairs = dedup.minhash_lsh_pairs(
        df, id_col=ctx["id_col"], text_col=ctx["text_col"],
        n=cfg.get("n", 3), num_hashes=cfg.get("num_hashes", 16),
        bands=cfg.get("bands", 8),
        verify_threshold=cfg.get("verify_threshold", 0.5),
    )
    clusters = dedup.resolve_clusters(pairs)
    return dedup.drop_near_duplicates(df, clusters, id_col=ctx["id_col"])


def _stage_token_budget(df: DataFrame, cfg: dict, ctx: dict) -> DataFrame:
    budget = cfg.get("budget")
    if budget is None:
        raise CurationConfigError("token_budget requires budget")
    token_col = cfg.get("token_col", "n_tokens")
    if token_col not in df.columns:
        df = df.withColumn(
            token_col, TX.token_count(ctx["text_col"]).cast("bigint"))
    order = [F.col(c) for c in cfg.get("order_by", [])]
    if not order:
        order = ([F.col("quality").desc()] if "quality" in df.columns else []
                 ) + [F.col(ctx["id_col"]).asc()]
    return sampling.token_budget_sample(
        df, token_col, budget=int(budget),
        stratum_col=cfg.get("stratum_col"), order_by=order,
    )


def _stage_sample(df: DataFrame, cfg: dict, ctx: dict) -> DataFrame:
    rates = cfg.get("rates")
    if not isinstance(rates, dict) or "stratum_col" not in cfg:
        raise CurationConfigError("sample requires stratum_col + rates")
    return sampling.stratified_sample(
        df, stratum_col=cfg["stratum_col"], rates=rates,
        key_col=ctx["id_col"], default_rate=cfg.get("default_rate", 0.0))


def _stage_classifier_filter(df: DataFrame, cfg: dict, ctx: dict) -> DataFrame:
    """CCNet/fastText-style learned quality screen: train a linear
    classifier on the LABELED subset, apply it to every document, keep
    the positive side. Two modes:

    * ``weights`` ({feature_col: int}) — apply a pre-trained model
      (train once offline, reuse across runs; no training pass).
    * ``label_col`` — rows where that column is non-NULL (±1) are the
      labeled sample; ``perceptron_train`` runs ``rounds`` map-side-
      combined aggregate passes over just that slice, then the learned
      weights filter the full input. Driver state = the weight vector.

    ``feature_cols`` names existing integer columns; when omitted the
    standard byte-level text featurization (``classify.text_features``)
    is computed on the fly — pure column expressions, no shuffle. The
    filter itself is a codegen'd dot-product predicate, so predicate
    pushdown/pruning around it survive."""
    from glue_hudi_spark.operators import classify as _cls

    keep = int(cfg.get("keep", 1))
    cols = cfg.get("feature_cols")
    featurize = cols is None
    if featurize:
        cols = _cls.TEXT_FEATURE_COLS
    feats = (_cls.text_features(df, ctx["text_col"]) if featurize else df)
    weights = cfg.get("weights")
    if weights is None:
        lab = cfg["label_col"]
        train = feats.filter(F.col(lab).isNotNull()).withColumn(
            lab, F.col(lab).cast("long"))
        rows = _cls.perceptron_train(
            train, cols, label_col=lab, rounds=int(cfg.get("rounds", 3)))
        weights = {c: rows[-1][c] for c in cols}
    out = _cls.classify(feats, weights, cols).filter(
        F.col("pred") == F.lit(keep)).drop("pred")
    return out.drop(*_cls.TEXT_FEATURE_COLS) if featurize else out


_STAGES = {
    "quality_filter": _stage_quality_filter,
    "lm_filter": _stage_lm_filter,
    "exact_dedup": _stage_exact_dedup,
    "minhash_dedup": _stage_minhash_dedup,
    "token_budget": _stage_token_budget,
    "sample": _stage_sample,
    "classifier_filter": _stage_classifier_filter,
}

# required per-stage keys, checked at BUILD time — a missing budget must
# fail when the pipeline is declared, not three stages into a 100-TB run
_REQUIRED = {
    "lm_filter": ["min_avg_logp"],
    "token_budget": ["budget"],
    "sample": ["stratum_col", "rates"],
}


class CurationPipeline:
    """Generic stage runner over a config dict / JSON file."""

    def __init__(self, config: dict | str | Path):
        if not isinstance(config, dict):
            config = json.loads(Path(config).read_text())
        self.id_col = config.get("id_col", "doc_id")
        self.text_col = config.get("text_col", "text")
        stages = config.get("stages")
        if not stages:
            raise CurationConfigError("pipeline has no stages")
        for i, s in enumerate(stages):
            if not isinstance(s, dict) or "op" not in s:
                raise CurationConfigError(f"stage {i} missing 'op'")
            if s["op"] not in _STAGES:
                raise CurationConfigError(
                    f"stage {i}: unknown op {s['op']!r} "
                    f"(choose from {sorted(_STAGES)})")
            for key in _REQUIRED.get(s["op"], []):
                if key not in s:
                    raise CurationConfigError(
                        f"stage {i} ({s['op']}): missing required {key!r}")
            if (s["op"] == "classifier_filter"
                    and "weights" not in s and "label_col" not in s):
                raise CurationConfigError(
                    f"stage {i} (classifier_filter): needs either "
                    "pre-trained 'weights' or a 'label_col' to train on")
        self.stages = stages

    def run(self, docs: DataFrame, counts: list | None = None) -> DataFrame:
        """Chain the stages; ``counts`` (optional list) receives
        (stage_label, surviving_rows) pairs — each count is one action,
        so pass it only when the audit trail is worth the extra jobs."""
        ctx = {"id_col": self.id_col, "text_col": self.text_col}
        df = docs
        if counts is not None:
            counts.append(("input", df.count()))
        for i, s in enumerate(self.stages):
            df = _STAGES[s["op"]](df, s, ctx)
            if counts is not None:
                counts.append((f"{i}:{s['op']}", df.count()))
        return df

    def run_to_table(self, docs: DataFrame, table) -> "object":
        """Run with the audit trail on and land survivors in ``table``
        (a ``NativeTable``); per-stage counts travel in the commit stats
        — the write_audit_publish convention."""
        counts: list = []
        out = self.run(docs, counts=counts)
        return table.bulk_insert(
            out, extra_stats={"curation_stages": dict(counts)})

    def run_incremental(self, new_docs: DataFrame, table,
                        bloom_max_buckets: int = 0) -> "object | None":
        """Curate only the NEW documents and append the survivors —
        the batch sibling of ``CorpusIngestStream``: first an
        arrival-time exact-dedup anti-join against the existing corpus
        (one DISTINCT hash projection of the table, never the text
        bytes — the theoretical floor for exact dedup), then the
        config's stages over the fresh slice only, then append. Cost
        per run is O(new docs) + one corpus hash projection; history is
        never rewritten. Returns the commit, or None when nothing
        survived."""
        from glue_hudi_spark.operators import dedup as _dedup

        counts: list = []
        if table.exists():
            fresh = _dedup.incremental_exact(
                new_docs, table.read_snapshot().select(self.text_col),
                id_col=self.id_col, text_col=self.text_col,
                bloom_max_buckets=bloom_max_buckets)
        else:
            keep = _dedup.exact_dedup(
                new_docs, id_col=self.id_col, text_col=self.text_col
            ).select(F.col("keep_id").alias(self.id_col))
            fresh = new_docs.join(keep, self.id_col, "left_semi")
        out = self.run(fresh, counts=counts)
        if out.isEmpty():
            return None
        return table.bulk_insert(
            out, extra_stats={"curation_stages": dict(counts)})
