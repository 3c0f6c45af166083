"""Text-analysis column functions for training-data pipelines.

All pure JVM-side expressions (``pyspark.sql.functions`` built-ins — no
Python UDFs in the hot path), so they stay inside whole-stage codegen and
scale linearly with input splits. Each has a matching ANSI-SQL formulation
the DuckDB oracle runs side-by-side (see ``__spark_entry__.oracle_sql``).

Design note: everything here is *deterministic* — hashes are md5 (same
result in any engine), no RNG, no time — so results are reproducible across
engines and runs, which is what makes a 100 TB dedup job auditable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A tiny embedded stopword list per language — enough for a deterministic
# language-ID heuristic and stopword-ratio quality signal. (Real pipelines
# plug in fastText etc.; the operator contract is what matters here.)
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it", "that", "for"],
    "fr": ["le", "la", "et", "de", "un", "une", "est", "que", "pour", "dans"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "zu", "nicht", "mit"],
    "es": ["el", "la", "y", "de", "un", "una", "es", "que", "por", "con"],
}


def tokens(col: str | Column) -> Column:
    """Whitespace tokenization (split on runs of whitespace, no empties)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def token_count(col: str | Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def bpe_ish_token_count(col: str | Column) -> Column:
    """BPE-ish token estimate: count word pieces + digits + punctuation via
    a regex over letter-runs/digit-runs/symbols — a cheap, deterministic
    stand-in for a subword tokenizer (≈ GPT-2 pre-tokenizer granularity)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"))


def punct_ratio(col: str | Column) -> Column:
    """Punctuation chars / total chars (0 for empty strings)."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    p = F.regexp_count(c, F.lit(r"[^A-Za-z0-9\s]"))
    return F.when(n > 0, p.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def stopword_ratio(col: str | Column, lang: str = "en") -> Column:
    """Fraction of tokens that are stopwords of ``lang``."""
    toks = tokens(F.lower(col if isinstance(col, Column) else F.col(col)))
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(F.size(toks) > 0,
                  hits.cast("double") / F.size(toks).cast("double")
                  ).otherwise(F.lit(0.0))


def quality_score(col: str | Column) -> Column:
    """Composite quality heuristic in [0,1]: rewards mid-length documents,
    low punctuation density, and presence of stopwords (prose-ness).
    Deterministic and SQL-expressible; thresholds are conventional."""
    c = F.col(col) if isinstance(col, str) else col
    n_tok = token_count(c).cast("double")
    len_score = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    punct_score = F.lit(1.0) - F.least(punct_ratio(c) * 5.0, F.lit(1.0))
    sw_score = F.least(stopword_ratio(c) * 10.0, F.lit(1.0))
    return F.round((len_score + punct_score + sw_score) / 3.0, 6)


def lang_id(col: str | Column) -> Column:
    """Stopword-marker language ID: pick the language whose stopword list
    hits the most tokens; ties and zero-hits fall back to 'en'.
    (An n-gram model would plug in the same shape; determinism is the
    contract the pipeline needs.)"""
    toks = tokens(F.lower(col if isinstance(col, Column) else F.col(col)))
    scores = []
    for lang, words in STOPWORDS.items():
        sw = F.array(*[F.lit(w) for w in words])
        scores.append(
            F.struct(
                F.size(F.filter(toks, lambda t: F.array_contains(sw, t))).alias("hits"),
                F.lit(lang).alias("lang"),
            )
        )
    # max by (hits, lang) — lang as deterministic tiebreak, then require >0
    best = F.greatest(*scores) if len(scores) > 1 else scores[0]
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("en"))


def fingerprint(col: str | Column) -> Column:
    """Document fingerprint: md5 over the sorted distinct token set —
    word-order- and duplication-insensitive content hash (the classic
    'fingerprint' dedup key). Portable: DuckDB computes the identical
    value via md5(list_aggregate(list_sort(list_distinct(...)), ...))."""
    toks = F.array_sort(F.array_distinct(tokens(F.lower(
        col if isinstance(col, Column) else F.col(col)))))
    return F.md5(F.array_join(toks, " "))


# PII patterns, ordered: emails first (an address can contain digit runs a
# later pattern would mangle), then SSN (3-2-4 — disjoint from phone's
# 3-3-4), then phone, then IPv4. RE2-safe (no lookaround/backrefs) so the
# DuckDB oracle applies the identical regexes.
PII_PATTERNS = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    (r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def redact_pii(col: str | Column) -> Column:
    """Redact emails / SSNs / phone numbers / IPv4 addresses with typed
    placeholder tokens — the standard scrub before corpus release. A chain
    of regexp_replace expressions (global, leftmost-non-overlapping in
    both Java regex and RE2), entirely inside whole-stage codegen."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, tok in PII_PATTERNS:
        c = F.regexp_replace(c, pat, tok)
    return c


def repetition_ratio(col: str | Column) -> Column:
    """Within-document duplicate-token fraction: 1 - distinct/total
    (0 for empty docs) — the cheapest of the Gopher repetition signals;
    boilerplate and keyword-stuffed pages score high."""
    toks = tokens(F.lower(col if isinstance(col, Column) else F.col(col)))
    n = F.size(toks)
    return F.when(
        n > 0,
        F.round(
            F.lit(1.0)
            - F.size(F.array_distinct(toks)).cast("double") / n.cast("double"),
            6,
        ),
    ).otherwise(F.lit(0.0))


def bigram_repetition_ratio(col: str | Column) -> Column:
    """Duplicate-bigram fraction: 1 - distinct_bigrams/total_bigrams
    (0 when fewer than 2 tokens). Catches looped phrases single-token
    repetition misses; still a pure array expression.

    Bigrams come from ``zip_with`` over two slices of the token array —
    the array enters the lambda as an OPERAND, evaluated once per row. The
    first version indexed ``element_at(tokens(...), i)`` inside a
    transform lambda: Catalyst does no CSE across lambda arguments, so the
    whole regex split re-ran per element — O(n²·len) per document, 20×
    slower at sf0.1."""
    toks = tokens(F.lower(col if isinstance(col, Column) else F.col(col)))
    n = F.size(toks)
    grams = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return F.when(
        n > 1,
        F.round(
            F.lit(1.0)
            - F.size(F.array_distinct(grams)).cast("double")
            / (n - 1).cast("double"),
            6,
        ),
    ).otherwise(F.lit(0.0))


def bigrams(col: str | Column) -> Column:
    """Lowercased whitespace-token bigram array (empty when < 2 tokens).
    Same zip_with-over-two-slices construction as
    ``bigram_repetition_ratio`` (the token array binds once per row)."""
    toks = tokens(F.lower(col if isinstance(col, Column) else F.col(col)))
    n = F.size(toks)
    grams = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return F.when(n > 1, grams).otherwise(F.array().cast("array<string>"))


def chunk_tokens(col: str | Column, size: int = 50, stride: int = 40) -> Column:
    """Split a document into training chunks of ``size`` whitespace tokens
    starting every ``stride`` tokens (overlap = size - stride), as an
    array of chunk strings. The last chunk may be shorter; a doc shorter
    than one stride yields exactly one chunk. Pure array expression
    (sequence + transform + slice) — rows explode downstream, so the op
    is map-side and linear at any corpus size."""
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")
    toks = tokens(col)
    n = F.size(toks)
    n_chunks = F.greatest(F.ceil(n.cast("double") / F.lit(float(stride))), F.lit(1))
    idx = F.sequence(F.lit(0), (n_chunks - 1).cast("int"))
    return F.transform(
        idx, lambda i: F.array_join(F.slice(toks, i * stride + 1, size), " ")
    )
