"""Hypothesis property tests: text column functions vs pure-Python
reference implementations over generated strings (one batched DataFrame
per example keeps Spark job count sane)."""

from __future__ import annotations

import hashlib
import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import Row

from glue_hudi_spark.functions import text as TX

# printable-ish text incl. whitespace runs, punctuation, digits
TEXTS = st.lists(
    st.text(
        alphabet=st.sampled_from(
            list("abcdefghijklmnop THE the and of to in is ,.!?:;0123456789  ")
        ),
        min_size=1,
        max_size=60,
    ).filter(lambda s: s.strip()),
    min_size=1,
    max_size=25,
)


def py_tokens(s: str) -> list[str]:
    return [t for t in re.split(r"\s+", s.strip()) if t != ""]


def py_fingerprint(s: str) -> str:
    toks = sorted(set(py_tokens(s.lower())))
    return hashlib.md5(" ".join(toks).encode()).hexdigest()


def py_bpe_ish(s: str) -> int:
    return len(re.findall(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]", s))


@settings(max_examples=12, deadline=None)
@given(TEXTS)
def test_text_functions_match_python_reference(spark, texts):
    df = spark.createDataFrame([Row(i=i, text=t) for i, t in enumerate(texts)])
    got = {
        r["i"]: r
        for r in df.select(
            "i",
            TX.token_count("text").alias("n"),
            TX.bpe_ish_token_count("text").alias("bpe"),
            TX.fingerprint("text").alias("fp"),
        ).collect()
    }
    for i, t in enumerate(texts):
        assert got[i]["n"] == len(py_tokens(t)), repr(t)
        assert got[i]["bpe"] == py_bpe_ish(t), repr(t)
        assert got[i]["fp"] == py_fingerprint(t), repr(t)


def py_repetition(s: str) -> float:
    toks = py_tokens(s.lower())
    if not toks:
        return 0.0
    return round(1.0 - len(set(toks)) / len(toks), 6)


def py_bigram_repetition(s: str) -> float:
    toks = py_tokens(s.lower())
    if len(toks) < 2:
        return 0.0
    grams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    return round(1.0 - len(set(grams)) / len(grams), 6)


def py_redact(s: str) -> str:
    for pat, tok in TX.PII_PATTERNS:
        s = re.sub(pat, tok, s)
    return s


@settings(max_examples=12, deadline=None)
@given(TEXTS)
def test_repetition_matches_python_reference(spark, texts):
    df = spark.createDataFrame([Row(i=i, text=t) for i, t in enumerate(texts)])
    got = {
        r["i"]: r
        for r in df.select(
            "i",
            TX.repetition_ratio("text").alias("rep"),
            TX.bigram_repetition_ratio("text").alias("brep"),
        ).collect()
    }
    for i, t in enumerate(texts):
        assert abs(got[i]["rep"] - py_repetition(t)) < 1e-9, repr(t)
        assert abs(got[i]["brep"] - py_bigram_repetition(t)) < 1e-9, repr(t)


PII_SAMPLES = [
    "mail me at jane.doe+x@corp.example.co or on 555-123-4567 today",
    "ssn 123-45-6789 is not a phone; host 192.168.1.254 is an ip",
    "dots 555.123.4567 and mixed 555-123.4567 both redact",
    "no pii here at all",
    "edge a@b.io end",
    "almost-ip 1234.5.6.7 and almost-ssn 1123-45-6789x",
]


def test_pii_redaction_fixed_samples(spark):
    df = spark.createDataFrame([Row(i=i, text=t) for i, t in enumerate(PII_SAMPLES)])
    got = {r["i"]: r["red"] for r in df.select(
        "i", TX.redact_pii("text").alias("red")).collect()}
    for i, t in enumerate(PII_SAMPLES):
        assert got[i] == py_redact(t), (t, got[i], py_redact(t))
    assert "<EMAIL>" in got[0] and "<PHONE>" in got[0]
    assert "<SSN>" in got[1] and "<IP>" in got[1]
    assert got[3] == PII_SAMPLES[3]


def py_chunks(s: str, size=50, stride=40) -> list[str]:
    toks = py_tokens(s)
    n = len(toks)
    import math
    nch = max(math.ceil(n / stride), 1)
    return [" ".join(toks[i * stride:i * stride + size]) for i in range(nch)]


@settings(max_examples=12, deadline=None)
@given(TEXTS)
def test_chunk_tokens_matches_python_reference(spark, texts):
    df = spark.createDataFrame([Row(i=i, text=t) for i, t in enumerate(texts)])
    got = {r["i"]: r["ch"] for r in df.select(
        "i", TX.chunk_tokens("text", size=5, stride=3).alias("ch")).collect()}
    for i, t in enumerate(texts):
        assert got[i] == py_chunks(t, size=5, stride=3), repr(t)
