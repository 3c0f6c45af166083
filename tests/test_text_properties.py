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
