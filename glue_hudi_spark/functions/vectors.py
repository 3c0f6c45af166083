"""Embedding-column functions for training-data pipelines.

Embedding tables dominate storage at corpus scale (a 64-dim float32 vector
is larger than many documents' text), so the standard levers are all
column expressions here — pure JVM-side ``pyspark.sql.functions``
compositions (no Python UDFs), deterministic, and replayable by a DuckDB
oracle:

* ``l2_normalize`` — unit-norm vectors so cosine becomes a plain dot
  product downstream (the precompute every ANN tier wants).
* ``quantize_int8`` / ``int8_scale`` — symmetric per-vector int8
  quantization (scale = max|x| / 127, code = floor(x/scale + 0.5)):
  4× smaller embedding storage with the usual <1% recall cost. Codes are
  exact integers, so cross-engine hashing is trivially stable.
* ``truncate_dims`` — Matryoshka-style prefix truncation (keep the first
  d dimensions, re-normalize): the cheap speed/recall dial when the
  embedding model was trained with MRL.

All scalar ops are single IEEE-double operations (abs, /, floor, +) in a
fixed fold order, so Spark and DuckDB agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(col: str | Column) -> Column:
    """Euclidean norm of an array<double> column."""
    v = _c(col)
    return F.sqrt(_dot(v, v))


def l2_normalize(col: str | Column) -> Column:
    """Unit-norm copy of the vector (zero vectors stay zero)."""
    v = _c(col)
    n = l2_norm(v)
    return F.when(n == 0.0, v).otherwise(F.transform(v, lambda x: x / n))


def int8_scale(col: str | Column) -> Column:
    """Symmetric int8 quantization scale: max|x| / 127 (0 for the zero
    vector)."""
    v = _c(col)
    return F.array_max(F.transform(v, lambda x: F.abs(x))) / F.lit(127.0)


def quantize_int8(col: str | Column, scale: Column | None = None) -> Column:
    """Quantize to int8 codes in [-127, 127]: floor(x/scale + 0.5).

    floor(+0.5) is round-half-up in every engine (unlike ``round``, whose
    half-even/half-away behavior differs), and |x|/scale ≤ 127 by
    construction so no clamp is needed. Returns array<bigint> (the values
    fit int8; bigint avoids engine-specific tinyint display/casting
    drift in oracles).
    """
    v = _c(col)
    s = int8_scale(v) if scale is None else scale
    return F.when(
        s == 0.0, F.transform(v, lambda x: F.lit(0).cast("bigint"))
    ).otherwise(F.transform(v, lambda x: F.floor(x / s + F.lit(0.5))))


def truncate_dims(col: str | Column, d: int, renormalize: bool = True) -> Column:
    """Matryoshka truncation: keep dimensions [0, d), optionally re-unit-
    normalize the prefix (MRL embeddings are trained so prefixes remain
    meaningful after renormalization)."""
    v = F.slice(_c(col), 1, d)
    return l2_normalize(v) if renormalize else v
