"""Multimodal column support: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas functions.

The Spark-side plumbing is real and tested — schemas, ``mapInPandas``
batch shapes, partition sizing — while the actual codec work is stubbed:
this container has no image/audio libraries, so ``decode_*`` raise
``NotImplementedError`` unless ``fake=True`` selects a deterministic fake
decoder (byte-derived metadata) that exercises the identical dataflow.

Scale notes:

* Binary payloads ride in parquet as ``binary`` — columnar, compressed,
  prunable: a metadata-only query never touches payload bytes (column
  pruning drops them at the scan).
* ``mapInPandas`` keeps the decode path Arrow-batched (one Python
  round-trip per batch, not per row). Batch memory is bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` — for 10 MB images set
  it to ~64, not the 10k default; for 100 TB of media, partition on a
  content-size band first so batches are uniform.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("source_uri", T.StringType()),
    ]
)

IMAGE_META_SCHEMA = (
    "media_id long, media_type string, n_bytes long, sha256 string, "
    "width int, height int, channels int"
)

FRAME_SCHEMA = "media_id long, frame_idx int, frame_sha256 string"


def attach_binary_payload(df: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Build a media-shaped DataFrame from any table by casting content to
    binary — the test-path generator for the multimodal dataflow (the
    driver testdata has no real media; payload bytes just need to be real
    bytes)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.col(text_col).cast("binary").alias("payload"),
        F.lit("image").alias("media_type"),
        F.concat(F.lit("synthetic://"), F.col(id_col).cast("string")).alias("source_uri"),
    )


def decode_image_metadata(df: DataFrame, fake: bool = False) -> DataFrame:
    """Extract per-image metadata (dims, hash) from payload bytes.

    Real decoding needs an image library (not in this container) → raises
    ``NotImplementedError`` unless ``fake=True``, which derives
    deterministic pseudo-dimensions from the payload bytes. Either way the
    Spark plumbing — Arrow batches in, typed rows out — is identical.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "image decoding requires an image library (e.g. Pillow); "
                    "re-run with fake=True for the deterministic stub"
                )
            payloads = pdf["payload"]
            n_bytes = payloads.map(lambda b: len(b) if b is not None else 0)
            sha = payloads.map(
                lambda b: hashlib.sha256(b or b"").hexdigest()
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": n_bytes.astype("int64"),
                    "sha256": sha,
                    # deterministic fake dims derived from content length
                    "width": (n_bytes % 512 + 1).astype("int32"),
                    "height": (n_bytes % 384 + 1).astype("int32"),
                    "channels": pd.Series([3] * len(pdf), dtype="int32"),
                }
            )

    return df.mapInPandas(batches, schema=IMAGE_META_SCHEMA)


def sample_frames(df: DataFrame, every_n_bytes: int = 64, max_frames: int = 8,
                  fake: bool = False) -> DataFrame:
    """Frame sampling for video payloads: emit one row per sampled frame.

    The stub samples ``max_frames`` evenly spaced byte-windows of the
    payload and hashes them — the same fan-out shape (1 row in → ≤N rows
    out) a real ffmpeg-backed sampler has.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "frame sampling requires a video library (e.g. PyAV); "
                    "re-run with fake=True for the deterministic stub"
                )
            out = {"media_id": [], "frame_idx": [], "frame_sha256": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = payload or b""
                n = max(1, min(max_frames, len(data) // every_n_bytes))
                step = max(1, len(data) // n)
                for i in range(n):
                    window = data[i * step : i * step + every_n_bytes]
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["frame_sha256"].append(hashlib.sha256(window).hexdigest())
            yield pd.DataFrame(out)

    return df.mapInPandas(batches, schema=FRAME_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize — decode-dependent, so always a stub in this container.
    Kept as the API anchor: signature, schema, and partitioning contract."""
    raise NotImplementedError(
        "resize requires an image library; the dataflow contract is "
        "payload→payload mapInPandas with unchanged schema"
    )
