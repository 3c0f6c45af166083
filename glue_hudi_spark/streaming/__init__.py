"""Structured Streaming variant of the CDC pipeline."""

from glue_hudi_spark.streaming.cdc_stream import CdcStream

__all__ = ["CdcStream"]
