"""Operators: reference-parity CDC transforms plus the LLM-data-pipeline
extension surface (dedup, similarity search, text analysis, multimodal)."""
