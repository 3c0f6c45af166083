"""Column-level function surface.

``scalars`` documents the reference's intended scalar surface
(processData.py:10-11 imports concat, col, lit, to_timestamp, upper, lower,
current_timestamp, explode, to_date, split, unix_timestamp — none called in
its code path, SURVEY §2.4); all are PySpark built-ins and are exercised by
the driver-contract queries in ``__spark_entry__.py``.

``text`` adds the text-analysis surface for LLM-training-data pipelines.
"""
