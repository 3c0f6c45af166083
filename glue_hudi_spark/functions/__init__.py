"""Column-level function surface.

The reference's intended scalar surface (processData.py:10-11 imports
concat, col, lit, to_timestamp, upper, lower, current_timestamp, explode,
to_date, split, unix_timestamp — none called in its code path, SURVEY §2.4)
is all built-in ``pyspark.sql.functions``; the engine exposes it through
the driver-contract queries in ``__spark_entry__.py`` (scalar_* entries)
rather than wrapping built-ins.

``text`` adds the text-analysis surface for LLM-training-data pipelines.
"""
