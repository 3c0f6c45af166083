"""Custom stateful streaming operator: per-key running profile via
``applyInPandasWithState``.

The engine's batch surface covers windowed/rollup aggregation; this is the
*streaming* stateful complement — a per-key accumulator that survives
across micro-batches (the shape you use for running user profiles, online
feature aggregation, or incremental quality counters over a 100 TB/day
event firehose).

State is one row per key (bounded by key cardinality, not event volume);
each micro-batch updates only the keys it touches — the Structured
Streaming state store shards it per shuffle partition, so the operator
scales horizontally like any keyed aggregation.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id bigint, n_events bigint, total_value double, max_value double, "
    "last_event_id bigint"
)
STATE_SCHEMA = "n bigint, total double, mx double, last_id bigint"


def _update_profile(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n, total, mx, last_id = state.get
    else:
        n, total, mx, last_id = 0, 0.0, float("-inf"), -1
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        mx = max(mx, float(pdf["value"].max()))
        newest = pdf.loc[pdf["event_id"].idxmax()]
        if int(newest["event_id"]) > last_id:
            last_id = int(newest["event_id"])
    state.update((n, total, mx, last_id))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total],
            "max_value": [mx],
            "last_event_id": [last_id],
        }
    )


def running_user_profiles(events_stream: DataFrame) -> DataFrame:
    """events stream (event_id, user_id, value, …) → continuously-updated
    per-user profile rows (one output row per touched key per batch)."""
    return (
        events_stream.groupBy("user_id")
        .applyInPandasWithState(
            _update_profile,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
