"""Custom stateful streaming operator (applyInPandasWithState).

The reference keeps running accumulator stats per scan
(utils/workflow_stats.py:30-48 — files/dirs/bytes/rate updated per
record). The streaming-native equivalent: per-key state that survives
across micro-batches, updated with Arrow-batched pandas, emitting a
running summary row per key per batch.

This is also the template for any custom stateful operator the
DataFrame API can't express (per-key model state, CDC accumulators,
rate limiting) — state schema + update function + timeout.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
import pyspark.sql.types as T
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("batch_events", T.LongType()),
    ]
)


def _update(
    key: tuple[Any, ...], batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (n, total) = state.get if state.exists else (0, 0.0)
    batch_n = 0
    for pdf in batches:
        batch_n += len(pdf)
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total],
            "batch_events": [batch_n],
        }
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Running per-user counters over a STREAMING events frame —
    cumulative across micro-batches via managed group state."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
