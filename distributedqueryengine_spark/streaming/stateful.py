"""Custom stateful streaming operators (applyInPandasWithState).

The scale-path answer for stream logic that windowed aggregation can't
express: per-key mutable state with timeout-driven eviction. State
lives in the state store (RocksDB-compatible at cluster scale), keys
are hash-partitioned, and each micro-batch touches only the keys it
contains.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

RUNNING_TOTALS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)
_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)


def _update_running_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Accumulate (count, sum(value)) per user across micro-batches."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 4)]}
    )


def running_totals_per_user(events: DataFrame) -> DataFrame:
    """Streaming per-user running totals with explicit state.

    Equivalent batch semantics: groupBy(user_id).agg(count, sum) — the
    streaming form emits an updated row per key per micro-batch.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _update_running_totals,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_dedup(events: DataFrame, keys: list[str], watermark_col: str, delay: str) -> DataFrame:
    """Drop duplicate events within the watermark horizon.

    dropDuplicatesWithinWatermark bounds state: seen-key memory is
    evicted once the watermark passes, so state size tracks the event
    rate × delay, not the stream's lifetime — the only dedup that
    survives an unbounded stream.
    """
    return events.withWatermark(watermark_col, delay).dropDuplicatesWithinWatermark(keys)
