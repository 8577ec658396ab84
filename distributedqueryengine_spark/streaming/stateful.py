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


# ---------------------------------------------- transformWithState

def transform_with_state_available() -> bool:
    """transformWithStateInPandas needs `google.protobuf` for its
    Python↔JVM state-server protocol; absent in some environments
    (including this container). Gate, don't crash."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def running_totals_tws(events: DataFrame) -> DataFrame:
    """Per-user running totals on the Spark 4 `transformWithState`
    API — the successor to applyInPandasWithState: named state
    variables (ValueState/ListState/MapState), timers, and TTL, backed
    by the same hash-partitioned state store (requires the RocksDB
    provider). Functionally identical to `running_totals_per_user`;
    when the runtime supports it, tests assert both match the batch
    aggregate so the two stateful APIs pin each other. Requires
    `transform_with_state_available()`.
    """
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", _STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            n, total = self._totals.get() if self._totals.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._totals.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 4)]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        RunningTotals(),
        outputStructType=RUNNING_TOTALS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
