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


# ------------------------------------------------------ streaming funnel

def _funnel_schemas(n_steps: int, key_type):
    from pyspark.sql.types import ArrayType, BooleanType, IntegerType, StringType

    # one scalar column per step (step_1_ts..step_k_ts): nested arrays
    # in applyInPandasWithState OUTPUT rows hit Arrow decode issues on
    # this Spark build, and scalars are the friendlier sink schema
    # anyway. State keeps arrays (state encoding handles them fine).
    # The key field's type is derived from the input (a string key must
    # not be forced through a hardcoded LongType state encoding).
    out = StructType(
        [
            StructField("key", key_type),
            StructField("max_step", IntegerType()),
            StructField("n_state_events", LongType()),
            StructField("truncated", BooleanType()),
        ]
        + [StructField(f"step_{i + 1}_ts", LongType()) for i in range(n_steps)]
    )
    state = StructType(
        [
            StructField("ts", ArrayType(LongType())),
            StructField("step", ArrayType(StringType())),
            StructField("n_dropped", LongType()),
        ]
    )
    return out, state


def _greedy_funnel(events, steps, within):
    """Driver-identical greedy earliest-match fold (the exact
    semantics of operators/timeseries.funnel, incl. first-touch window
    anchoring); events pre-sorted by (ts, step)."""
    times = [None] * len(steps)
    for t, s in events:
        for i, name in enumerate(steps):
            if times[i] is None and s == name:
                prev_ok = i == 0 or (
                    times[i - 1] is not None and t >= times[i - 1]
                )
                win_ok = (
                    within is None
                    or i == 0
                    or (times[0] is not None and t - times[0] <= within)
                )
                if prev_ok and win_ok:
                    times[i] = t
                break
    return times


def streaming_funnel(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    step_col: str,
    steps: list[str],
    within_seconds: int | None = None,
    max_events_per_key: int = 10_000,
) -> DataFrame:
    """Continuously-updated funnel per key: each micro-batch emits the
    key's current (max_step, step_times) — identical semantics to the
    batch operators/timeseries.funnel over the events seen so far.

    A funnel is NOT incrementally foldable from a summary: a step-1
    event arriving AFTER a step-2 event (cross-batch out-of-order) can
    retroactively complete the sequence, so the state keeps the key's
    funnel-RELEVANT events (pre-filtered to the step set) and re-runs
    the greedy fold per update. State is BOUNDED two ways:

    * within-window trim (lossless): with `within_seconds` set, any
      event later than `min(step0 time) + within_seconds` can never
      fill a slot — the anchor is the minimum step-0 time, which only
      moves EARLIER as late data arrives, so the window end only moves
      earlier too; events beyond it are provably irrelevant forever and
      are dropped from state without changing any future answer.
    * per-key event cap (guarded truncation): at most
      `max_events_per_key` events are retained per key — the EARLIEST
      by (ts, step), matching the batch operator's capped-prefix
      semantics — so one bot key cannot grow a state row without
      bound. Dropped-event counts accumulate in state and surface as
      `n_state_events` / `truncated` output columns rather than
      failing silently.

    Keys are hash-partitioned and each batch touches only arriving
    keys. The output key column's type follows the input key column.
    """
    from pyspark.sql import functions as F

    key_type = events.schema[key_col].dataType
    out_schema, state_schema = _funnel_schemas(len(steps), key_type)
    step_set = list(steps)
    within = within_seconds
    cap = int(max_events_per_key)
    if cap < len(steps):
        raise ValueError(
            f"max_events_per_key={cap} cannot hold a {len(steps)}-step funnel"
        )

    def update(key, pdfs, state: GroupState):
        if state.exists:
            ts, st, dropped = state.get
            evs = sorted(zip(ts, st))
            dropped = int(dropped or 0)
        else:
            evs, dropped = [], 0
        for pdf in pdfs:
            evs.extend(
                zip((int(x) for x in pdf["__sec"]), (str(x) for x in pdf["__step"]))
            )
        evs.sort()
        if within is not None:
            anchor = next((t for t, s in evs if s == step_set[0]), None)
            if anchor is not None:
                # lossless: beyond anchor+within no event can ever match
                evs = [e for e in evs if e[0] <= anchor + within]
        if len(evs) > cap:
            dropped += len(evs) - cap
            evs = evs[:cap]
        state.update(([t for t, _ in evs], [s for _, s in evs], dropped))
        times = _greedy_funnel(evs, step_set, within)
        n = 0
        for t in times:
            if t is None:
                break
            n += 1
        row = {
            "key": [key[0]],
            "max_step": [n],
            "n_state_events": [len(evs)],
            "truncated": [dropped > 0],
        }
        for i, t in enumerate(times):
            row[f"step_{i + 1}_ts"] = [t]
        yield pd.DataFrame(row)

    filtered = events.filter(F.col(step_col).isin(step_set)).select(
        F.col(key_col).alias("__key"),
        F.unix_timestamp(F.col(ts_col)).cast("long").alias("__sec"),
        F.col(step_col).alias("__step"),
    )
    return filtered.groupBy("__key").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
