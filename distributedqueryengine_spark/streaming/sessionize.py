"""Streaming sessionization with bounded, watermark-evicted state.

The streaming complement of operators/timeseries.sessionize (which
labels every batch row): here sessions are emitted as COMPLETED
summaries once the watermark proves no more events can join them —
the production shape for "session ended" triggers, attribution
rollups, and session-level feature extraction over an unbounded
stream.

Why not session_window? Spark's built-in session_window emits
per-session AGGREGATES but only over columns declared up front, and
its merge semantics are opaque to custom logic (e.g. the stable
(key, first-epoch) session id contract the batch operator guarantees).
This operator buffers each key's open events in the state store and
re-runs the EXACT batch gap logic per update, so stream ≡ batch is a
testable identity, not an approximation.

State bound — BY CONSTRUCTION, not by cap: an event is buffered only
until the watermark passes (its session's last event + gap); beyond
that the session is final, emitted, and dropped. State per key is
therefore rate × (gap + watermark delay), independent of stream
lifetime — the same contract as dropDuplicatesWithinWatermark. An
additional `max_events_per_key` guard (earliest-kept, overflow
counted in the emitted row) protects against a single bot key whose
session never closes because it never goes quiet.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)


def _session_schemas(key_type):
    out = StructType(
        [
            StructField("key", key_type),
            StructField("session_start", LongType()),
            StructField("session_end", LongType()),
            StructField("n_events", IntegerType()),
            StructField("truncated", BooleanType()),
        ]
    )
    state = StructType(
        [
            StructField("ts", ArrayType(LongType())),
            StructField("n_dropped", LongType()),
        ]
    )
    return out, state


def _split_sessions(ts: list[int], gap: int) -> list[list[int]]:
    """Batch-identical gap split over sorted epochs."""
    sessions: list[list[int]] = []
    for t in ts:
        if sessions and t - sessions[-1][-1] <= gap:
            sessions[-1].append(t)
        else:
            sessions.append([t])
    return sessions


def streaming_sessionize(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int,
    watermark_delay: str = "0 seconds",
    max_events_per_key: int = 100_000,
) -> DataFrame:
    """Emit (key, session_start, session_end, n_events, truncated) for
    every session once the watermark passes session_end + gap — i.e.
    once no admissible event can extend or bridge it. session_start is
    the session's first event epoch, matching the batch operator's
    stable (key, first-epoch) id contract (`session_id =
    concat(key, '|', session_start)` reproduces it exactly).

    Out-of-order events within the watermark are fully honored: a late
    event landing between two buffered sessions MERGES them (the case
    a fold-only design gets wrong); an event later than an
    already-emitted session's close cannot arrive by the watermark
    contract (it would have been dropped upstream as too late).

    Mechanics: applyInPandasWithState with EventTimeTimeout — each
    update buffers the key's open epochs, splits them with the exact
    batch gap logic, emits the prefix of sessions provably closed by
    the current watermark, keeps the rest, and arms a timer at
    (last_event + gap) so a key that simply goes quiet still emits its
    final session. Output is append-mode friendly (rows are final)."""
    if gap_seconds <= 0:
        raise ValueError(f"gap_seconds must be positive, got {gap_seconds}")
    if max_events_per_key < 1:
        raise ValueError(
            f"max_events_per_key must be >= 1, got {max_events_per_key}"
        )
    key_type = events.schema[key_col].dataType
    out_schema, state_schema = _session_schemas(key_type)
    gap = int(gap_seconds)
    cap = int(max_events_per_key)

    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            ts, dropped = state.get
            ts = list(ts)
            dropped = int(dropped or 0)
        else:
            ts, dropped = [], 0
        for pdf in pdfs:
            ts.extend(int(x) for x in pdf["__sec"])
        ts.sort()
        if len(ts) > cap:
            dropped += len(ts) - cap
            ts = ts[:cap]
        wm_sec = state.getCurrentWatermarkMs() // 1000
        sessions = _split_sessions(ts, gap)
        closed = [s for s in sessions if s[-1] + gap < wm_sec]
        open_ = [s for s in sessions if s[-1] + gap >= wm_sec]
        rows = {
            "key": [],
            "session_start": [],
            "session_end": [],
            "n_events": [],
            "truncated": [],
        }
        for s in closed:
            rows["key"].append(key[0])
            rows["session_start"].append(s[0])
            rows["session_end"].append(s[-1])
            rows["n_events"].append(len(s))
            rows["truncated"].append(dropped > 0)
        remaining = [t for s in open_ for t in s]
        if remaining:
            state.update((remaining, dropped))
            # fire when the newest buffered event's session could close
            state.setTimeoutTimestamp((remaining[-1] + gap + 1) * 1000)
        else:
            state.remove()
        if rows["key"]:
            yield pd.DataFrame(rows)

    prepared = events.withWatermark(ts_col, watermark_delay).select(
        F.col(key_col).alias("__key"),
        F.col(ts_col).alias(ts_col),
        F.unix_timestamp(F.col(ts_col)).cast("long").alias("__sec"),
    )
    return prepared.groupBy("__key").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
