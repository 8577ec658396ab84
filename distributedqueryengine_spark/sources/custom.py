"""Custom Python DataSource (Spark 4 DataSource API): synthetic events.

Demonstrates the engine's source extension point — the reference could
only ever scan its four hardcoded MySQL sites (RPC.cs:311-329); here a
new source is a class registered once and then available as
``spark.read.format("synthetic_events")`` to every query.

The generator is partition-parallel and deterministic: each partition
derives its rows from (seed, partition_id, row_index) via a splitmix-
style hash, so a 10⁹-row dataset generates across the cluster with no
coordination and no RNG state — the same design as Spark's built-in
`range()` source, with event-shaped columns.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

EVENT_TYPES = ("click", "view", "purchase", "signup", "error")
_EPOCH_START = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)


def _mix(x: int) -> int:
    x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9 & 0xFFFFFFFFFFFFFFFF
    x = (x ^ (x >> 27)) * 0x94D049BB133111EB & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


class SyntheticEventsDataSource(DataSource):
    """``format("synthetic_events")`` with options:

    - ``numRows`` (total, default 1000)
    - ``numPartitions`` (default 4)
    - ``seed`` (default 42)
    """

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return (
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double"
        )

    def reader(self, schema) -> "SyntheticEventsReader":
        return SyntheticEventsReader(self.options)

    def simpleStreamReader(self, schema) -> "SyntheticEventsStreamReader":
        return SyntheticEventsStreamReader(self.options)


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_rows = int(options.get("numRows", 1000))
        self.n_parts = int(options.get("numPartitions", 4))
        self.seed = int(options.get("seed", 42))

    def partitions(self) -> Sequence[InputPartition]:
        return [InputPartition(i) for i in range(self.n_parts)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        pid = partition.value
        per_part = self.n_rows // self.n_parts
        extra = self.n_rows % self.n_parts
        count = per_part + (1 if pid < extra else 0)
        base = pid * per_part + min(pid, extra)
        for i in range(count):
            rid = base + i
            h = _mix(self.seed * 0x9E3779B97F4A7C15 + rid)
            ts = _EPOCH_START + dt.timedelta(seconds=(h % (30 * 86400)))
            yield (
                rid,
                ts.replace(tzinfo=None),
                (h >> 16) % 1000,
                EVENT_TYPES[(h >> 8) % len(EVENT_TYPES)],
                round(((h >> 24) % 100000) / 1000.0, 3),
            )


def register(spark) -> None:
    """Register the source on a session (idempotent)."""
    spark.dataSource.register(SyntheticEventsDataSource)


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch stream over the same deterministic sequence: each
    batch advances the offset by ``rowsPerBatch`` rows. Offsets are
    plain dicts → checkpointable; `readBetweenOffsets` replays any
    range exactly, giving end-to-end exactly-once with an idempotent
    sink."""

    def __init__(self, options: dict):
        self.rows_per_batch = int(options.get("rowsPerBatch", 100))
        self.seed = int(options.get("seed", 42))

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def _gen(self, start: int, end: int):
        for rid in range(start, end):
            h = _mix(self.seed * 0x9E3779B97F4A7C15 + rid)
            ts = _EPOCH_START + dt.timedelta(seconds=(h % (30 * 86400)))
            yield (
                rid,
                ts.replace(tzinfo=None),
                (h >> 16) % 1000,
                EVENT_TYPES[(h >> 8) % len(EVENT_TYPES)],
                round(((h >> 24) % 100000) / 1000.0, 3),
            )

    def read(self, start: dict):
        end = {"pos": start["pos"] + self.rows_per_batch}
        # concrete list, not a generator: the runner pickles the rows
        # for prefetch (generators are not picklable)
        return list(self._gen(start["pos"], end["pos"])), end

    def readBetweenOffsets(self, start: dict, end: dict):
        return list(self._gen(start["pos"], end["pos"]))
