"""Streaming mergeable sketches: continuous heavy hitters.

The streaming face of operators/aggregates.heavy_hitters: Misra-Gries
summaries are MERGEABLE (sum counters item-wise, then re-truncate to k
by subtracting the (k+1)-largest count — the merged summary keeps the
n/(k+1) guarantee over the TOTAL stream), so a micro-batch pipeline
can maintain "top domains / tokens / user-agents so far" forever with
k counters of state — never a distinct-values table.

State lives driver-side in the monitor object (k counters + one error
scalar — model-sized, the same contract as drift.py's frozen
reference), updated per micro-batch from the batch operator's
k·partitions-sized summary. For exactly-once accounting restart the
query with a fresh monitor; the sketch is cheap to rebuild from the
retained batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class HeavyHittersMonitor:
    """Running Misra-Gries state with lossless-summable merge."""

    def __init__(self, k: int):
        if k < 1:
            raise ValueError(f"k must be >= 1, got {k}")
        self.k = int(k)
        self.counters: dict[str, int] = {}
        self.err = 0  # total decrement mass: true <= est + err for any item

    def merge_summary(self, rows) -> None:
        """Fold a (item, c) summary — item NULL carries decrement mass."""
        for item, c in rows:
            if item is None:
                self.err += int(c)
            else:
                self.counters[item] = self.counters.get(item, 0) + int(c)
        if len(self.counters) > self.k:
            # re-truncate: subtract the (k+1)-largest count from all
            cut = sorted(self.counters.values(), reverse=True)[self.k]
            self.err += cut
            self.counters = {
                i: c - cut for i, c in self.counters.items() if c - cut > 0
            }

    def estimates(self, top: int | None = None) -> list[tuple[str, int, int]]:
        """[(item, count_lo, count_hi)] sorted by count_lo desc."""
        out = sorted(
            ((i, c, c + self.err) for i, c in self.counters.items()),
            key=lambda t: (-t[1], t[0]),
        )
        return out[:top] if top else out


def stream_heavy_hitters(
    stream: DataFrame,
    value_col: str,
    k: int = 100,
    monitor: HeavyHittersMonitor | None = None,
    checkpoint: str | None = None,
    path: str | None = None,
):
    """Maintain continuous heavy hitters over a stream: each micro-batch
    runs the distributed per-partition Misra-Gries summary (bounded
    memory per task) and folds the k·partitions-sized result into the
    monitor. Returns (query, monitor); read
    `monitor.estimates(top=...)` at any point for the stream-so-far
    answer with (count_lo, count_hi) brackets.

    Production sink: pass parquet `path` to also land each batch's
    stream-so-far estimates as rows (item, count_lo, count_hi) in a
    batch_id-partitioned directory via the replay-idempotent dynamic
    overwrite of streaming/sinks.py — a restart that replays batch n
    rewrites partition n, never duplicating summary rows. NOTE the
    monitor itself is driver-memory state: after a process restart its
    fold restarts from the replayed batches, so treat the LAST batch_id
    partition as the authoritative stream-so-far summary."""
    from distributedqueryengine_spark.operators.aggregates import mg_summary

    mon = monitor or HeavyHittersMonitor(k)

    def fold(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        # the batch operator's merged summary: per-item sums + the
        # NULL-item decrement-mass row, k-bounded by construction
        rows = [
            (r.item, r.c)
            for r in mg_summary(batch_df, value_col, k=mon.k).collect()
        ]
        mon.merge_summary(rows)
        if path is not None:
            from distributedqueryengine_spark.streaming.sinks import (
                write_batch_idempotent,
            )

            est = [
                (str(i), int(lo), int(hi)) for i, lo, hi in mon.estimates()
            ]
            write_batch_idempotent(
                batch_df.sparkSession.createDataFrame(
                    est, "item string, count_lo long, count_hi long"
                ),
                batch_id,
                path,
            )

    writer = stream.writeStream.foreachBatch(fold).outputMode("append")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start(), mon
