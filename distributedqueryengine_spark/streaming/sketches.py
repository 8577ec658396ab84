"""Streaming mergeable sketches: continuous heavy hitters + quantiles.

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


class QuantileMonitor:
    """Running bottom-k quantile state (see
    operators/aggregates.quantile_state_build): n + the r smallest
    (rank, v) pairs seen so far. Bottom-k merge is EXACT, so the
    stream-so-far sample equals a batch build over every row ingested
    — not an approximation of it (pinned in tests)."""

    def __init__(self, r: int = 1024):
        if r < 1:
            raise ValueError(f"r must be >= 1, got {r}")
        self.r = int(r)
        self.n = 0
        self.sample: list[tuple[int, float]] = []

    def merge_state(self, n: int, elems) -> None:
        self.n += int(n)
        self.sample = sorted(self.sample + [tuple(e) for e in elems])[: self.r]

    def estimates(self, probs) -> dict[float, float]:
        """{p: lower empirical quantile of the sample} — same index
        arithmetic as quantile_state_estimate."""
        vals = sorted(v for _, v in self.sample)
        if not vals:
            return {float(p): None for p in probs}
        m = len(vals)
        return {
            float(p): vals[int(p * (m - 1))] for p in probs
        }


def stream_quantiles(
    stream: DataFrame,
    value_col: str,
    id_col: str,
    r: int = 1024,
    monitor: QuantileMonitor | None = None,
    checkpoint: str | None = None,
    path: str | None = None,
    probs=(0.5, 0.9, 0.99),
):
    """Maintain continuous quantiles over a stream: each micro-batch
    builds the bottom-k quantile state (one batch-sized pass) and
    merges it into the monitor — r pairs of driver state, never a
    values table. Returns (query, monitor); read
    `monitor.estimates(probs)` at any point for the stream-so-far
    quantiles, which are EXACTLY those of a batch build over all rows
    so far (bottom-k merge is exact).

    Pass parquet `path` to also land each batch's stream-so-far
    estimates as one row (p, q columns per prob) under batch_id
    partitions with the replay-idempotent dynamic overwrite of
    streaming/sinks.py. Same restart caveat as stream_heavy_hitters:
    the monitor is driver-memory state — treat the LAST batch_id
    partition as authoritative."""
    from distributedqueryengine_spark.operators.aggregates import (
        quantile_state_build,
    )

    mon = monitor or QuantileMonitor(r)
    probs = [float(p) for p in probs]

    def fold(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        st = quantile_state_build(
            batch_df, [], value_col, id_col, r=mon.r
        ).collect()
        if not st:
            return
        row = st[0]
        mon.merge_state(row["n"], [(e["rank"], e["v"]) for e in row["sample"]])
        if path is not None:
            from distributedqueryengine_spark.streaming.sinks import (
                write_batch_idempotent,
            )

            est = mon.estimates(probs)
            cols = ", ".join(
                f"q_{str(p).replace('.', '_')} double" for p in probs
            )
            write_batch_idempotent(
                batch_df.sparkSession.createDataFrame(
                    [tuple([int(mon.n)] + [est[p] for p in probs])],
                    f"n long, {cols}",
                ),
                batch_id,
                path,
            )

    writer = stream.writeStream.foreachBatch(fold).outputMode("append")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start(), mon


class KMVMonitor:
    """Running K-Minimum-Values distinct state (see
    operators/aggregates.kmv_build): the k smallest 60-bit hashes of
    every distinct value seen so far. KMV merge is EXACT (bottom-k of
    a union ≡ bottom-k over concatenated bottom-k states), so the
    stream-so-far state equals a batch build over all ingested rows —
    pinned in tests, same contract as QuantileMonitor."""

    _SPACE = float(1 << 60)

    def __init__(self, k: int = 256):
        if k < 2:
            raise ValueError(f"k must be >= 2, got {k}")
        self.k = int(k)
        self.kmin: list[int] = []

    def merge_state(self, kmin) -> None:
        self.kmin = sorted(set(self.kmin) | set(kmin))[: self.k]

    def estimate(self) -> float:
        """Distinct-count estimate: exact |kmin| below k, else the
        standard (k-1)·SPACE/kmin[k-1] KMV estimator."""
        m = len(self.kmin)
        if m < self.k:
            return float(m)
        return (self.k - 1) * self._SPACE / float(self.kmin[-1])


def stream_distinct(
    stream: DataFrame,
    value_col: str,
    k: int = 256,
    monitor: KMVMonitor | None = None,
    checkpoint: str | None = None,
    path: str | None = None,
):
    """Maintain a continuous distinct-count estimate over a stream:
    each micro-batch builds its KMV state (one batch-sized pass, the
    guarded-prefilter build of aggregates.kmv_build) and merges it into
    k longs of driver state — never a distinct-values table. Returns
    (query, monitor); `monitor.estimate()` at any point is the
    stream-so-far estimate, whose underlying state is EXACTLY the
    batch build over all ingested rows.

    Pass parquet `path` to land (n_distinct_est, n_kmin) per batch
    under batch_id partitions with the replay-idempotent dynamic
    overwrite of streaming/sinks.py. Restart caveat as the other
    monitors: driver-memory state — treat the LAST batch_id partition
    as authoritative."""
    from distributedqueryengine_spark.operators.aggregates import kmv_build

    mon = monitor or KMVMonitor(k)

    def fold(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        st = kmv_build(batch_df, [], value_col, k=mon.k).collect()
        if not st:
            return
        mon.merge_state(st[0]["kmin"])
        if path is not None:
            from distributedqueryengine_spark.streaming.sinks import (
                write_batch_idempotent,
            )

            write_batch_idempotent(
                batch_df.sparkSession.createDataFrame(
                    [(float(mon.estimate()), len(mon.kmin))],
                    "n_distinct_est double, n_kmin int",
                ),
                batch_id,
                path,
            )

    writer = stream.writeStream.foreachBatch(fold).outputMode("append")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start(), mon
