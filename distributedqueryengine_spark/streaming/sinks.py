"""Streaming sinks: effectively-once parquet output on plain files.

foreachBatch gives at-least-once: after a crash between "batch wrote"
and "offsets committed", the batch REPLAYS, and a naive append sink
duplicates it. The standard fix needs no table format: make the write
IDEMPOTENT by keying the output layout on the deterministic batch id —
each micro-batch lands in its own `batch_id=<n>` partition (the
column name is reserved — rename any input column of that name) via
DYNAMIC partition overwrite, so a replay of batch n rewrites exactly
partition n byte-for-byte-equivalent and touches nothing else.
Downstream readers just read the directory (the `batch_id` column
doubles as ingestion provenance) — the same contract
streaming/annprobe.py documents for its deterministic re-probe,
packaged as a reusable sink.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_batch_idempotent(
    batch_df: DataFrame,
    batch_id: int,
    path: str,
    partition_by: Sequence[str] = (),
) -> None:
    """The foreachBatch body: dynamic-overwrite this batch's own
    partition only. Exposed separately so tests (and custom sinks
    composing extra logic) can invoke the exact replay path."""
    (
        batch_df.withColumn("batch_id", F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id", *list(partition_by))
        .parquet(path)
    )


def exactly_once_parquet_sink(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    partition_by: Sequence[str] = (),
):
    """Start the stream into an effectively-once parquet directory at
    `path` (see module docstring). Returns the StreamingQuery. The
    checkpoint is REQUIRED — without it the engine cannot replay the
    same batch ids, which is the whole contract."""
    if not checkpoint:
        raise ValueError("checkpoint is required for effectively-once output")

    def write(batch_df, batch_id):
        write_batch_idempotent(batch_df, batch_id, path, partition_by)

    return (
        stream.writeStream.foreachBatch(write)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .start()
    )
