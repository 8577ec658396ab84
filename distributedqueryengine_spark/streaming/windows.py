"""Time-window aggregations: tumbling / sliding / session, batch+stream.

The reference has no streaming of any kind (SURVEY §2.2). Built on
Spark's `window`/`session_window` expressions, which work identically
over batch DataFrames and Structured Streaming inputs — the batch form
is the oracle-checkable semantics, the streaming form (with watermark)
is exercised in tests/test_streaming.py against batch recomputation.

Window starts are reported as epoch seconds (bigint) so results are
timezone-representation-proof across engines.

Scale: windowed groupBy is a standard partial+final hash aggregate on
(window, keys); session windows use Spark's native session merge. With
watermarks, streaming state is bounded — late rows beyond the
watermark are dropped, which tests verify explicitly.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _epoch(col: Column) -> Column:
    return F.unix_timestamp(col)


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    width: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
) -> DataFrame:
    """Tumbling windows of `width` (e.g. '1 hour'): each row in exactly
    one window. Output key: window_start (epoch seconds)."""
    out = df.groupBy(F.window(ts_col, width), *keys).agg(*aggs)
    return out.select(
        _epoch(F.col("window.start")).alias("window_start"), *keys, *[c for c in out.columns if c != "window" and c not in keys]
    )


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    width: str,
    slide: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
) -> DataFrame:
    """Sliding windows (width, slide): each row lands in width/slide
    windows (Spark expands via an internal explode)."""
    out = df.groupBy(F.window(ts_col, width, slide), *keys).agg(*aggs)
    return out.select(
        _epoch(F.col("window.start")).alias("window_start"), *keys, *[c for c in out.columns if c != "window" and c not in keys]
    )


def session_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
) -> DataFrame:
    """Session windows: per-key activity runs separated by > `gap`.

    Uses the native session_window expression (merging aggregation);
    output start/end as epoch seconds."""
    out = df.groupBy(F.session_window(ts_col, gap), *keys).agg(*aggs)
    return out.select(
        _epoch(F.col("session_window.start")).alias("session_start"),
        _epoch(F.col("session_window.end")).alias("session_end"),
        *keys,
        *[c for c in out.columns if c != "session_window" and c not in keys],
    )


def stream_from_table(
    spark,
    sf_dir: str,
    name: str = "events",
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Replay a fixture parquet table as a bounded stream.

    The nanos→micros ts conversion mirrors session.load_table (the
    parquet stores TIMESTAMP(NANOS), unreadable natively by Spark).
    """
    import os
    import tempfile

    from distributedqueryengine_spark.session import load_table

    batch = load_table(spark, sf_dir, name)
    # readStream requires a *directory* source; fixtures are single
    # files, so stage a symlink dir (no data copy).
    src = os.path.join(sf_dir, f"{name}.parquet")
    stage = os.path.join(
        tempfile.gettempdir(), "dqe_stream_src", sf_dir.strip("/").replace("/", "_"), name
    )
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, f"{name}.parquet")
    if not os.path.exists(link):
        os.symlink(src, link)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(stage)
    )
    ts_type = dict(stream.dtypes).get("ts")
    if name == "events" and ts_type == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    elif name == "events" and ts_type == "timestamp_ntz":
        # micros-NTZ fixture generation: same normalization as
        # session.load_table (UTC session TZ → identical instants).
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    assert stream.schema == batch.schema
    return stream


def run_stream_to_memory(agg_df: DataFrame, query_name: str, output_mode: str = "complete"):
    """Drive a streaming aggregation to completion against the bounded
    fixture stream; results land in the in-memory table `query_name`."""
    q = (
        agg_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return q
