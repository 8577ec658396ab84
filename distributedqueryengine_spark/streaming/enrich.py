"""Stream enrichment against a slowly-changing dimension,
point-in-time correct.

Joining a live event stream to a dimension by key alone silently
applies TODAY's attributes to YESTERDAY's events (the classic
time-travel bug in attribution pipelines). The correct join is against
the SCD2 dimension built by operators/cdc.py: match the version whose
[valid_from, valid_to) interval contains the EVENT's timestamp.

Design: foreachBatch — each micro-batch is a bounded frame, so the
enrichment is a plain batch join with the interval predicate, and the
dimension can be re-read/swap-refreshed between batches (a stream-
static join would freeze the dim at query start for some sources, and
Structured Streaming cannot re-broadcast mid-query). The dim side is
broadcast when small (dimension tables usually are); at terabyte-dim
scale drop the hint and let AQE pick — the equi-key part of the
predicate keeps it a hash join either way, never a nested loop.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def enrich_point_in_time(
    events: DataFrame,
    dim: DataFrame,
    key_col: str,
    ts_col: str,
    broadcast_dim: bool = True,
) -> DataFrame:
    """Batch point-in-time join: each event row picks the dim version
    valid AT its own timestamp (half-open [valid_from, valid_to), the
    cdc.scd2_from_changes convention; valid_* carry the change log's
    own type — both timestamp and epoch-second-long encodings are
    handled, compared in epoch seconds). Events with no valid version
    (before the key's first change, or unknown key) keep NULL dim
    columns — LEFT join, auditable downstream."""
    missing = {key_col, "valid_from", "valid_to"} - set(dim.columns)
    if missing:
        raise ValueError(
            f"dim is missing {sorted(missing)} — pass an SCD2 frame from "
            "cdc.scd2_from_changes (key + valid_from/valid_to intervals)"
        )
    ev_sec = F.unix_timestamp(F.col(f"e.{ts_col}"))
    d = F.broadcast(dim) if broadcast_dim else dim
    cond = (
        (F.col(f"e.{key_col}") == F.col(f"d.{key_col}"))
        & (F.unix_timestamp(F.col("d.valid_from")) <= ev_sec
           if dict(dim.dtypes).get("valid_from", "").startswith("timestamp")
           else (F.col("d.valid_from") <= ev_sec))
        & (
            F.col("d.valid_to").isNull()
            | (F.unix_timestamp(F.col("d.valid_to")) > ev_sec
               if dict(dim.dtypes).get("valid_to", "").startswith("timestamp")
               else (F.col("d.valid_to") > ev_sec))
        )
    )
    dim_cols = [c for c in dim.columns if c != key_col]
    return (
        events.alias("e")
        .join(d.alias("d"), cond, "left")
        .select("e.*", *[F.col(f"d.{c}") for c in dim_cols])
    )


def stream_enrich_scd2(
    event_stream: DataFrame,
    dim_provider: Callable[[], DataFrame],
    key_col: str,
    ts_col: str,
    sink: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    query_name: str = "stream_enrich_scd2",
    broadcast_dim: bool = True,
) -> StreamingQuery:
    """foreachBatch enrichment: `dim_provider()` is called per
    micro-batch (return a cached frame for a static dim, or re-read a
    refreshed table path for a live one — the swap is atomic per
    batch), each batch runs enrich_point_in_time, and `sink(df,
    epoch_id)` receives the enriched rows. Deterministic re-enrichment
    on replay (same dim + same events → same rows) gives the usual
    idempotent-sink exactly-once story."""

    def process(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        sink(
            enrich_point_in_time(
                batch, dim_provider(), key_col, ts_col, broadcast_dim
            ),
            epoch_id,
        )

    return (
        event_stream.writeStream.queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(process)
        .start()
    )
