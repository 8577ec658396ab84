"""Data quality on ingest: run the expectations battery per
micro-batch and route the verdicts.

The batch framework (operators/expectations.py) already evaluates all
row-level checks in ONE aggregate pass; a micro-batch is a bounded
frame, so foreachBatch reuses it unchanged — each batch yields one
report frame (check, kind, n_failed, n_checked, passed) stamped with
the epoch, and the sink decides policy (alert, quarantine the batch,
or just record). Table-level checks that need cross-batch state
(global uniqueness) are deliberately NOT evaluated per batch — a
per-batch unique() would pass on every batch while the table
accumulates duplicates; run those on the landed table, or use
dropDuplicatesWithinWatermark upstream (streaming/dedup.py) for the
bounded-state version.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from distributedqueryengine_spark.operators.expectations import (
    Check,
    run_expectations,
)


def stream_expectations(
    stream: DataFrame,
    checks: Sequence[Check],
    sink: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    query_name: str = "stream_expectations",
) -> StreamingQuery:
    """Evaluate row-level `checks` on every micro-batch; `sink(report,
    epoch_id)` receives the per-batch report with an added epoch_id
    column. Table-level checks (unique/references) raise — see module
    docstring for why per-batch evaluation of those is a false
    comfort."""
    bad = [c.name for c in checks if c.kind != "row"]
    if bad:
        raise ValueError(
            f"table-level checks are not meaningful per micro-batch: {bad}; "
            "run them on the landed table instead"
        )

    def process(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        report = run_expectations(batch, checks).withColumn(
            "epoch_id", F.lit(epoch_id).cast("long")
        )
        sink(report, epoch_id)

    return (
        stream.writeStream.queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(process)
        .start()
    )
