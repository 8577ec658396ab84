"""Streaming ANN probe: online top-k retrieval over a PREBUILT index.

The batch amortization story (functions/similarity.py build_*/probe_*,
measured per-round in BENCH ann_amortized) has an online counterpart a
retrieval service actually runs: queries ARRIVE as a stream, the
LSH/IVF index is a static table built once, and every micro-batch is a
candidates-only probe — no corpus matmul at query time, ever.

Design: foreachBatch, not a streaming join. The probe ends in a
per-query top-k (row_number window), which Structured Streaming cannot
run in append mode over an unbounded stream — but each micro-batch IS
a bounded query set, exactly the `probe_lsh_index`/`probe_ivf_index`
batch contract. foreachBatch therefore reuses the batch probe
UNCHANGED (one code path to test, identical results), and the sink
callback routes each batch's (query_id, neighbor_id, cos, rnk) rows
wherever the service wants them. The index/corpus frames are closed
over as static DataFrames: persist() them (or read from a bucketed
table) so each micro-batch probe reads memory, not parquet.

At 100 TB: the index table is partitioned/bucketed by (tbl, bkt), each
micro-batch shuffles only queries x tables x occupancy candidate rows,
and index refresh is a slowly-changing rebuild swapped between
batches — the probe plan never touches more than candidates.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from distributedqueryengine_spark.functions.similarity import (
    probe_ivf_index,
    probe_lsh_index,
)


def lsh_probe_batcher(
    index: DataFrame,
    corpus: DataFrame,
    k: int,
    dim: int,
    **probe_params,
) -> Callable[[DataFrame], DataFrame]:
    """batch_df -> top-k DataFrame, closing over the static index.
    `probe_params` must match the build (seed / n_planes / n_tables)."""

    def probe(batch: DataFrame) -> DataFrame:
        return probe_lsh_index(index, corpus, batch, k, dim, **probe_params)

    return probe


def ivf_probe_batcher(
    index: DataFrame,
    corpus: DataFrame,
    centroids,
    k: int,
    n_probe: int = 4,
    **probe_params,
) -> Callable[[DataFrame], DataFrame]:
    """batch_df -> top-k DataFrame against a prebuilt IVF index."""

    def probe(batch: DataFrame) -> DataFrame:
        return probe_ivf_index(
            index, corpus, batch, centroids, k, n_probe=n_probe, **probe_params
        )

    return probe


def stream_ann_topk(
    query_stream: DataFrame,
    probe: Callable[[DataFrame], DataFrame],
    sink: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    query_name: str = "stream_ann_topk",
) -> StreamingQuery:
    """Run a query stream through a batch prober via foreachBatch.

    `probe` comes from lsh_probe_batcher / ivf_probe_batcher (or any
    batch_df -> DataFrame function); `sink(results, epoch_id)` receives
    each micro-batch's top-k rows. Checkpointing gives the standard
    restart semantics: a replayed epoch re-probes deterministically
    (same index, same queries -> same rows), so an idempotent sink
    (overwrite-by-epoch, upsert on (query_id, rnk)) yields
    exactly-once results.
    """

    def process(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        sink(probe(batch), epoch_id)

    return (
        query_stream.writeStream.queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(process)
        .start()
    )
