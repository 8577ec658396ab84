"""Streaming SCD2 maintenance: a CDC stream continuously maintains a
type-2 dimension on plain parquet.

The lakehouse pattern this composes: changes arrive as a stream →
each micro-batch REBUILDS only the touched keys' version histories
(operators/cdc.scd2_from_changes over history ∪ new changes) → the
rebuilt slices land via sources/sinks.merge_upsert_files, which
replaces exactly the touched keys' rows (and with `partition_by`,
rewrites only the touched partitions — the r8 pruned-merge shape).

Why rebuild instead of append: a LATE change (older event time than
rows already in the dimension) legally rewrites history — valid_to
boundaries move, versions renumber. Rebuilding the touched keys from
their reconstructed change log (each stored version IS a change at
valid_from) plus the batch is the only shape that is both correct
under disorder and idempotent: replaying a batch reproduces the
identical dimension, so foreachBatch's at-least-once contract yields
effectively-once results.

Per-batch cost is bounded by (touched keys' history + batch size) —
never dimension-sized — and the on-disk dimension IS the state: no
streaming state store, restart needs only the checkpointed source
offsets. Same-timestamp changes order deterministically by the
attribute values (documented tiebreak; give changes unique timestamps
per key if you need a stronger contract).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_scd2_batch(
    spark,
    changes: DataFrame,
    dim_path: str,
    key_cols: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
    fmt: str = "parquet",
    partition_by: Sequence[str] = (),
) -> dict:
    """Apply one batch of changes to the SCD2 dimension at `dim_path`
    (creating it if absent). Returns the merge stats dict plus
    {'n_changes', 'n_keys'}. Also usable standalone for batch
    incremental loads."""
    from distributedqueryengine_spark.operators.cdc import scd2_from_changes
    from distributedqueryengine_spark.sources.sinks import merge_upsert_files

    keys = list(key_cols)
    attrs = list(attr_cols)
    tiebreak = attrs  # deterministic same-ts ordering (module docstring)
    n_changes = changes.count()
    if n_changes == 0:
        return {"n_changes": 0, "n_keys": 0}

    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(dim_path)
    exists = hpath.getFileSystem(hconf).exists(hpath)

    if not exists:
        dim = scd2_from_changes(changes, keys, ts_col, attrs, tiebreak=tiebreak)
        writer = dim.write.format(fmt).mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*list(partition_by))
        writer.save(dim_path)
        return {
            "n_changes": int(n_changes),
            "n_keys": int(changes.select(*keys).distinct().count()),
            "created": True,
        }

    dim = spark.read.format(fmt).load(dim_path)
    touched = changes.select(*keys).distinct()
    # touched keys' stored history, re-expressed as its change log:
    # every version row IS a change at valid_from
    history = dim.join(F.broadcast(touched), keys, "left_semi").select(
        *keys, *attrs, F.col("valid_from").alias(ts_col)
    )
    log = history.unionByName(changes.select(*keys, *attrs, ts_col))
    rebuilt = scd2_from_changes(log, keys, ts_col, attrs, tiebreak=tiebreak)
    stats = merge_upsert_files(
        spark,
        dim_path,
        rebuilt,
        keys,
        fmt=fmt,
        partition_by=partition_by,
    )
    stats["n_changes"] = int(n_changes)
    stats["n_keys"] = int(touched.count())
    return stats


def stream_scd2_apply(
    changes_stream: DataFrame,
    dim_path: str,
    key_cols: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
    fmt: str = "parquet",
    partition_by: Sequence[str] = (),
    sink: list | None = None,
    checkpoint: str | None = None,
):
    """Continuously maintain the dimension from a change stream: each
    micro-batch runs apply_scd2_batch (touched-keys rebuild + pruned
    merge). Per-batch stats append to `sink`. Returns the started
    StreamingQuery."""
    out = sink if sink is not None else []

    def fold(batch_df, batch_id):
        stats = apply_scd2_batch(
            batch_df.sparkSession,
            batch_df,
            dim_path,
            key_cols,
            ts_col,
            attr_cols,
            fmt=fmt,
            partition_by=partition_by,
        )
        stats["batch_id"] = batch_id
        out.append(stats)

    writer = changes_stream.writeStream.foreachBatch(fold).outputMode("append")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()
