"""Sinks: parquet/orc/csv/json writers with partitioning & bucketing.

The reference has NO sink — it computes the final DataTable, names it
"aaa", and drops it (reference QueryService.asmx.cs:85-88). Here
results land as columnar files with layout controls that matter at
100 TB:

- `partition_by`: directory partitioning → partition pruning on read
  (the scalable successor to the reference's hardcoded horizontal
  fragment catalog, QueryService.asmx.cs:338-396).
- `bucket_by`: hash bucketing + sortWithinPartitions → later joins /
  aggs on the bucket key skip the shuffle entirely (saveAsTable path).
- `max_records_per_file` caps file sizes so downstream scans split
  evenly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_files(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: Sequence[str] = (),
    max_records_per_file: int | None = None,
    **options,
) -> None:
    """Write to files (parquet/orc/csv/json), optionally dir-partitioned."""
    writer = df.write.format(fmt).mode(mode).options(**options)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.save(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] = (),
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.

    Joining two tables bucketed on the same key with the same bucket
    count is shuffle-free — the physical plan shows no Exchange on
    either side. This is the co-located-join answer to the reference's
    manual site placement (QueryService.asmx.cs:507-533).
    """
    writer = df.write.format(fmt).mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)
