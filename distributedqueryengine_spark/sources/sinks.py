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
from pyspark.sql import functions as F


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


def compact_files(
    spark,
    path: str,
    target_file_mb: int = 128,
    fmt: str = "parquet",
    partition_by: Sequence[str] = (),
) -> dict:
    """Rewrite a (possibly partitioned) file dataset into ~target-sized
    files — the small-files maintenance op every long-lived lake needs:
    streaming sinks and per-batch ingests leave thousands of KB-sized
    files whose open/footer overhead dominates scans and whose count
    explodes driver listing time.

    Sizing reads the actual on-disk bytes via the Hadoop FileSystem
    (not a row-count guess, so compression ratio is accounted for),
    targets ceil(bytes / target_file_mb) output files, and rewrites
    with coalesce when shrinking (narrow, no shuffle) or repartition
    when growing. The rewrite is staged next to the source and moved in
    with two renames, so a concurrent reader sees either the old or the
    new layout, never a partial directory. Returns
    {files_before, files_after, bytes}.

    At cluster scale this runs per partition-directory (pass the
    partition path) on a maintenance schedule; compaction of a live
    table with readers mid-rename needs a table format's commit
    protocol (Delta/Iceberg) — out of scope here, as is concurrent
    writer coordination.
    """
    import math

    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    hconf = jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(hconf)
    if not fs.exists(hpath):
        raise FileNotFoundError(path)

    def data_files(p) -> int:
        # count data files only: _SUCCESS/.crc markers are bookkeeping
        n, it = 0, fs.listFiles(p, True)
        while it.hasNext():
            name = it.next().getPath().getName()
            if not name.startswith(("_", ".")):
                n += 1
        return n

    total_bytes = fs.getContentSummary(hpath).getLength()
    files_before = data_files(hpath)
    n_out = max(1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024)))

    df = spark.read.format(fmt).load(path)
    cur_parts = df.rdd.getNumPartitions()
    sized = df.coalesce(n_out) if n_out <= cur_parts else df.repartition(n_out)

    staging = path.rstrip("/") + "__compacting"
    writer = sized.write.format(fmt).mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(staging)

    backup = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "__precompact")
    if fs.exists(backup):
        fs.delete(backup, True)
    fs.rename(hpath, backup)
    fs.rename(jvm.org.apache.hadoop.fs.Path(staging), hpath)
    fs.delete(backup, True)

    return {
        "files_before": int(files_before),
        "files_after": data_files(hpath),
        "bytes": int(total_bytes),
    }


def merge_upsert_files(
    spark,
    path: str,
    updates: DataFrame,
    key_cols: Sequence[str],
    delete_col: str | None = None,
    fmt: str = "parquet",
) -> dict:
    """MERGE INTO for plain files: upsert `updates` into the dataset at
    `path` by key — matched keys take the update row, unmatched keys
    insert, and rows whose `delete_col` is true delete their key. The
    poor-man's transaction that raw parquet allows: the merged result
    writes to a staging dir and swaps in with two renames (readers see
    old-or-new, same contract as compact_files); full MVCC with
    concurrent writers needs a table format's commit protocol, which
    this deliberately does not fake.

    Plan shape: target LEFT ANTI updates on the keys (drop rows being
    replaced or deleted) UNION the surviving updates — one shuffle on
    the key, no driver materialization. Returns {rows_before,
    rows_after, n_updates}.
    """
    if not key_cols:
        raise ValueError("key_cols must name the merge key")
    target = spark.read.format(fmt).load(path)
    required = set(target.columns) | set(key_cols)
    provided = set(updates.columns) - ({delete_col} if delete_col else set())
    missing = required - provided
    if missing:
        raise ValueError(
            f"updates frame is missing target columns {sorted(missing)}; "
            "a MERGE row must carry the full row it replaces/inserts"
        )
    rows_before = target.count()
    n_updates = updates.count()

    keys = list(key_cols)
    survivors = target.join(updates.select(*keys).distinct(), keys, "left_anti")
    incoming = (
        updates.filter(~F.coalesce(F.col(delete_col), F.lit(False))).drop(delete_col)
        if delete_col
        else updates
    )
    merged = survivors.unionByName(incoming.select(*target.columns))

    staging = path.rstrip("/") + "__merging"
    merged.write.format(fmt).mode("overwrite").save(staging)

    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(hconf)
    backup = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "__premerge")
    if fs.exists(backup):
        fs.delete(backup, True)
    fs.rename(hpath, backup)
    fs.rename(jvm.org.apache.hadoop.fs.Path(staging), hpath)
    fs.delete(backup, True)

    rows_after = spark.read.format(fmt).load(path).count()
    return {
        "rows_before": int(rows_before),
        "rows_after": int(rows_after),
        "n_updates": int(n_updates),
    }
