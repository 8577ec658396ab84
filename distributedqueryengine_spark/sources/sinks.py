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
- `compact_files` / `merge_upsert_files`: the lake-maintenance pair.
  Both are partition-pruned: a merge or compaction against a
  dir-partitioned dataset rewrites ONLY the partitions it touches —
  sibling partition directories are left byte-identical — so a 1-key
  upsert into a 100 TB table moves one partition's bytes, not 100 TB.

Swap protocol (shared by compact/merge): the rewrite is staged next to
the live directory and moved in with two renames whose boolean results
are CHECKED. Failure contract:
  * rename(live→backup) fails → raise; nothing moved, live intact.
  * rename(staging→live) fails → backup is renamed back into place and
    the error raised; the previous data survives. Only after the new
    live path verifiably exists is the backup deleted.
  * a hard crash BETWEEN the two renames leaves `<path>__pre*` holding
    the full previous dataset and no live dir; `recover_swap(path)`
    restores it. This is the strongest contract plain files allow —
    true MVCC with concurrent writers needs a table format's commit
    protocol (Delta/Iceberg), which this deliberately does not fake.
"""

from __future__ import annotations

import math
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


# --------------------------------------------------------------------------
# Hadoop FS helpers: checked renames, footer-only row counts, dir listing
# --------------------------------------------------------------------------


def _fs(spark, path: str):
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return jvm, hconf, hpath.getFileSystem(hconf)


def _hpath(jvm, path: str):
    return jvm.org.apache.hadoop.fs.Path(path)


def _data_files(fs, p) -> list:
    """Recursively list data files (skip _SUCCESS / dotfiles / .crc)."""
    out, it = [], fs.listFiles(p, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if not name.startswith(("_", ".")):
            out.append(st)
    return out


def _parquet_rows(jvm, hconf, fs, p) -> int:
    """Row count from parquet FOOTERS only — no data pages read, no Spark
    job. This is how merge/compact report row stats without the two
    stats-only full scans the naive implementation pays."""
    total = 0
    for st in _data_files(fs, p):
        inf = jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            st.getPath(), hconf
        )
        reader = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(inf)
        try:
            total += reader.getRecordCount()
        finally:
            reader.close()
    return int(total)


def _rename(fs, src, dst) -> bool:
    """Hadoop rename with its two failure modes normalized: some
    FileSystems return false, others (e.g. RawLocalFileSystem on a
    missing source) raise — both become False here."""
    try:
        return bool(fs.rename(src, dst))
    except Exception:
        return False


def _checked_rename(fs, src, dst, what: str) -> None:
    if not _rename(fs, src, dst):
        raise IOError(f"rename failed ({what}): {src} -> {dst}")


def _esc_rel(rel: str) -> str:
    """Invertible escape of a partition rel-path for use in a sibling dir
    name: '%'→'%25' first, then '/'→'%2F'. Lossless (unlike a plain
    '/'→'_' replace), so recovery can map a backup name back to the
    exact partition directory it protects."""
    return rel.replace("%", "%25").replace("/", "%2F")


def _unesc_rel(s: str) -> str:
    return s.replace("%2F", "/").replace("%25", "%")


def _swap_in(jvm, fs, live, staging, backup) -> None:
    """Move `staging` into place at `live`, retiring the previous dir via
    `backup`. Every rename's boolean result is checked; on a failed
    second rename the backup is restored before raising, and the backup
    is deleted only after the new live dir verifiably exists.

    A pre-existing `backup` is stale residue ONLY when `live` exists; a
    backup present while `live` is missing is the sole surviving copy of
    the previous data (crash between the two renames) and is never
    deleted — the caller must run recover_swap() first."""
    if fs.exists(backup):
        if not fs.exists(live):
            raise IOError(
                f"backup {backup} exists while live {live} is missing — "
                "a previous swap crashed mid-rename; run recover_swap() "
                "before retrying (refusing to delete the only copy)"
            )
        fs.delete(backup, True)
    live_existed = fs.exists(live)
    if live_existed:
        _checked_rename(fs, live, backup, "live -> backup")
    parent = live.getParent()
    if parent is not None and not fs.exists(parent):
        fs.mkdirs(parent)
    if not _rename(fs, staging, live):
        if live_existed and _rename(fs, backup, live):
            raise IOError(
                f"rename failed (staging -> live): {staging} -> {live}; "
                "previous data restored from backup"
            )
        raise IOError(
            f"rename failed (staging -> live): {staging} -> {live}; "
            f"previous data is at {backup} — run recover_swap()"
        )
    if live_existed:
        if not fs.exists(live):  # paranoia: never delete the only copy
            raise IOError(f"post-swap verification failed: {live} missing")
        fs.delete(backup, True)


def recover_swap(spark, path: str) -> list[str] | None:
    """Recover from a crash mid-swap, covering BOTH swap granularities:

    * whole-dataset: `<path>__precompact` / `<path>__premerge` exists and
      `path` does not → rename the backup back into place.
    * per-partition (pruned merge, incremental compaction):
      `<path>__precompact__<esc-rel>` / `<path>__premerge__<esc-rel>`
      siblings — for each, if the partition dir `<path>/<rel>` is
      missing, the backup is restored; if the partition dir exists, the
      swap's second rename had already succeeded, so the backup is
      stale and is deleted to complete the swap.

    Stale STAGING residue (`__compacting`, `__compacting__*`,
    `__merging`, `__touched`) is deleted last — staging is never
    authoritative (the backup is), so dropping it just means the
    maintenance op is redone.

    Returns the list of recovery actions taken (suffix strings, e.g.
    ['__premerge', '__precompact__p=a']), or None if no recovery was
    needed. Safe to call unconditionally at startup; compact_files and
    merge_upsert_files call it automatically on entry."""
    jvm, _, fs = _fs(spark, path)
    base = path.rstrip("/")
    live = _hpath(jvm, base)
    actions: list[str] = []
    for suffix in ("__precompact", "__premerge"):
        backup = _hpath(jvm, base + suffix)
        if fs.exists(backup) and not fs.exists(live):
            _checked_rename(fs, backup, live, "recover backup -> live")
            actions.append(suffix)

    # Per-partition backups live as suffixed SIBLINGS of the dataset root.
    parent = live.getParent()
    basename = live.getName()
    staging_residue = []
    if parent is not None and fs.exists(parent):
        for st in fs.listStatus(parent):
            name = st.getPath().getName()
            if not name.startswith(basename + "__"):
                continue
            restored = False
            for kind in ("__precompact__", "__premerge__"):
                if name.startswith(basename + kind):
                    rel = _unesc_rel(name[len(basename + kind):])
                    part_live = _hpath(jvm, base + "/" + rel)
                    if fs.exists(part_live):
                        # second rename already landed: finish the swap
                        fs.delete(st.getPath(), True)
                        actions.append(kind.rstrip("_") + "__" + rel + " (finalized)")
                    else:
                        _checked_rename(
                            fs, st.getPath(), part_live,
                            f"recover partition backup -> {rel}",
                        )
                        actions.append(kind.rstrip("_") + "__" + rel)
                    restored = True
                    break
            if restored:
                continue
            # Exact staging names only: '<base>__compacting' (whole-table)
            # or '<base>__compacting__<escaped-rel>' (per-partition). A
            # mere prefix ('<base>__compacting_old') is NOT ours — never
            # delete a directory this protocol didn't create.
            if name == basename + "__merging" or name == basename + "__touched" \
                    or name == basename + "__compacting" \
                    or name.startswith(basename + "__compacting__"):
                staging_residue.append(st.getPath())
    for sp in staging_residue:
        fs.delete(sp, True)
        actions.append(sp.getName()[len(basename):] + " (staging dropped)")
    return actions or None


def _leaf_partition_dirs(jvm, fs, root, depth: int) -> list[str]:
    """Relative paths of partition leaf dirs exactly `depth` levels below
    `root` (e.g. depth=2 → 'p1=a/p2=b'). Driver-side listing of
    partition DIRECTORIES only — O(#partitions), not O(#files)."""
    rels = [""]
    for _ in range(depth):
        nxt = []
        for rel in rels:
            p = _hpath(jvm, str(root) + ("/" + rel if rel else ""))
            for st in fs.listStatus(p):
                if st.isDirectory() and not st.getPath().getName().startswith(
                    ("_", ".")
                ):
                    nxt.append(
                        (rel + "/" if rel else "") + st.getPath().getName()
                    )
        rels = nxt
    return rels


# --------------------------------------------------------------------------
# Compaction
# --------------------------------------------------------------------------


def _compact_one_dir(
    spark, jvm, hconf, fs, root: str, rel: str, target_file_mb: int, fmt: str,
    zorder_by: Sequence[str] = (),
    sort_within: Sequence[str] = (),
) -> dict:
    """Compact one leaf partition dir `<root>/<rel>`. Staging and backup
    are suffixed SIBLINGS of the dataset root (`<root>__compacting__…`,
    `<root>__precompact__…`), never inside the tree — a concurrent
    reader of `root` must not see a staging dir as a bogus partition
    value, and a crash must leave residue where recover_swap() can
    enumerate it (root-sibling scan), not inside partition discovery."""
    dirpath = root.rstrip("/") + "/" + rel
    hdir = _hpath(jvm, dirpath)
    files = _data_files(fs, hdir)
    total_bytes = sum(st.getLen() for st in files)
    files_before = len(files)
    n_out = max(1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024)))

    df = spark.read.format(fmt).load(dirpath)
    if zorder_by:
        from distributedqueryengine_spark.operators.zorder import (
            zorder_repartition,
        )

        sized = zorder_repartition(df, list(zorder_by), n_out)
    else:
        cur_parts = df.rdd.getNumPartitions()
        sized = (
            df.coalesce(n_out) if n_out <= cur_parts else df.repartition(n_out)
        )
    if sort_within:
        # keep per-file min/max footer ranges tight on the listed
        # columns (e.g. the IVF layout's `cell`) so row-group skipping
        # survives the rewrite
        sized = sized.sortWithinPartitions(*sort_within)

    staging = root.rstrip("/") + "__compacting__" + _esc_rel(rel)
    sized.write.format(fmt).mode("overwrite").save(staging)
    _swap_in(
        jvm,
        fs,
        hdir,
        _hpath(jvm, staging),
        _hpath(jvm, root.rstrip("/") + "__precompact__" + _esc_rel(rel)),
    )
    return {
        "files_before": files_before,
        "files_after": len(_data_files(fs, hdir)),
        "bytes": int(total_bytes),
    }


def _compact_files_impl(
    spark,
    path: str,
    target_file_mb: int = 128,
    fmt: str = "parquet",
    partition_by: Sequence[str] = (),
    incremental: bool = False,
    zorder_by: Sequence[str] = (),
    sort_within: Sequence[str] = (),
) -> dict:
    """Rewrite a (possibly partitioned) file dataset into ~target-sized
    files — the small-files maintenance op every long-lived lake needs:
    streaming sinks and per-batch ingests leave thousands of KB-sized
    files whose open/footer overhead dominates scans and whose count
    explodes driver listing time.

    Two modes:

    * full (default): size the whole dataset from on-disk bytes (not a
      row-count guess, so compression ratio is accounted for), target
      ceil(bytes / target_file_mb) files, coalesce when shrinking
      (narrow, no shuffle) / repartition when growing, stage + swap.
    * incremental (requires `partition_by`): the 100 TB maintenance
      shape. Each leaf partition directory is examined from its LISTING
      only (file count + bytes — no data read); a partition is rewritten
      only when it holds more files than its byte size needs. Cold,
      already-compact partitions are never touched — their files and
      mtimes stay byte-identical — so a nightly compaction of a
      petabyte table costs only the fragmented partitions' bytes.

    Swap safety: see the module docstring — checked renames, backup
    restored on failure, `recover_swap()` for mid-swap crashes.
    Returns {files_before, files_after, bytes[, partitions_total,
    partitions_compacted]}.
    """
    jvm, hconf, fs = _fs(spark, path)
    hpath = _hpath(jvm, path)
    recover_swap(spark, path)  # self-heal any prior mid-swap crash first
    if not fs.exists(hpath):
        raise FileNotFoundError(path)

    if incremental:
        if not partition_by:
            raise ValueError("incremental compaction requires partition_by")
        rels = _leaf_partition_dirs(jvm, fs, hpath, len(partition_by))
        stats = {
            "files_before": 0,
            "files_after": 0,
            "bytes": 0,
            "partitions_total": len(rels),
            "partitions_compacted": 0,
        }
        for rel in rels:
            dirpath = path.rstrip("/") + "/" + rel
            files = _data_files(fs, _hpath(jvm, dirpath))
            nbytes = sum(st.getLen() for st in files)
            needed = max(1, math.ceil(nbytes / (target_file_mb * 1024 * 1024)))
            stats["files_before"] += len(files)
            stats["bytes"] += int(nbytes)
            if len(files) > needed:
                one = _compact_one_dir(
                    spark, jvm, hconf, fs, path, rel, target_file_mb, fmt,
                    zorder_by=zorder_by, sort_within=sort_within,
                )
                stats["partitions_compacted"] += 1
                stats["files_after"] += one["files_after"]
            else:
                stats["files_after"] += len(files)
        return stats

    files = _data_files(fs, hpath)
    total_bytes = sum(st.getLen() for st in files)
    files_before = len(files)
    n_out = max(1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024)))

    df = spark.read.format(fmt).load(path)
    if zorder_by:
        from distributedqueryengine_spark.operators.zorder import (
            zorder_repartition,
        )

        sized = zorder_repartition(df, list(zorder_by), n_out)
    else:
        cur_parts = df.rdd.getNumPartitions()
        sized = (
            df.coalesce(n_out) if n_out <= cur_parts else df.repartition(n_out)
        )
    if sort_within:
        sized = sized.sortWithinPartitions(*sort_within)

    staging = path.rstrip("/") + "__compacting"
    writer = sized.write.format(fmt).mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(staging)

    _swap_in(
        jvm,
        fs,
        hpath,
        _hpath(jvm, staging),
        _hpath(jvm, path.rstrip("/") + "__precompact"),
    )
    return {
        "files_before": int(files_before),
        "files_after": len(_data_files(fs, hpath)),
        "bytes": int(total_bytes),
    }


# --------------------------------------------------------------------------
# MERGE INTO emulation
# --------------------------------------------------------------------------


def _merge_upsert_files_impl(
    spark,
    path: str,
    updates: DataFrame,
    key_cols: Sequence[str],
    delete_col: str | None = None,
    fmt: str = "parquet",
    partition_by: Sequence[str] = (),
    allow_schema_evolution: bool = False,
) -> dict:
    """MERGE INTO for plain files: upsert `updates` into the dataset at
    `path` by key — matched keys take the update row, unmatched keys
    insert, and rows whose `delete_col` is true delete their key.

    Scale shape — partition-pruned merge: when `partition_by` names the
    dataset's directory-partition columns (which must also be present
    in `updates`), ONLY the partitions containing touched keys are
    rewritten. The affected-partition set is computed from `updates`
    (bounded by the number of touched partitions, not by target size),
    the target read is statically pruned to those partitions, and the
    swap happens per partition directory — untouched sibling partitions
    keep their exact files and mtimes. A 1-row upsert into a 100 TB
    table therefore rewrites one partition, not 100 TB. Contract: a
    key's partition value must be stable between target and updates
    (the universal lake-MERGE pruning precondition — a key that "moves"
    partitions would leave its old copy behind; use the unpartitioned
    path for that). A partition whose every row is deleted has its
    directory removed.

    Without `partition_by` the whole dataset is rewritten (the only
    correct shape when no pruning structure exists).

    Plan shape: target(affected) LEFT ANTI update-keys UNION surviving
    updates — one shuffle on the key, no driver materialization of
    data rows. Row stats come from parquet FOOTERS (metadata-only; for
    non-parquet formats they are None rather than paid for with full
    scans). Swap safety: checked renames, backup restore on failure,
    `recover_swap()` for mid-swap crashes (module docstring).

    Returns {rows_before, rows_after, n_updates, partitions_rewritten}
    — rows_before/rows_after scoped to the affected partitions when
    pruning (sibling partitions are untouched by construction).
    """
    if not key_cols:
        raise ValueError("key_cols must name the merge key")
    jvm, hconf, fs = _fs(spark, path)
    hpath = _hpath(jvm, path)
    recover_swap(spark, path)  # self-heal any prior mid-swap crash first
    if not fs.exists(hpath):
        raise FileNotFoundError(path)

    target = spark.read.format(fmt).load(path)
    required = set(target.columns) | set(key_cols)
    provided = set(updates.columns) - ({delete_col} if delete_col else set())
    missing = required - provided
    if missing:
        raise ValueError(
            f"updates frame is missing target columns {sorted(missing)}; "
            "a MERGE row must carry the full row it replaces/inserts"
        )
    new_cols = [
        c for c in updates.columns
        if c not in target.columns and c != delete_col
    ]
    if new_cols and not allow_schema_evolution:
        raise ValueError(
            f"updates carry columns not in the target {new_cols}; pass "
            "allow_schema_evolution=True to add them (existing rows read "
            "them as NULL). NOTE for partition-pruned merges: untouched "
            "partitions keep their old file schema, so readers must "
            "enable parquet mergeSchema until a full rewrite"
        )
    if new_cols:
        # widen the target in-plan: old rows carry NULL for new columns;
        # rewritten partitions land with the full evolved schema
        upd_types = {f.name: f.dataType for f in updates.schema.fields}
        for c in new_cols:
            target = target.withColumn(c, F.lit(None).cast(upd_types[c]))
    keys = list(key_cols)
    parts = list(partition_by)
    if parts and (set(parts) - set(updates.columns)):
        raise ValueError(
            f"partition-pruned merge needs partition columns {parts} in updates"
        )

    incoming = (
        updates.filter(~F.coalesce(F.col(delete_col), F.lit(False))).drop(delete_col)
        if delete_col
        else updates
    )
    # Align incoming rows to the target's exact column types: a wider
    # update schema (e.g. long vs the target's int) would otherwise write
    # mixed-physical-type files that fail on read.
    incoming = incoming.select(
        [F.col(f.name).cast(f.dataType).alias(f.name) for f in target.schema.fields]
    )

    footer_rows = (
        (lambda p: _parquet_rows(jvm, hconf, fs, p)) if fmt == "parquet" else None
    )

    if parts:
        # Affected partition-value tuples, collected from the SMALL side.
        touched = [tuple(r) for r in updates.select(*parts).distinct().collect()]
        n_updates = updates.count()
        pred = None
        for tup in touched:
            clause = F.lit(True)
            for c, v in zip(parts, tup):
                clause = clause & (
                    F.col(c).isNull() if v is None else (F.col(c) == F.lit(v))
                )
            pred = clause if pred is None else (pred | clause)
        affected = target.filter(pred) if pred is not None else target.limit(0)
        survivors = affected.join(updates.select(*keys).distinct(), keys, "left_anti")
        merged = survivors.unionByName(incoming.select(*target.columns))

        # Let Spark's writer produce the canonical partition dir names —
        # both for the merged data and (via a 1-row-per-partition marker
        # write) for partitions whose rows were all deleted.
        staging = path.rstrip("/") + "__merging"
        merged.write.format(fmt).mode("overwrite").partitionBy(*parts).save(staging)
        markers = path.rstrip("/") + "__touched"
        (
            updates.select(*parts)
            .distinct()
            .withColumn("__touch", F.lit(1))
            .write.format(fmt)
            .mode("overwrite")
            .partitionBy(*parts)
            .save(markers)
        )
        hstaging, hmarkers = _hpath(jvm, staging), _hpath(jvm, markers)
        touched_rels = _leaf_partition_dirs(jvm, fs, hmarkers, len(parts))
        staged_rels = set(_leaf_partition_dirs(jvm, fs, hstaging, len(parts)))

        rows_before = (
            sum(
                footer_rows(_hpath(jvm, path.rstrip("/") + "/" + rel))
                for rel in touched_rels
                if fs.exists(_hpath(jvm, path.rstrip("/") + "/" + rel))
            )
            if footer_rows
            else None
        )
        rewritten = []
        for rel in sorted(touched_rels):
            live = _hpath(jvm, path.rstrip("/") + "/" + rel)
            if rel in staged_rels:
                _swap_in(
                    jvm,
                    fs,
                    live,
                    _hpath(jvm, staging + "/" + rel),
                    _hpath(jvm, path.rstrip("/") + "__premerge__" + _esc_rel(rel)),
                )
                rewritten.append(rel)
            elif fs.exists(live):  # every row of this partition was deleted
                fs.delete(live, True)
                rewritten.append(rel)
        rows_after = (
            sum(
                footer_rows(_hpath(jvm, path.rstrip("/") + "/" + rel))
                for rel in touched_rels
                if fs.exists(_hpath(jvm, path.rstrip("/") + "/" + rel))
            )
            if footer_rows
            else None
        )
        fs.delete(hstaging, True)
        fs.delete(hmarkers, True)
        return {
            "rows_before": rows_before,
            "rows_after": rows_after,
            "n_updates": int(n_updates),
            "partitions_rewritten": rewritten,
        }

    # Unpartitioned fallback: whole-dataset rewrite (no pruning structure).
    n_updates = updates.count()
    rows_before = footer_rows(hpath) if footer_rows else None
    survivors = target.join(updates.select(*keys).distinct(), keys, "left_anti")
    merged = survivors.unionByName(incoming.select(*target.columns))

    staging = path.rstrip("/") + "__merging"
    merged.write.format(fmt).mode("overwrite").save(staging)
    _swap_in(
        jvm,
        fs,
        hpath,
        _hpath(jvm, staging),
        _hpath(jvm, path.rstrip("/") + "__premerge"),
    )
    rows_after = footer_rows(hpath) if footer_rows else None
    return {
        "rows_before": rows_before,
        "rows_after": rows_after,
        "n_updates": int(n_updates),
        "partitions_rewritten": [],
    }


def _acquire_maintenance_lock(jvm, fs, path: str, force_unlock: bool):
    """Best-effort single-writer lock for the swap protocol: an atomic
    createNewFile on the sibling marker `<base>__maintenance_lock`.
    The rename-swap assumes ONE maintenance writer per dataset root —
    two concurrent compact/merge runs could interleave renames on the
    shared staging names — so the second writer RAISES here instead of
    corrupting. A crashed holder leaves a stale marker; after verifying
    no writer is live, reclaim it with force_unlock=True (recover_swap
    then heals any mid-swap residue). Readers never touch the lock."""
    lock = _hpath(jvm, path.rstrip("/") + "__maintenance_lock")
    if force_unlock and fs.exists(lock):
        fs.delete(lock, True)
    parent = lock.getParent()
    if parent is not None and not fs.exists(parent):
        raise FileNotFoundError(path)
    if not fs.createNewFile(lock):
        raise RuntimeError(
            f"maintenance lock held for {path} "
            f"({lock.getName()} exists): another compact/merge is running "
            "on this dataset root, or a previous one crashed. The swap "
            "protocol is single-writer per dataset; wait for the other "
            "writer, or pass force_unlock=True to reclaim a stale lock "
            "after confirming no writer is live."
        )
    return lock


def compact_files(
    spark,
    path: str,
    target_file_mb: int = 128,
    fmt: str = "parquet",
    partition_by: Sequence[str] = (),
    incremental: bool = False,
    force_unlock: bool = False,
    zorder_by: Sequence[str] = (),
    zonemap_cols: Sequence[str] = (),
    sort_within: Sequence[str] = (),
) -> dict:
    """Public entry for file compaction (semantics, modes, and swap
    safety per `_compact_files_impl`'s docstring / module docstring),
    serialized by the single-writer maintenance lock: a second
    concurrent compact/merge on the same dataset root raises rather
    than interleaving renames; `force_unlock=True` reclaims a stale
    lock left by a crashed run (recover_swap then self-heals).

    `zorder_by` (≥2 numeric columns) applies Morton clustering during
    the rewrite (operators/zorder.py) — the OPTIMIZE ZORDER BY of the
    lakehouse formats on plain parquet: each rewritten file's min/max
    footer stats then bound EVERY listed column, so filters on any of
    them prune files. Works in both full and incremental modes (each
    rewritten partition is clustered independently); costs one range
    shuffle instead of coalesce.

    `sort_within` sorts rows within each rewritten output partition
    (no extra shuffle) so per-file min/max footer ranges stay tight on
    the listed columns — what single-column clustered layouts (the IVF
    index's `cell`) need where zorder_by requires >= 2 columns.

    `zonemap_cols` refreshes the file-level zone map
    (sources/zonemap.update_zonemap) after the swap, still inside the
    maintenance lock: rewritten files' stats rows drop, new files get
    footer-read stats — zorder_by + zonemap_cols together is the full
    OPTIMIZE-then-skip path on plain parquet. Skipped (not failed) if
    the dataset isn't parquet."""
    jvm, _hconf, fs = _fs(spark, path)
    lock = _acquire_maintenance_lock(jvm, fs, path, force_unlock)
    try:
        stats = _compact_files_impl(
            spark, path, target_file_mb=target_file_mb, fmt=fmt,
            partition_by=partition_by, incremental=incremental,
            zorder_by=zorder_by, sort_within=sort_within,
        )
        if zonemap_cols and fmt == "parquet":
            from distributedqueryengine_spark.sources.zonemap import (
                update_zonemap,
            )

            update_zonemap(spark, path, list(zonemap_cols))
            stats["zonemap_refreshed"] = list(zonemap_cols)
        return stats
    finally:
        fs.delete(lock, True)


def merge_upsert_files(
    spark,
    path: str,
    updates: DataFrame,
    key_cols: Sequence[str],
    delete_col: str | None = None,
    fmt: str = "parquet",
    partition_by: Sequence[str] = (),
    force_unlock: bool = False,
    allow_schema_evolution: bool = False,
) -> dict:
    """Public entry for file MERGE (semantics, pruning contract, and
    swap safety per `_merge_upsert_files_impl`'s docstring), serialized
    by the same single-writer maintenance lock as `compact_files` —
    concurrent maintenance on one dataset root raises loudly;
    `force_unlock=True` reclaims a stale lock after a crash.
    `allow_schema_evolution=True` lets updates ADD columns: existing
    rows read them as NULL; with partition pruning, untouched
    partitions keep their old file schema until rewritten, so readers
    need parquet mergeSchema (stated loudly in the refusal message
    when evolution is off)."""
    jvm, _hconf, fs = _fs(spark, path)
    lock = _acquire_maintenance_lock(jvm, fs, path, force_unlock)
    try:
        return _merge_upsert_files_impl(
            spark, path, updates, key_cols, delete_col=delete_col,
            fmt=fmt, partition_by=partition_by,
            allow_schema_evolution=allow_schema_evolution,
        )
    finally:
        fs.delete(lock, True)
