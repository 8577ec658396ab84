"""Zone-map data skipping: footer-only stats, conservative pruning
(stale/missing stats never lose rows), full-scan equality, and the
Z-order synergy (clustered files → real skipping)."""
from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from distributedqueryengine_spark.sources.zonemap import (
    list_data_files,
    prune_files,
    read_with_skipping,
    write_zonemap,
)


@pytest.fixture()
def sorted_dataset(spark, tmp_path):
    """16 files, k range-clustered per file (file i holds k in
    [i*100, i*100+99]) — the ideal zone-map layout."""
    path = str(tmp_path / "zm")
    df = spark.range(1600).select(
        F.col("id").cast("long").alias("k"),
        (F.col("id") % 7).alias("v"),
        F.concat(F.lit("s"), F.lpad(F.col("id").cast("string"), 6, "0")).alias("name"),
    )
    df.repartitionByRange(16, "k").write.parquet(path)
    write_zonemap(spark, path, ["k", "name"])
    return path


def test_stats_rows_and_hidden_dir(spark, sorted_dataset):
    files = list_data_files(sorted_dataset)
    assert len(files) == 16
    # zonemap dir invisible to a plain read
    assert spark.read.parquet(sorted_dataset).count() == 1600
    stats = spark.read.parquet(os.path.join(sorted_dataset, "_zonemap"))
    assert stats.where(F.col("col") == "k").count() == 16
    assert stats.where(F.col("col") == "name").count() == 16


def test_numeric_pruning_and_equality(spark, sorted_dataset):
    preds = [("k", "between", (250, 349))]
    kept = prune_files(spark, sorted_dataset, preds)
    assert 1 <= len(kept) <= 3  # ~2 of 16 files cover [250, 349]
    got = sorted(r.k for r in
                 read_with_skipping(spark, sorted_dataset, preds).collect())
    full = spark.read.parquet(sorted_dataset)
    exp = sorted(r.k for r in
                 full.where(F.col("k").between(250, 349)).collect())
    assert got == exp == list(range(250, 350))


def test_strict_and_equality_ops(spark, sorted_dataset):
    for preds, col, expect in [
        ([("k", "=", 777)], "k", [777]),
        ([("k", ">", 1597)], "k", [1598, 1599]),
        ([("k", "<", 2)], "k", [0, 1]),
        ([("k", ">=", 1599)], "k", [1599]),
    ]:
        kept = prune_files(spark, sorted_dataset, preds)
        assert len(kept) <= 2, preds
        got = sorted(r.k for r in
                     read_with_skipping(spark, sorted_dataset, preds).collect())
        assert got == expect, preds


def test_string_pruning(spark, sorted_dataset):
    preds = [("name", "between", ("s000100", "s000150"))]
    kept = prune_files(spark, sorted_dataset, preds)
    assert len(kept) <= 2
    n = read_with_skipping(spark, sorted_dataset, preds).count()
    assert n == 51


def test_conjunction_prunes_union_of_impossible(spark, sorted_dataset):
    # k in [0,99] AND name >= last file's range: each predicate alone
    # keeps a different file; together every file is provably impossible
    preds = [("k", "<=", 99), ("name", ">=", "s001550")]
    kept = prune_files(spark, sorted_dataset, preds)
    assert kept == []
    assert read_with_skipping(spark, sorted_dataset, preds).count() == 0


def test_stale_zonemap_is_conservative(spark, sorted_dataset):
    """Files appended AFTER the zonemap was written have no stats row
    and must always be read."""
    extra = spark.createDataFrame([(99999, 0, "zzz")], "k long, v long, name string")
    extra.coalesce(1).write.mode("append").parquet(sorted_dataset)
    preds = [("k", ">=", 99999)]
    got = read_with_skipping(spark, sorted_dataset, preds).collect()
    assert [r.k for r in got] == [99999]


def test_rewritten_files_drop_out_via_live_listing(spark, sorted_dataset):
    """Stats rows for deleted files are inert (intersection with the
    live listing), and remaining data stays correct."""
    victim = list_data_files(sorted_dataset)[0]
    os.remove(victim)
    # crc sidecar too, or spark's local fs check complains
    crc = os.path.join(os.path.dirname(victim), "." + os.path.basename(victim) + ".crc")
    if os.path.exists(crc):
        os.remove(crc)
    kept = prune_files(spark, sorted_dataset, [("k", ">=", 0)])
    assert victim not in kept
    n = read_with_skipping(spark, sorted_dataset, [("k", ">=", 0)]).count()
    assert 1400 <= n < 1600


def test_missing_zonemap_reads_everything(spark, tmp_path):
    path = str(tmp_path / "nz")
    spark.range(100).write.parquet(path)
    assert len(prune_files(spark, path, [("id", "=", 5)])) == \
        len(list_data_files(path))
    assert read_with_skipping(spark, path, [("id", "=", 5)]).count() == 1


def test_nulls_never_pruned_incorrectly(spark, tmp_path):
    path = str(tmp_path / "nulls")
    spark.createDataFrame(
        [(1, "a"), (None, "b"), (500, None)], "k int, name string"
    ).coalesce(1).write.parquet(path)
    write_zonemap(spark, path, ["k", "name"])
    got = read_with_skipping(spark, path, [("k", ">=", 400)]).collect()
    assert [(r.k, r.name) for r in got] == [(500, None)]


def test_zorder_synergy(spark, tmp_path):
    """Z-ordered layout → both dimensions skippable from one layout;
    random layout → zone maps prune (almost) nothing. The pairing that
    makes `compact_files(..., zorder_by=...)` + zonemap the scale path."""
    from distributedqueryengine_spark.operators.zorder import zorder_repartition

    rnd = str(tmp_path / "rand")
    zo = str(tmp_path / "zord")
    df = spark.range(4096).select(
        (F.xxhash64("id") % 64).alias("x"),
        (F.xxhash64("id", "id") % 64).alias("y"),
        F.col("id").alias("payload"),
    ).where((F.col("x") >= 0) & (F.col("y") >= 0))
    df.repartition(16).write.parquet(rnd)           # hash layout
    zorder_repartition(df, ["x", "y"], 16).write.parquet(zo)
    write_zonemap(spark, rnd, ["x", "y"])
    write_zonemap(spark, zo, ["x", "y"])
    preds = [("x", "between", (0, 15)), ("y", "between", (0, 15))]
    kept_rnd = len(prune_files(spark, rnd, preds))
    kept_zo = len(prune_files(spark, zo, preds))
    assert kept_zo < kept_rnd, (kept_zo, kept_rnd)
    assert kept_zo <= 8
    # and both read paths agree with the full filter
    a = sorted(r.payload for r in read_with_skipping(spark, zo, preds).collect())
    b = sorted(
        r.payload for r in spark.read.parquet(zo)
        .where(F.col("x").between(0, 15) & F.col("y").between(0, 15))
        .collect()
    )
    assert a == b


def test_bad_op_raises(spark, sorted_dataset):
    with pytest.raises(ValueError, match="unsupported op"):
        prune_files(spark, sorted_dataset, [("k", "!=", 5)])


def test_update_zonemap_incremental(spark, tmp_path):
    """Append + delete, then update_zonemap: new files gain stats (and
    become skippable), dead files' rows drop, untouched files' rows
    survive byte-identical — without a full rebuild."""
    from distributedqueryengine_spark.sources.zonemap import update_zonemap

    path = str(tmp_path / "inc")
    spark.range(400).select(F.col("id").alias("k")).repartitionByRange(
        4, "k"
    ).write.parquet(path)
    write_zonemap(spark, path, ["k"])
    before = {
        (r.file, r.min_num, r.max_num)
        for r in spark.read.parquet(path + "/_zonemap").collect()
    }
    # append a far-range file and delete one original file
    spark.createDataFrame([(9000 + i,) for i in range(50)], "k long") \
        .coalesce(1).write.mode("append").parquet(path)
    victim = sorted(f for f, *_ in before)[0]
    os.remove(victim)
    crc = os.path.join(os.path.dirname(victim), "." + os.path.basename(victim) + ".crc")
    if os.path.exists(crc):
        os.remove(crc)

    update_zonemap(spark, path, ["k"])
    after = {
        (r.file, r.min_num, r.max_num)
        for r in spark.read.parquet(path + "/_zonemap").collect()
    }
    files_after = {f for f, *_ in after}
    assert victim not in files_after
    survivors = {t for t in before if t[0] != victim}
    assert survivors <= after  # untouched rows identical
    # the appended file is now skippable: a low-range query prunes it
    kept = prune_files(spark, path, [("k", "<=", 100)])
    assert all("9000" not in f or True for f in kept)  # structural sanity
    new_file = (files_after - {f for f, *_ in before}).pop()
    assert new_file not in kept
    # and data correctness end-to-end
    n = read_with_skipping(spark, path, [("k", ">=", 9000)]).count()
    assert n == 50


def test_compact_with_zonemap_refresh(spark, tmp_path):
    """compact_files(zorder_by=..., zonemap_cols=...) leaves a fresh,
    consistent zonemap: stats cover exactly the post-compaction files
    and skipping still returns the full filtered result."""
    from distributedqueryengine_spark.sources.sinks import compact_files
    from distributedqueryengine_spark.sources.zonemap import update_zonemap

    path = str(tmp_path / "cz")
    df = spark.range(2000).select(
        (F.col("id") % 50).alias("x"),
        F.floor(F.col("id") / 50).cast("long").alias("y"),
        F.col("id").alias("payload"),
    )
    df.repartition(24).write.parquet(path)
    write_zonemap(spark, path, ["x", "y"])
    stats = compact_files(
        spark, path, target_file_mb=1, zorder_by=["x", "y"],
        zonemap_cols=["x", "y"],
    )
    assert stats["zonemap_refreshed"] == ["x", "y"]
    zm_files = {
        r.file for r in spark.read.parquet(path + "/_zonemap").collect()
    }
    assert zm_files == set(list_data_files(path))  # exact coverage
    preds = [("x", "between", (0, 9)), ("y", "between", (0, 9))]
    got = sorted(
        r.payload for r in read_with_skipping(spark, path, preds).collect()
    )
    exp = sorted(
        r.payload for r in spark.read.parquet(path)
        .where(F.col("x").between(0, 9) & F.col("y").between(0, 9)).collect()
    )
    assert got == exp and got


def test_in_predicate(spark, sorted_dataset):
    preds = [("k", "in", [5, 777, 1203])]
    kept = prune_files(spark, sorted_dataset, preds)
    assert len(kept) <= 3  # 3 values → ≤3 files
    got = sorted(r.k for r in
                 read_with_skipping(spark, sorted_dataset, preds).collect())
    assert got == [5, 777, 1203]


def test_date_pruning_and_equality(spark, tmp_path):
    # Dates range-clustered per file; pruning must use true epoch-days
    # on BOTH sides (stats and predicate), and accept datetime.date
    # predicate values directly.
    import datetime as dt

    path = str(tmp_path / "zm_date")
    df = spark.range(400).select(
        F.date_add(F.lit("2024-01-01").cast("date"), F.col("id").cast("int")).alias("d"),
        F.col("id").alias("v"),
    )
    df.repartitionByRange(8, "d").write.parquet(path)
    write_zonemap(spark, path, ["d"])

    lo, hi = dt.date(2024, 3, 1), dt.date(2024, 3, 20)
    preds = [("d", "between", (lo, hi))]
    kept = prune_files(spark, path, preds)
    assert 1 <= len(kept) <= 2  # 20 days ≈ half of one 50-day file
    got = sorted(r.v for r in read_with_skipping(spark, path, preds).collect())
    exp = sorted(
        r.v
        for r in spark.read.parquet(path).where(F.col("d").between(lo, hi)).collect()
    )
    assert got == exp and len(got) == 20

    # equality on an exact day, and a miss outside the data range
    assert sorted(
        r.v for r in read_with_skipping(spark, path, [("d", "=", dt.date(2024, 1, 10))]).collect()
    ) == [9]
    assert prune_files(spark, path, [("d", ">", dt.date(2030, 1, 1))]) == []


def test_timestamp_pruning_and_equality(spark, tmp_path):
    # Naive timestamps: stats and predicates are both pinned to UTC, so
    # pruning is consistent regardless of executor timezone.
    import datetime as dt

    path = str(tmp_path / "zm_ts")
    df = spark.range(240).select(
        (F.lit("2024-06-01 00:00:00").cast("timestamp")
         + F.make_interval(hours=F.col("id").cast("int"))).alias("ts"),
        F.col("id").alias("v"),
    )
    # Spark's default INT96 timestamps carry NO parquet min/max stats
    # (conservatively never pruned); TIMESTAMP_MICROS is the layout a
    # skipping-aware table should use.
    key = "spark.sql.parquet.outputTimestampType"
    old = spark.conf.get(key)
    spark.conf.set(key, "TIMESTAMP_MICROS")
    try:
        df.repartitionByRange(8, "ts").write.parquet(path)
    finally:
        spark.conf.set(key, old)
    write_zonemap(spark, path, ["ts"])

    lo = dt.datetime(2024, 6, 3, 0, 0, 0)
    hi = dt.datetime(2024, 6, 3, 23, 0, 0)
    preds = [("ts", "between", (lo, hi))]
    kept = prune_files(spark, path, preds)
    assert 1 <= len(kept) <= 2
    got = sorted(r.v for r in read_with_skipping(spark, path, preds).collect())
    exp = sorted(
        r.v
        for r in spark.read.parquet(path).where(F.col("ts").between(lo, hi)).collect()
    )
    assert got == exp and len(got) == 24


def test_timestamp_pruning_non_utc_session(spark, tmp_path):
    """ADVICE r11: naive predicate datetimes must encode through the
    SESSION timezone — the same rule Spark applies to the residual
    F.lit() filter — not a UTC pin. Under Asia/Tokyo (+9, no DST) a
    UTC-pinned bound was 9h off the filter instant and could prune
    files containing matching rows; the result must equal the
    full-scan filter exactly."""
    import datetime as dt

    path = str(tmp_path / "zm_ts_tz")
    df = spark.range(240).select(
        (F.lit("2024-06-01 00:00:00").cast("timestamp")
         + F.make_interval(hours=F.col("id").cast("int"))).alias("ts"),
        F.col("id").alias("v"),
    )
    tkey = "spark.sql.parquet.outputTimestampType"
    zkey = "spark.sql.session.timeZone"
    old_t, old_z = spark.conf.get(tkey), spark.conf.get(zkey)
    spark.conf.set(tkey, "TIMESTAMP_MICROS")
    spark.conf.set(zkey, "Asia/Tokyo")
    try:
        df.repartitionByRange(8, "ts").write.parquet(path)
        write_zonemap(spark, path, ["ts"])
        lo = dt.datetime(2024, 6, 3, 0, 0, 0)
        hi = dt.datetime(2024, 6, 3, 23, 0, 0)
        preds = [("ts", "between", (lo, hi))]
        got = sorted(
            r.v for r in read_with_skipping(spark, path, preds).collect()
        )
        exp = sorted(
            r.v
            for r in spark.read.parquet(path)
            .where(F.col("ts").between(lo, hi))
            .collect()
        )
        assert got == exp and len(got) == 24
        # and the pruning is still real, not just conservative
        assert 1 <= len(prune_files(spark, path, preds)) <= 2
    finally:
        spark.conf.set(tkey, old_t)
        spark.conf.set(zkey, old_z)


def test_format_version_guard(spark, sorted_dataset):
    """An unversioned (pre-r12) zonemap must be ignored by prune_files
    (conservative: every live file kept) and fully rebuilt by
    update_zonemap — never silently compared against current predicate
    encodings (ADVICE r11)."""
    from distributedqueryengine_spark.sources.zonemap import (
        _FORMAT_MARKER,
        _read_format_version,
        update_zonemap,
    )

    path = sorted_dataset
    zdir = os.path.join(path, "_zonemap")
    preds = [("k", "<", 100)]
    assert len(prune_files(spark, path, preds)) == 1  # versioned: prunes

    # simulate a legacy zonemap: stats present, marker absent
    os.remove(os.path.join(zdir, _FORMAT_MARKER))
    assert _read_format_version(zdir) == 0
    kept = prune_files(spark, path, preds)
    assert sorted(kept) == list_data_files(path)  # no pruning, no loss

    # update_zonemap force-rebuilds and restores both marker and pruning
    update_zonemap(spark, path, ["k", "name"])
    assert _read_format_version(zdir) == 2
    assert len(prune_files(spark, path, preds)) == 1


def test_offset_session_timezones(spark, tmp_path):
    """ADVICE r12: Spark accepts fixed-offset session timezones
    (GMT+8, UTC+08:00, +08:00) that are NOT IANA tzdata keys —
    ZoneInfo raises on them. Pruning must (a) not crash, (b) still
    equal the full-scan filter, and (c) still PRUNE, since the offset
    is exactly resolvable."""
    import datetime as dt

    path = str(tmp_path / "zm_ts_off")
    df = spark.range(240).select(
        (F.lit("2024-06-01 00:00:00").cast("timestamp")
         + F.make_interval(hours=F.col("id").cast("int"))).alias("ts"),
        F.col("id").alias("v"),
    )
    tkey = "spark.sql.parquet.outputTimestampType"
    zkey = "spark.sql.session.timeZone"
    old_t, old_z = spark.conf.get(tkey), spark.conf.get(zkey)
    spark.conf.set(tkey, "TIMESTAMP_MICROS")
    try:
        df.repartitionByRange(8, "ts").write.parquet(path)
        write_zonemap(spark, path, ["ts"])
        lo = dt.datetime(2024, 6, 3, 0, 0, 0)
        hi = dt.datetime(2024, 6, 3, 23, 0, 0)
        preds = [("ts", "between", (lo, hi))]
        for tz in ("GMT+8", "UTC+08:00", "+08:00", "-05:30", "GMT-07:00"):
            spark.conf.set(zkey, tz)
            got = sorted(
                r.v for r in read_with_skipping(spark, path, preds).collect()
            )
            exp = sorted(
                r.v
                for r in spark.read.parquet(path)
                .where(F.col("ts").between(lo, hi))
                .collect()
            )
            assert got == exp and len(got) == 24, tz
            # offsets are resolvable → pruning stays real under them
            assert 1 <= len(prune_files(spark, path, preds)) <= 2, tz
    finally:
        spark.conf.set(tkey, old_t)
        spark.conf.set(zkey, old_z)


def test_unresolvable_session_timezone_degrades(spark, tmp_path, monkeypatch):
    """A session timezone no tzinfo can be built for must make naive
    datetime predicates NON-PRUNABLE (all live files kept, read equals
    full scan) — never raise mid-read."""
    import datetime as dt

    from distributedqueryengine_spark.sources import zonemap as zm

    path = str(tmp_path / "zm_ts_bad")
    df = spark.range(48).select(
        (F.lit("2024-06-01 00:00:00").cast("timestamp")
         + F.make_interval(hours=F.col("id").cast("int"))).alias("ts"),
        F.col("id").alias("v"),
    )
    tkey = "spark.sql.parquet.outputTimestampType"
    old_t = spark.conf.get(tkey)
    spark.conf.set(tkey, "TIMESTAMP_MICROS")
    try:
        df.repartitionByRange(4, "ts").write.parquet(path)
    finally:
        spark.conf.set(tkey, old_t)
    write_zonemap(spark, path, ["ts"])
    monkeypatch.setattr(zm, "_session_tz", lambda _s: "Mars/Olympus_Mons")
    preds = [("ts", "<", dt.datetime(2024, 6, 1, 12, 0, 0))]
    kept = zm.prune_files(spark, path, preds)
    assert sorted(kept) == list_data_files(path)  # conservative, no crash
    # an AWARE predicate needs no session tz: still prunes under the
    # broken session setting
    aware = [("ts", "<", dt.datetime(2024, 6, 1, 12, 0, 0,
                                     tzinfo=dt.timezone.utc))]
    assert len(zm.prune_files(spark, path, aware)) <= 2


def test_resolve_tz_forms():
    import datetime as dt

    from distributedqueryengine_spark.sources.zonemap import _resolve_tz

    eight = dt.timedelta(hours=8)
    for s in ("GMT+8", "GMT+08:00", "UTC+8", "UTC+08:00", "UT+08",
              "+08:00", "+0800", "+8", "+08:00:00"):
        tz = _resolve_tz(s)
        assert tz is not None and tz.utcoffset(None) == eight, s
    assert _resolve_tz("-05:30").utcoffset(None) == -dt.timedelta(hours=5, minutes=30)
    for s in ("Z", "UTC", "GMT", "UT"):
        assert _resolve_tz(s).utcoffset(None) == dt.timedelta(0), s
    assert _resolve_tz("Asia/Tokyo") is not None
    for s in ("Mars/Olympus_Mons", "+99:00", "GMT+8:7", "noise"):
        assert _resolve_tz(s) is None, s


def test_file_uri_lake_roundtrip(spark, tmp_path):
    """r12 verdict item 5: a scheme-qualified lake path routes the
    listing + format marker through the session Hadoop FS and footer
    reads through pyarrow.fs — `file:` URIs exercise the exact branch
    a hdfs://-style URI would. Pruning, equality, and incremental
    refresh all behave identically to the POSIX path."""
    from distributedqueryengine_spark.sources.zonemap import update_zonemap

    local = str(tmp_path / "zm_uri")
    uri = "file://" + local
    df = spark.range(800).select(
        F.col("id").cast("long").alias("k"), (F.col("id") % 5).alias("v")
    )
    df.repartitionByRange(8, "k").write.parquet(uri)
    write_zonemap(spark, uri, ["k"])

    files = list_data_files(uri, spark)
    assert len(files) == 8 and all(f.startswith("file:") for f in files)

    preds = [("k", "between", (150, 249))]
    kept = prune_files(spark, uri, preds)
    assert 1 <= len(kept) <= 2
    got = sorted(r.k for r in read_with_skipping(spark, uri, preds).collect())
    assert got == list(range(150, 250))

    # append a file → stats-less → conservatively kept; update_zonemap
    # then refreshes ONLY the delta and restores pruning
    spark.range(10_000, 10_016).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("v")
    ).coalesce(1).write.mode("append").parquet(uri)
    # stats-less appended file: conservatively kept for every predicate,
    # even one its rows cannot match...
    assert len(prune_files(spark, uri, preds)) == len(kept) + 1
    # ...while the 8 old files are provably impossible for k>=10000
    preds_hi = [("k", ">=", 10_000)]
    assert len(prune_files(spark, uri, preds_hi)) == 1
    got = sorted(r.k for r in read_with_skipping(spark, uri, preds_hi).collect())
    assert got == list(range(10_000, 10_016))
    # incremental refresh through the URI path restores full pruning
    update_zonemap(spark, uri, ["k"])
    assert len(prune_files(spark, uri, preds)) == len(kept)
    got = sorted(r.k for r in read_with_skipping(spark, uri, preds).collect())
    assert got == list(range(150, 250))
