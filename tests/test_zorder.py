"""Z-order layout tests: the Morton key must bound EVERY participating
column's per-partition span (the property parquet min/max skipping
exploits), where a plain lexicographic sort bounds only the first."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributedqueryengine_spark.operators import zorder

N_PARTS = 16


def _mean_norm_span(df, col):
    """Mean per-partition (max-min) of `col`, normalized by the global
    span — 'what fraction of the column does a partition cover'."""
    by_part = (
        df.withColumn("__pid", F.spark_partition_id())
        .groupBy("__pid")
        .agg((F.max(col) - F.min(col)).alias("span"))
    )
    g = df.agg((F.max(col) - F.min(col)).alias("g")).first().g
    return by_part.agg(F.avg("span")).first()[0] / float(g)


def test_zorder_bounds_both_columns(spark, tables):
    orders = tables["orders"].select("o_custkey", "o_totalprice")

    lex = orders.repartitionByRange(N_PARTS, "o_custkey", "o_totalprice")
    zed = zorder.zorder_repartition(
        orders, ["o_custkey", "o_totalprice"], N_PARTS
    ).persist()

    lex_second = _mean_norm_span(lex, "o_totalprice")
    z_first = _mean_norm_span(zed, "o_custkey")
    z_second = _mean_norm_span(zed, "o_totalprice")

    # lexicographic range partitioning leaves the second column
    # unbounded per partition (~ full span); z-order must bound BOTH
    assert lex_second > 0.8, f"fixture degenerate? lex second-col span {lex_second}"
    assert z_first < 0.6, f"z-order first-col span {z_first}"
    assert z_second < 0.6, f"z-order second-col span {z_second}"
    # and be strictly better than lex on the non-leading column
    assert z_second < lex_second / 2

    # no rows lost or duplicated, schema unchanged
    assert zed.count() == orders.count()
    assert zed.columns == orders.columns
    zed.unpersist()


def test_zorder_key_determinism_and_nulls(spark):
    rows = [(i, float(i * 7 % 100)) for i in range(200)] + [(None, None)]
    df = spark.createDataFrame(rows, "a int, b double")
    def keys():
        return sorted(
            ((r.a, r["__zorder"]) for r in zorder.zorder_key(df, ["a", "b"], bits=6).collect()),
            key=str,
        )

    k1, k2 = keys(), keys()
    assert k1 == k2
    # NULLs land in the origin cell, not dropped
    nulls = [z for a, z in k1 if a is None]
    assert nulls == [0]


def test_zorder_guards(spark, tables):
    orders = tables["orders"]
    with pytest.raises(ValueError, match=">= 2 columns"):
        zorder.zorder_key(orders, ["o_custkey"])
    with pytest.raises(ValueError, match="must be in"):
        zorder.zorder_key(orders, ["o_custkey", "o_totalprice"], bits=40)


def test_compact_files_zorder_clusters_output(spark, tables, tmp_path):
    """compact_files(zorder_by=...) is OPTIMIZE ZORDER BY on plain
    parquet: the rewrite produces files whose per-file span of EVERY
    z-ordered column is a small fraction of the global span (the
    min/max-skipping property), rows survive exactly, and the
    plain-coalesce compaction shows no such bound."""
    from distributedqueryengine_spark.sources import sinks

    orders = tables["orders"].select("o_orderkey", "o_custkey", "o_totalprice")
    before = orders.count()

    def file_spans(path, col):
        import glob as _glob

        spans, gmin, gmax = [], None, None
        for f in sorted(_glob.glob(path + "/*.parquet")):
            row = (
                spark.read.parquet(f)
                .agg(F.min(col).alias("lo"), F.max(col).alias("hi"))
                .first()
            )
            spans.append((row.lo, row.hi))
            gmin = row.lo if gmin is None else min(gmin, row.lo)
            gmax = row.hi if gmax is None else max(gmax, row.hi)
        g = float(gmax - gmin) or 1.0
        return sum((hi - lo) / g for lo, hi in spans) / len(spans), len(spans)

    zpath = str(tmp_path / "z")
    orders.repartition(40).write.parquet(zpath)  # scattered small files
    stats = sinks.compact_files(
        spark, zpath, target_file_mb=1,
        zorder_by=["o_custkey", "o_totalprice"],
    )
    assert stats["files_after"] < stats["files_before"]
    out = spark.read.parquet(zpath)
    assert out.count() == before

    span_a, nfiles = file_spans(zpath, "o_custkey")
    span_b, _ = file_spans(zpath, "o_totalprice")
    if nfiles >= 4:  # span bound only meaningful with several files
        assert span_a < 0.65, span_a
        assert span_b < 0.65, span_b

    # control: plain compaction leaves at least one column unclustered
    cpath = str(tmp_path / "c")
    orders.repartition(40).write.parquet(cpath)
    sinks.compact_files(spark, cpath, target_file_mb=1)
    ca, cn = file_spans(cpath, "o_custkey")
    cb, _ = file_spans(cpath, "o_totalprice")
    if cn >= 4 and nfiles >= 4:
        assert max(ca, cb) > max(span_a, span_b), (ca, cb, span_a, span_b)
