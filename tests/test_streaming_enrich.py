"""Point-in-time SCD2 enrichment tests: batch join vs a driver-side
reference, and the streaming foreachBatch path ≡ the batch path."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributedqueryengine_spark.operators import cdc
from distributedqueryengine_spark.streaming.enrich import (
    enrich_point_in_time,
    stream_enrich_scd2,
)


def _fixture(spark):
    changes = [
        (1, "2024-01-01 00:00:00", "bronze"),
        (1, "2024-03-01 00:00:00", "silver"),
        (1, "2024-06-01 00:00:00", "gold"),
        (2, "2024-02-01 00:00:00", "bronze"),
    ]
    dim = cdc.scd2_from_changes(
        spark.createDataFrame(changes, "cust int, ts string, tier string").select(
            "cust", F.col("ts").cast("timestamp").alias("ts"), "tier"
        ),
        ["cust"],
        "ts",
        ["tier"],
    ).select("cust", "tier", "valid_from", "valid_to")
    events = spark.createDataFrame(
        [
            (10, 1, "2024-01-15 12:00:00"),   # bronze era
            (11, 1, "2024-03-01 00:00:00"),   # exactly at change → silver
            (12, 1, "2024-05-31 23:59:59"),   # last second of silver
            (13, 1, "2024-12-01 00:00:00"),   # open gold row
            (14, 2, "2024-01-15 00:00:00"),   # before cust 2 existed → NULL
            (15, 3, "2024-06-01 00:00:00"),   # unknown key → NULL
        ],
        "event_id int, cust int, ts string",
    ).select("event_id", "cust", F.col("ts").cast("timestamp").alias("ts"))
    expect = {10: "bronze", 11: "silver", 12: "silver", 13: "gold", 14: None, 15: None}
    return dim, events, expect


def test_enrich_point_in_time_batch(spark):
    dim, events, expect = _fixture(spark)
    out = enrich_point_in_time(events, dim, "cust", "ts")
    got = {r.event_id: r.tier for r in out.collect()}
    assert got == expect
    assert out.count() == events.count()  # LEFT join: no row loss


def test_stream_enrich_matches_batch(spark, tmp_path):
    dim, events, expect = _fixture(spark)
    dim = dim.persist()
    qdir = str(tmp_path / "evstream")
    events.repartition(2).write.parquet(qdir)
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(qdir)
    )
    got_rows: list = []
    q = stream_enrich_scd2(
        stream,
        lambda: dim,
        "cust",
        "ts",
        lambda df, _e: got_rows.extend(df.collect()),
        str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r.event_id: r.tier for r in got_rows}
    assert got == expect
    dim.unpersist()
