"""streaming_sessionize: watermark-closed sessions ≡ batch sessionize,
including cross-batch session bridging, quiet-key timeout flush, and
the hot-key state cap."""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import functions as F

FLUSH_KEY = 999  # far-future events on this key only advance the watermark


def _stage_files(spark, tmp_path, batches, schema="u long, ep long"):
    stage = str(tmp_path / "src")
    os.makedirs(stage, exist_ok=True)
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, schema).select(
            "u", F.timestamp_seconds("ep").alias("ts")
        )
        tmp = str(tmp_path / f"_b{i}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        for f in glob.glob(tmp + "/*.parquet"):
            shutil.copy(f, f"{stage}/b{i}.parquet")
        shutil.rmtree(tmp)
    return stage, spark.read.parquet(stage).schema


def _run(spark, tmp_path, batches, gap, name, **kw):
    from distributedqueryengine_spark.streaming.sessionize import (
        streaming_sessionize,
    )

    stage, schema = _stage_files(spark, tmp_path, batches)
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(stage)
    )
    out = streaming_sessionize(stream, "u", "ts", gap, **kw)
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return [
        r
        for r in spark.sql(f"SELECT * FROM {name}").collect()
        if r.key != FLUSH_KEY
    ]


def _batch_sessions(spark, rows, gap):
    from distributedqueryengine_spark.operators.timeseries import sessionize

    df = spark.createDataFrame(rows, "u long, ep long").select(
        "u", F.timestamp_seconds("ep").alias("ts")
    )
    out = sessionize(df, ["u"], "ts", gap)
    return sorted(
        (r.u, r.session_start, r.end, r.n)
        for r in out.groupBy("u", "session_start")
        .agg(
            F.max(F.unix_timestamp("ts")).cast("long").alias("end"),
            F.count(F.lit(1)).cast("int").alias("n"),
        )
        .collect()
    )


def test_streaming_sessionize_matches_batch_with_bridging(spark, tmp_path):
    """A late event that lands BETWEEN two buffered sessions merges them
    (the fold-only failure case); emitted sessions equal the batch
    operator's summaries exactly."""
    gap = 100
    b1 = [(1, 1000), (1, 1050), (1, 1230), (2, 500)]
    # 1150 bridges [1000,1050] and [1230] into ONE session
    b2 = [(1, 1150), (2, 980)]
    flush = [(FLUSH_KEY, 10_000)]
    rows = b1 + b2
    got = sorted(
        (r.key, r.session_start, r.session_end, r.n_events)
        for r in _run(spark, tmp_path, [b1, b2, flush], gap, "ssess_bridge",
             watermark_delay="600 seconds")
    )
    assert got == _batch_sessions(spark, rows, gap)
    # and the bridge really merged: key 1 has ONE session spanning 1000-1230
    assert (1, 1000, 1230, 4) in got
    # key 2: 500 and 980 are separate sessions (gap 480 > 100)
    assert (2, 500, 500, 1) in got and (2, 980, 980, 1) in got


def test_streaming_sessionize_quiet_key_timeout(spark, tmp_path):
    """A key that goes quiet still emits its final session once the
    watermark (advanced by other traffic) passes last+gap — the
    EventTimeTimeout path, no new events for the key needed."""
    gap = 60
    b1 = [(7, 100), (7, 130)]
    b2 = [(FLUSH_KEY, 5_000)]  # only other-key traffic
    got = [
        (r.key, r.session_start, r.session_end, r.n_events, r.truncated)
        for r in _run(spark, tmp_path, [b1, b2], gap, "ssess_quiet")
    ]
    assert got == [(7, 100, 130, 2, False)]


def test_streaming_sessionize_hot_key_cap(spark, tmp_path):
    """State cap: a bot key streaming more events than max_events_per_key
    emits its (capped) sessions flagged truncated instead of growing
    state without bound."""
    gap = 10
    b1 = [(5, 1000 + i) for i in range(60)]  # one long session, 60 events
    b2 = [(FLUSH_KEY, 50_000)]
    got = [
        (r.key, r.n_events, r.truncated)
        for r in _run(
            spark, tmp_path, [b1, b2], gap, "ssess_cap", max_events_per_key=40
        )
    ]
    assert got == [(5, 40, True)]


def test_streaming_sessionize_multi_key_out_of_order(spark, tmp_path):
    """Randomish multi-key traffic with cross-batch disorder: the full
    emitted session set equals batch sessionize."""
    gap = 50
    b1 = [(1, 100), (2, 110), (3, 95), (1, 140), (2, 300)]
    b2 = [(3, 120), (1, 185), (2, 330), (3, 500)]
    b3 = [(1, 600), (2, 290)]
    flush = [(FLUSH_KEY, 100_000)]
    rows = b1 + b2 + b3
    got = sorted(
        (r.key, r.session_start, r.session_end, r.n_events)
        for r in _run(spark, tmp_path, [b1, b2, b3, flush], gap, "ssess_multi",
             watermark_delay="600 seconds")
    )
    assert got == _batch_sessions(spark, rows, gap)
