"""Structured Streaming tests: stream == batch, watermark late-data
semantics (SURVEY §5.4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributedqueryengine_spark.streaming import windows as W

SF_DIR = "/root/testdata/sf0.001"


def _rows_set(df, cols):
    return {tuple(r[c] for c in cols) for r in df.collect()}


def test_stream_tumbling_equals_batch(spark):
    """The same tumbling aggregation over the events fixture, run once
    as a batch plan and once through readStream → memory sink, must
    produce identical results (complete mode, bounded input)."""
    batch = W.tumbling_agg(
        __import__("distributedqueryengine_spark.session", fromlist=["load_table"]).load_table(
            spark, SF_DIR, "events"
        ),
        "ts",
        "1 hour",
        ["event_type"],
        [F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value")],
    )
    stream = W.stream_from_table(spark, SF_DIR, "events")
    agg = W.tumbling_agg(
        stream,
        "ts",
        "1 hour",
        ["event_type"],
        [F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value")],
    )
    W.run_stream_to_memory(agg, "tumbling_out", output_mode="complete")
    got = spark.sql("SELECT * FROM tumbling_out")
    cols = ["window_start", "event_type", "n", "sum_value"]
    assert _rows_set(got, cols) == _rows_set(batch, cols)


def test_stream_session_equals_batch(spark):
    from distributedqueryengine_spark.session import load_table

    batch = W.session_agg(
        load_table(spark, SF_DIR, "events"),
        "ts",
        "30 minutes",
        ["user_id"],
        [F.count(F.lit(1)).alias("n_events")],
    )
    stream = W.stream_from_table(spark, SF_DIR, "events")
    agg = W.session_agg(
        stream.withWatermark("ts", "10 minutes"),
        "ts",
        "30 minutes",
        ["user_id"],
        [F.count(F.lit(1)).alias("n_events")],
    )
    W.run_stream_to_memory(agg, "session_out", output_mode="complete")
    got = spark.sql("SELECT * FROM session_out")
    cols = ["session_start", "session_end", "user_id", "n_events"]
    assert _rows_set(got, cols) == _rows_set(batch, cols)


def test_watermark_drops_late_rows(spark, tmp_path):
    """Append-mode tumbling agg with a watermark: a row arriving far
    behind the watermark is dropped, one within slack is kept."""
    import pandas as pd

    d = str(tmp_path / "late_src")
    schema = "ts TIMESTAMP, v DOUBLE"
    batch1 = pd.DataFrame(
        {"ts": pd.to_datetime(["2024-01-01 10:00:05", "2024-01-01 12:00:00"]), "v": [1.0, 2.0]}
    )
    # 10:30 is < watermark (12:00 - 1h = 11:00) → its 10:00-11:00 window
    # is already finalized → dropped; 11:40 lands in a live window.
    batch2 = pd.DataFrame(
        {"ts": pd.to_datetime(["2024-01-01 10:30:00", "2024-01-01 11:40:00"]), "v": [100.0, 4.0]}
    )
    spark.createDataFrame(batch1).coalesce(1).write.mode("overwrite").parquet(d + "/b1")
    src_schema = spark.read.parquet(d + "/b1").schema
    import shutil, glob, os

    stage = str(tmp_path / "stream_in")
    os.makedirs(stage)
    for f in glob.glob(d + "/b1/*.parquet"):
        shutil.copy(f, stage + "/b1.parquet")
    stream = (
        spark.readStream.schema(src_schema).option("maxFilesPerTrigger", 1).parquet(stage)
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.sum("v").alias("sv"))
        .select(F.unix_timestamp("window.start").alias("ws"), "sv")
    )
    q = agg.writeStream.outputMode("append").format("memory").queryName("late_out").start()
    q.processAllAvailable()
    spark.createDataFrame(batch2).coalesce(1).write.mode("overwrite").parquet(d + "/b2")
    for f in glob.glob(d + "/b2/*.parquet"):
        shutil.copy(f, stage + "/b2.parquet")
    q.processAllAvailable()
    # Force final emission of closed windows by advancing watermark.
    batch3 = pd.DataFrame({"ts": pd.to_datetime(["2024-01-01 20:00:00"]), "v": [0.0]})
    spark.createDataFrame(batch3).coalesce(1).write.mode("overwrite").parquet(d + "/b3")
    for f in glob.glob(d + "/b3/*.parquet"):
        shutil.copy(f, stage + "/b3.parquet")
    q.processAllAvailable()
    q.stop()
    got = {r.ws: r.sv for r in spark.sql("SELECT * FROM late_out").collect()}
    ts10 = 1704103200  # 2024-01-01 10:00 UTC
    assert got[ts10] == 1.0, f"late row should be dropped, got {got}"
    assert got[ts10 + 3600] == 4.0  # 11:00 window kept the in-slack row


def test_foreachbatch_exactly_once_style_sink(spark, tmp_path):
    """foreachBatch sink: each micro-batch lands via an idempotent
    (overwrite-by-epoch) writer — the exactly-once pattern for
    arbitrary sinks."""
    out_dir = str(tmp_path / "fb_out")
    stream = W.stream_from_table(spark, SF_DIR, "events")
    agg = W.tumbling_agg(
        stream,
        "ts",
        "1 hour",
        ["event_type"],
        [F.count(F.lit(1)).alias("n")],
    )

    def write_batch(df, epoch_id: int):
        df.write.mode("overwrite").parquet(f"{out_dir}/epoch={epoch_id}")

    q = (
        agg.writeStream.outputMode("complete")
        .foreachBatch(write_batch)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    import glob

    epochs = sorted(glob.glob(out_dir + "/epoch=*"))
    assert epochs, "foreachBatch wrote no epochs"
    final = spark.read.parquet(epochs[-1])
    from distributedqueryengine_spark.session import load_table

    batch = W.tumbling_agg(
        load_table(spark, SF_DIR, "events"),
        "ts",
        "1 hour",
        ["event_type"],
        [F.count(F.lit(1)).alias("n")],
    )
    cols = ["window_start", "event_type", "n"]
    assert _rows_set(final, cols) == _rows_set(batch, cols)


def test_stream_sliding_equals_batch(spark):
    from distributedqueryengine_spark.session import load_table

    args = ("ts", "2 hours", "1 hour", [], [F.count(F.lit(1)).alias("n")])
    batch = W.sliding_agg(load_table(spark, SF_DIR, "events"), *args)
    stream = W.stream_from_table(spark, SF_DIR, "events")
    agg = W.sliding_agg(stream, *args)
    W.run_stream_to_memory(agg, "sliding_out", output_mode="complete")
    got = spark.sql("SELECT * FROM sliding_out")
    cols = ["window_start", "n"]
    assert _rows_set(got, cols) == _rows_set(batch, cols)


def test_rate_source_foreachbatch_watermark_soak(spark):
    """End-to-end soak on the REAL microbatch engine: the
    `rate-micro-batch` source (deterministic batch boundaries — batch k
    carries values [k·1000, (k+1)·1000)) drives an append-mode tumbling
    aggregation with a 10-minute watermark into a foreachBatch sink.

    Event time is derived from `value` (hour = v // 1000, second =
    v % 1000), so batch k is hour k and the watermark crosses hour k's
    window end exactly one batch later. Late rows planted in batches
    2..4 point back into hour 0 and pin down the engine's exact
    late-data boundary (measured, deterministic): the batch-2 plant
    (v=2500) lands in the SAME batch that closes window 0 — Spark
    filters input against the pre-update watermark but evicts with the
    post-update one — so it is merged before emission (n=1001); the
    batch-3/4 plants arrive after eviction and are DROPPED: window 0
    never re-emits and their values leak nowhere. Asserts: (a) each
    closed window is emitted in exactly one epoch (append-mode
    exactly-once per window), (b) exact n/sum per window, including
    the one-row deficit in hours >= 2 whose row was remapped away."""
    import time

    epochs: list[tuple[int, list]] = []

    def sink(df, epoch_id: int):
        epochs.append((epoch_id, df.collect()))

    base = "2024-01-01 00:00:00"
    src = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", 1000)
        .option("numPartitions", 4)
        .load()
    )
    # hour = v // 1000, second-in-hour = v % 1000; late plants: every
    # v >= 2000 with v % 1000 == 500 maps back into hour 0.
    ev = src.select(
        F.when(
            (F.col("value") >= 2000) & (F.col("value") % 1000 == 500),
            F.to_timestamp(F.lit(base)) + F.make_interval(secs=F.lit(500.0)),
        )
        .otherwise(
            F.to_timestamp(F.lit(base))
            + F.make_interval(
                hours=(F.col("value") / 1000).cast("int"),
                secs=(F.col("value") % 1000).cast("double"),
            )
        )
        .alias("ts"),
        F.col("value").cast("double").alias("v"),
    )
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"))
        .select(
            F.unix_timestamp("window.start").alias("ws"), "n", "sv"
        )
    )
    q = agg.writeStream.outputMode("append").foreachBatch(sink).start()
    try:
        deadline = time.time() + 120
        # run until the hour-0..2 windows have all closed and emitted
        while time.time() < deadline:
            emitted = {r.ws for _, rows in epochs for r in rows}
            if len(emitted) >= 3:
                break
            time.sleep(0.5)
    finally:
        q.stop()

    seen: dict[int, tuple[int, float, int]] = {}
    for epoch_id, rows in epochs:
        for r in rows:
            assert r.ws not in seen, (
                f"window {r.ws} emitted twice (epochs {seen[r.ws][2]}, {epoch_id})"
            )
            seen[r.ws] = (r.n, r.sv, epoch_id)
    assert len(seen) >= 3, f"expected >=3 closed windows, got {seen}"
    # session TZ is honored by unix_timestamp — anchor on the smallest
    # emitted window instead of assuming UTC
    ws0 = min(seen)
    for k, ws in enumerate(sorted(seen)[:3]):
        n, sv, _ = seen[ws]
        assert ws == ws0 + k * 3600
        lo = k * 1000
        expect_n, expect_sum = 1000, float(sum(range(lo, lo + 1000)))
        if k == 0:
            # the batch-2 plant (v=2500) merged into window 0 in the
            # batch that closed it; the batch-3/4 plants were dropped
            expect_n, expect_sum = 1001, expect_sum + 2500
        elif k >= 2:
            # this hour's v=k*1000+500 row was remapped into hour 0 —
            # missing here whether it merged there (k=2) or was
            # dropped as late (k>=3)
            expect_n, expect_sum = 999, expect_sum - (lo + 500)
        assert n == expect_n, f"hour {k}: late-data boundary moved (n={n})"
        assert sv == expect_sum, f"hour {k}: wrong sum {sv}"


def test_stream_stream_interval_join_equals_batch(spark):
    """The watermarked stream-stream interval join (clicks → purchases
    within 1h per user) must produce exactly the batch join's rows once
    the bounded stream drains. Watermarks on both sides make Spark run
    its symmetric-hash stream-stream join with state eviction — the
    100 TB-safe configuration."""
    from distributedqueryengine_spark.session import load_table
    from distributedqueryengine_spark.streaming import joins as J

    def split(ev):
        clicks = ev.filter(F.col("event_type") == "click").select(
            "user_id", F.col("event_id").alias("click_id"), "ts"
        )
        purchases = ev.filter(F.col("event_type") == "purchase").select(
            "user_id", F.col("event_id").alias("purchase_id"), "ts", "value"
        )
        return clicks, purchases

    def project(j):
        return j.select("user_id", "click_id", "purchase_id", "l_ts", "r_ts")

    batch = project(
        J.interval_join(*split(load_table(spark, SF_DIR, "events")),
                        keys=["user_id"], left_ts="ts", right_ts="ts")
    )
    sev = W.stream_from_table(spark, SF_DIR, "events", max_files_per_trigger=1)
    stream = project(
        J.interval_join(*split(sev), keys=["user_id"], left_ts="ts",
                        right_ts="ts", watermark="2 hours")
    )
    W.run_stream_to_memory(stream, "ssj_out", output_mode="append")
    got = spark.sql("SELECT * FROM ssj_out")
    cols = ["user_id", "click_id", "purchase_id", "l_ts", "r_ts"]
    assert _rows_set(got, cols) == _rows_set(batch, cols)
    assert batch.count() > 0


def test_checkpoint_restart_exactly_once(spark, tmp_path):
    """Stop a checkpointed windowed aggregation mid-stream and restart
    it from the same checkpoint over new files: the restarted query
    must resume from committed offsets — every input file contributes
    exactly once, finalized windows match the batch recomputation, and
    nothing is double-counted across the restart boundary."""
    import glob
    import os
    import shutil

    import pandas as pd

    stage = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "out")
    os.makedirs(stage)

    def _push(name, ts_vals):
        src = str(tmp_path / ("src_" + name))
        pdf = pd.DataFrame({"ts": pd.to_datetime(ts_vals), "v": [1.0] * len(ts_vals)})
        spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(src)
        for f in glob.glob(src + "/*.parquet"):
            shutil.copy(f, stage + f"/{name}.parquet")
        return src

    first = _push("b1", ["2024-01-01 10:00:10", "2024-01-01 10:00:20", "2024-01-01 11:00:05"])
    schema = spark.read.parquet(first).schema

    def _start():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
        )
        agg = (
            stream.withWatermark("ts", "30 minutes")
            .groupBy(F.window("ts", "1 hour"))
            .agg(F.sum("v").alias("sv"))
            .select(F.unix_timestamp("window.start").alias("ws"), "sv")
        )
        return (
            agg.writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .format("parquet")
            .option("path", sink)
            .start()
        )

    q = _start()
    q.processAllAvailable()
    q.stop()

    # restart from the SAME checkpoint; new files keep arriving,
    # including one that closes the 11:00 window
    _push("b2", ["2024-01-01 11:00:30", "2024-01-01 13:00:00"])
    q2 = _start()
    q2.processAllAvailable()
    _push("b3", ["2024-01-01 15:00:00"])  # advance watermark, close 13:00
    q2.processAllAvailable()
    q2.stop()

    got = {r.ws: r.sv for r in spark.read.parquet(sink).collect()}
    ts10 = 1704103200  # 2024-01-01 10:00 UTC
    assert got[ts10] == 2.0, f"10:00 window double- or under-counted: {got}"
    assert got[ts10 + 3600] == 2.0, (
        f"11:00 window must merge pre- and post-restart rows exactly once: {got}"
    )
    assert got.get(ts10 + 3 * 3600) == 1.0, f"13:00 window missing: {got}"
