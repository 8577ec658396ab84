"""Stateful streaming: applyInPandasWithState + dropDuplicatesWithinWatermark."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributedqueryengine_spark.session import load_table
from distributedqueryengine_spark.streaming import stateful
from distributedqueryengine_spark.streaming.windows import stream_from_table

SF_DIR = "/root/testdata/sf0.001"


def test_running_totals_match_batch(spark):
    """Final stateful per-user totals == batch groupBy over the same
    bounded input (update mode: keep each user's last emitted row)."""
    stream = stream_from_table(spark, SF_DIR, "events")
    out = stateful.running_totals_per_user(stream.select("user_id", "value", "ts"))
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("stateful_out")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    # update-mode memory sink appends each emission; the final state per
    # user is the row with the max n_events.
    got = {
        r.user_id: (r.n_events, r.total_value)
        for r in spark.sql(
            """
            SELECT user_id, n_events, total_value FROM (
                SELECT *, row_number() OVER (PARTITION BY user_id
                         ORDER BY n_events DESC) AS rn FROM stateful_out) WHERE rn = 1
            """
        ).collect()
    }
    batch = {
        r.user_id: (r.n, round(r.t, 4))
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("t"))
        .collect()
    }
    assert got == batch


def test_streaming_dedup_drops_in_horizon_dups(spark, tmp_path):
    import pandas as pd

    stage = str(tmp_path / "dd_src")
    import os

    os.makedirs(stage)
    b1 = pd.DataFrame(
        {
            "k": [1, 1, 2],
            "ts": pd.to_datetime(
                ["2024-01-01 10:00:00", "2024-01-01 10:00:30", "2024-01-01 10:01:00"]
            ),
        }
    )
    spark.createDataFrame(b1).coalesce(1).write.mode("overwrite").parquet(stage + "/_b1")
    import glob, shutil

    for f in glob.glob(stage + "/_b1/*.parquet"):
        shutil.copy(f, stage + "/b1.parquet")
    shutil.rmtree(stage + "/_b1")
    schema = spark.read.parquet(stage + "/b1.parquet").schema
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(stage)
    dd = stateful.streaming_dedup(stream, ["k"], "ts", "10 minutes")
    q = dd.writeStream.outputMode("append").format("memory").queryName("dd_out").start()
    q.processAllAvailable()
    q.stop()
    ks = sorted(r.k for r in spark.sql("SELECT k FROM dd_out").collect())
    assert ks == [1, 2]  # the duplicate k=1 within the horizon dropped


def test_checkpoint_restart_no_duplicates(spark, tmp_path):
    """Stop a checkpointed streaming aggregation mid-source, restart it,
    feed the rest: the final result must equal one continuous run (the
    checkpoint carries offsets + state across restarts)."""
    import glob
    import os
    import shutil

    import pandas as pd

    stage = str(tmp_path / "cp_src")
    ckpt = str(tmp_path / "cp_state")
    os.makedirs(stage)

    def add_file(name, times):
        pdf = pd.DataFrame({"ts": pd.to_datetime(times), "v": [1.0] * len(times)})
        tmp = str(tmp_path / ("_" + name))
        spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(tmp)
        for f in glob.glob(tmp + "/*.parquet"):
            shutil.copy(f, f"{stage}/{name}.parquet")
        shutil.rmtree(tmp)

    add_file("b1", ["2024-01-01 10:05:00", "2024-01-01 10:10:00"])
    schema = spark.read.parquet(stage).schema

    def start():
        stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(stage)
        agg = (
            stream.groupBy(F.window("ts", "1 hour"))
            .agg(F.sum("v").alias("sv"))
            .select(F.unix_timestamp("window.start").alias("ws"), "sv")
        )
        return (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName("cp_out")
            .option("checkpointLocation", ckpt)
            .start()
        )

    q = start()
    q.processAllAvailable()
    q.stop()
    # new data arrives while the query is down
    add_file("b2", ["2024-01-01 10:20:00", "2024-01-01 11:05:00"])
    q = start()
    q.processAllAvailable()
    q.stop()
    got = {r.ws: r.sv for r in spark.sql("SELECT * FROM cp_out").collect()}
    ts10 = 1704103200  # 2024-01-01 10:00 UTC
    assert got == {ts10: 3.0, ts10 + 3600: 1.0}, got


def test_transform_with_state_matches_batch(spark):
    """transformWithState (Spark 4 named-state API) running totals ==
    batch groupBy over the same bounded input — and therefore == the
    applyInPandasWithState implementation above. Skipped where the
    runtime lacks protobuf (state-server protocol dependency).

    PERMANENT in this container (pinned r7, alongside the multimodal
    codec stubs): google.protobuf is absent and package installation is
    not available, so the Python-side state server cannot start. The
    code path ships and the skip self-heals the moment protobuf exists
    on a real cluster; the applyInPandasWithState equivalence above
    covers the same semantics continuously."""
    import pytest

    if not stateful.transform_with_state_available():
        pytest.skip("google.protobuf unavailable: transformWithState state server cannot start (permanent container limitation, see COVERAGE.md)")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    stream = stream_from_table(spark, SF_DIR, "events")
    out = stateful.running_totals_tws(stream.select("user_id", "value", "ts"))
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("tws_out")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        r.user_id: (r.n_events, r.total_value)
        for r in spark.sql(
            """
            SELECT user_id, n_events, total_value FROM (
                SELECT *, row_number() OVER (PARTITION BY user_id
                         ORDER BY n_events DESC) AS rn FROM tws_out) WHERE rn = 1
            """
        ).collect()
    }
    batch = {
        r.user_id: (r.n, round(r.t, 4))
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("t"))
        .collect()
    }
    assert got == batch


def test_streaming_funnel_matches_batch_with_out_of_order_arrival(spark, tmp_path):
    """The streaming funnel's buffered-recompute state must equal the
    batch funnel over all events seen — INCLUDING a step-1 event that
    arrives in a LATER micro-batch than the step-2 event it completes
    (the case an incremental fold-only design gets wrong)."""
    from pyspark.sql import functions as F

    from distributedqueryengine_spark.operators.timeseries import funnel
    from distributedqueryengine_spark.streaming.stateful import streaming_funnel

    steps = ["view", "cart", "buy"]
    batch1 = [  # arrives first
        (1, 500, "cart"),   # user 1: cart BEFORE its view arrives
        (2, 100, "view"),
        (2, 200, "cart"),
        (3, 100, "buy"),    # buy with no prefix → stuck at 0
        (1, 900, "buy"),
    ]
    batch2 = [  # arrives second, timestamps EARLIER than batch1's
        (1, 300, "view"),   # retroactively completes view→cart→buy
        (2, 950, "buy"),
        (3, 400, "view"),
    ]
    schema = "u long, ep long, step string"

    def to_df(rows):
        return spark.createDataFrame(rows, schema).select(
            "u", F.timestamp_seconds("ep").alias("ts"), "step"
        )

    src = str(tmp_path / "src")
    to_df(batch1).coalesce(1).write.parquet(src)
    to_df(batch2).coalesce(1).write.mode("append").parquet(src)
    full = to_df(batch1 + batch2)

    stream = (
        spark.readStream.schema(full.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = streaming_funnel(stream, "u", "ts", "step", steps)
    q = (
        out.writeStream.format("memory")
        .queryName("sfunnel")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # last emitted row per key is the final state
    rows = spark.sql("SELECT * FROM sfunnel").collect()
    final: dict = {}
    for r in rows:  # keep the most-complete emission per key
        cur = (r.max_step, [r.step_1_ts, r.step_2_ts, r.step_3_ts])
        if r.key not in final or cur[0] >= final[r.key][0]:
            final[r.key] = cur

    expect = {
        r.u: (r.max_step, list(r.step_times))
        for r in funnel(full, "u", "ts", "step", steps).collect()
    }
    assert final == expect, f"{final} != {expect}"
    assert expect[1] == (3, [300, 500, 900])  # retroactive completion
    assert expect[3][0] == 1  # view only (buy preceded it)


def test_streaming_funnel_state_survives_restart(spark, tmp_path):
    """Stop the funnel query after the first file, restart from the
    checkpoint, feed a second file whose events retroactively complete
    the sequence: the state store must carry the buffered events across
    the restart, and the final answer must equal the batch funnel."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from distributedqueryengine_spark.operators.timeseries import funnel
    from distributedqueryengine_spark.streaming.stateful import streaming_funnel

    steps = ["view", "cart", "buy"]
    b1 = [(1, 500, "cart"), (1, 900, "buy")]
    b2 = [(1, 300, "view")]  # completes retroactively AFTER restart
    schema = "u long, ep long, step string"

    stage = str(tmp_path / "src")
    os.makedirs(stage)

    def add_file(name, rows):
        df = spark.createDataFrame(rows, schema).select(
            "u", F.timestamp_seconds("ep").alias("ts"), "step"
        )
        tmp = str(tmp_path / ("_" + name))
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        for f in glob.glob(tmp + "/*.parquet"):
            shutil.copy(f, f"{stage}/{name}.parquet")
        shutil.rmtree(tmp)

    add_file("b1", b1)
    src_schema = spark.read.parquet(stage).schema
    ckpt = str(tmp_path / "ckpt")
    emissions: list = []

    def start():
        # foreachBatch sink: the memory sink does not support
        # checkpoint recovery in update mode
        stream = (
            spark.readStream.schema(src_schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
        )
        out = streaming_funnel(stream, "u", "ts", "step", steps)
        return (
            out.writeStream.foreachBatch(
                lambda df, e: emissions.extend(df.collect())
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .start()
        )

    q = start()
    q.processAllAvailable()
    q.stop()
    assert emissions and all(r.max_step == 0 for r in emissions)  # cart/buy, no view

    add_file("b2", b2)  # arrives while the query is down
    q = start()
    q.processAllAvailable()
    q.stop()
    rows = emissions
    assert len(rows) >= 2, "restart must process the new file"
    final = max(rows, key=lambda r: r.max_step)
    full = spark.createDataFrame(b1 + b2, schema).select(
        "u", F.timestamp_seconds("ep").alias("ts"), "step"
    )
    expect = funnel(full, "u", "ts", "step", steps).collect()[0]
    assert final.max_step == expect.max_step == 3
    assert [final.step_1_ts, final.step_2_ts, final.step_3_ts] == list(
        expect.step_times
    ) == [300, 500, 900]


def _funnel_files(spark, tmp_path, batches, schema="u long, ep long, step string"):
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    stage = str(tmp_path / "src")
    os.makedirs(stage, exist_ok=True)
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, schema).select(
            "u", F.timestamp_seconds("ep").alias("ts"), "step"
        )
        tmp = str(tmp_path / f"_b{i}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        for f in glob.glob(tmp + "/*.parquet"):
            shutil.copy(f, f"{stage}/b{i}.parquet")
        shutil.rmtree(tmp)
    return stage, spark.read.parquet(stage).schema


def test_streaming_funnel_state_capped_under_hot_key(spark, tmp_path):
    """A planted hot key feeding hundreds of events across micro-batches
    never holds more than max_events_per_key events in state; the
    overflow is flagged, not silent."""
    from distributedqueryengine_spark.streaming.stateful import streaming_funnel

    steps = ["view", "cart", "buy"]
    b1 = [(1, 1000 + i, "view") for i in range(120)]
    b2 = [(1, 2000 + i, "cart") for i in range(120)] + [(2, 10, "view"), (2, 20, "cart")]
    stage, schema = _funnel_files(spark, tmp_path, [b1, b2])

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(stage)
    )
    out = streaming_funnel(stream, "u", "ts", "step", steps, max_events_per_key=50)
    q = (
        out.writeStream.format("memory")
        .queryName("sfunnel_cap")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM sfunnel_cap").collect()
    assert rows
    for r in rows:
        assert r.n_state_events <= 50, r
    hot_final = max((r for r in rows if r.key == 1), key=lambda r: r.n_state_events)
    assert hot_final.truncated is True
    assert hot_final.n_state_events == 50
    # capped-prefix semantics: earliest 50 events are all 'view' → max_step 1
    assert hot_final.max_step == 1
    normal = max((r for r in rows if r.key == 2), key=lambda r: r.max_step)
    assert normal.truncated is False and normal.max_step == 2


def test_streaming_funnel_within_window_trims_state(spark, tmp_path):
    """With within_seconds set, events beyond first(step0)+within are
    provably irrelevant and leave state — the lossless bound — while
    the funnel answer still matches the batch operator."""
    from pyspark.sql import functions as F

    from distributedqueryengine_spark.operators.timeseries import funnel
    from distributedqueryengine_spark.streaming.stateful import streaming_funnel

    steps = ["view", "cart", "buy"]
    b1 = [(1, 100, "view"), (1, 120, "cart")]
    # junk far outside the 50s window: can never fill a slot
    b2 = [(1, 10_000 + i, "cart") for i in range(80)] + [(1, 140, "buy")]
    stage, schema = _funnel_files(spark, tmp_path, [b1, b2])

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(stage)
    )
    out = streaming_funnel(stream, "u", "ts", "step", steps, within_seconds=50)
    q = (
        out.writeStream.format("memory")
        .queryName("sfunnel_trim")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM sfunnel_trim").collect()
    final = max(rows, key=lambda r: r.max_step)
    assert final.max_step == 3
    # state kept only the in-window events (view/cart/buy), not the junk
    assert final.n_state_events == 3
    assert final.truncated is False  # trim is lossless, not truncation
    full = spark.createDataFrame(b1 + b2, "u long, ep long, step string").select(
        "u", F.timestamp_seconds("ep").alias("ts"), "step"
    )
    expect = funnel(full, "u", "ts", "step", steps, within_seconds=50).collect()[0]
    assert final.max_step == expect.max_step
    assert [final.step_1_ts, final.step_2_ts, final.step_3_ts] == list(
        expect.step_times
    )


def test_streaming_funnel_string_key(spark, tmp_path):
    """The output/state key type follows the input key column — a string
    key must not be forced through a hardcoded LongType encoding."""
    from distributedqueryengine_spark.streaming.stateful import streaming_funnel

    steps = ["view", "buy"]
    b1 = [("alice", 10, "view"), ("alice", 20, "buy"), ("bob", 5, "buy")]
    stage, schema = _funnel_files(
        spark, tmp_path, [b1], schema="u string, ep long, step string"
    )
    stream = spark.readStream.schema(schema).parquet(stage)
    out = streaming_funnel(stream, "u", "ts", "step", steps)
    q = (
        out.writeStream.format("memory")
        .queryName("sfunnel_str")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {r.key: r for r in spark.sql("SELECT * FROM sfunnel_str").collect()}
    assert rows["alice"].max_step == 2
    assert rows["bob"].max_step == 0
