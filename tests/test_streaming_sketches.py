"""Continuous heavy hitters over a stream: per-batch MG summaries merge
into k-bounded monitor state whose estimates bracket exact counts."""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import functions as F


def test_stream_heavy_hitters_brackets_truth(spark, tables, tmp_path):
    from distributedqueryengine_spark.streaming.sketches import (
        stream_heavy_hitters,
    )

    ev = tables["events"].select("event_type")
    n = ev.count()
    truth = {
        r.event_type: r.n
        for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }

    stage = str(tmp_path / "src")
    os.makedirs(stage)
    # three disjoint micro-batches covering the whole table
    chunks = ev.randomSplit([1.0, 1.0, 1.0], seed=7)
    for i, chunk in enumerate(chunks):
        tmp = str(tmp_path / f"_b{i}")
        chunk.coalesce(1).write.mode("overwrite").parquet(tmp)
        for f in glob.glob(tmp + "/*.parquet"):
            shutil.copy(f, f"{stage}/b{i}.parquet")
        shutil.rmtree(tmp)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    q, mon = stream_heavy_hitters(
        stream, "event_type", k=8, checkpoint=str(tmp_path / "ckpt")
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    est = dict((i, (lo, hi)) for i, lo, hi in mon.estimates())
    assert est, "monitor saw no data"
    threshold = n / (8 + 1)
    for item, true_n in truth.items():
        if true_n > threshold:
            assert item in est, (item, true_n, threshold)
    for item, (lo, hi) in est.items():
        assert lo <= truth[item] <= hi, (item, lo, truth[item], hi)
    # monitor state is k-bounded
    assert len(mon.counters) <= 8
    # top-1 is the true mode
    top1 = mon.estimates(top=1)[0][0]
    assert truth[top1] == max(truth.values())


def test_stream_heavy_hitters_parquet_sink_replay_idempotent(
    spark, tables, tmp_path
):
    """Heavy-hitter summaries land per batch in batch_id-partitioned
    parquet; the LAST partition equals the monitor's stream-so-far
    estimates, and a simulated replayed batch write rewrites its own
    partition without duplicating rows."""
    from distributedqueryengine_spark.streaming.sinks import (
        write_batch_idempotent,
    )
    from distributedqueryengine_spark.streaming.sketches import (
        stream_heavy_hitters,
    )

    ev = tables["events"].select("event_type")
    stage = str(tmp_path / "src")
    os.makedirs(stage)
    chunks = ev.randomSplit([1.0, 1.0], seed=11)
    for i, chunk in enumerate(chunks):
        tmp = str(tmp_path / f"_b{i}")
        chunk.coalesce(1).write.mode("overwrite").parquet(tmp)
        for f in glob.glob(tmp + "/*.parquet"):
            shutil.copy(f, f"{stage}/b{i}.parquet")
        shutil.rmtree(tmp)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    summaries = str(tmp_path / "hh")
    q, mon = stream_heavy_hitters(
        stream, "event_type", k=8,
        checkpoint=str(tmp_path / "ckpt"), path=summaries,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    out = spark.read.parquet(summaries)
    batch_ids = sorted(r.batch_id for r in out.select("batch_id").distinct().collect())
    assert batch_ids == [0, 1]
    last = {
        r.item: (r.count_lo, r.count_hi)
        for r in out.filter(F.col("batch_id") == 1).collect()
    }
    assert last == {i: (lo, hi) for i, lo, hi in mon.estimates()}

    # replayed final batch rewrites its partition, no duplicates
    replay = spark.createDataFrame(
        [(str(i), int(lo), int(hi)) for i, lo, hi in mon.estimates()],
        "item string, count_lo long, count_hi long",
    )
    n_before = out.count()
    write_batch_idempotent(replay, 1, summaries)
    assert spark.read.parquet(summaries).count() == n_before


def test_stream_quantiles_exactly_equal_batch_build(spark, tables, tmp_path):
    """The streaming quantile monitor's stream-so-far sample is EXACTLY
    the batch build over all ingested rows (bottom-k merge is exact,
    not approximate), and the parquet sink lands one estimates row per
    batch."""
    from distributedqueryengine_spark.operators.aggregates import (
        quantile_state_build,
    )
    from distributedqueryengine_spark.streaming.sketches import stream_quantiles

    ev = tables["events"].select("event_id", "value").withColumn(
        "__rid", F.col("event_id").cast("string")
    )
    stage = str(tmp_path / "src")
    os.makedirs(stage)
    chunks = ev.randomSplit([1.0, 1.0, 1.0], seed=13)
    for i, chunk in enumerate(chunks):
        tmp = str(tmp_path / f"_b{i}")
        chunk.coalesce(1).write.mode("overwrite").parquet(tmp)
        for f in glob.glob(tmp + "/*.parquet"):
            shutil.copy(f, f"{stage}/b{i}.parquet")
        shutil.rmtree(tmp)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    qpath = str(tmp_path / "q")
    q, mon = stream_quantiles(
        stream, "value", "__rid", r=128,
        checkpoint=str(tmp_path / "ckpt"), path=qpath, probs=(0.5, 0.9),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    direct = quantile_state_build(ev, [], "value", "__rid", r=128).collect()[0]
    assert mon.n == direct["n"]
    assert mon.sample == [(e["rank"], e["v"]) for e in direct["sample"]]

    out = spark.read.parquet(qpath)
    assert out.count() == 3  # one estimates row per batch
    last = out.orderBy(F.col("batch_id").desc()).first()
    est = mon.estimates([0.5, 0.9])
    assert last.n == mon.n
    assert last.q_0_5 == est[0.5] and last.q_0_9 == est[0.9]


def test_stream_distinct_exactly_equal_batch_build(spark, tables, tmp_path):
    """The streaming KMV monitor's stream-so-far state is EXACTLY the
    batch kmv_build over all ingested rows, the estimate is within the
    KMV error envelope, and the sink lands one row per batch."""
    from distributedqueryengine_spark.operators.aggregates import kmv_build
    from distributedqueryengine_spark.streaming.sketches import stream_distinct

    ev = tables["events"].select("event_id", "user_id")
    stage = str(tmp_path / "src")
    os.makedirs(stage)
    chunks = ev.randomSplit([1.0, 1.0, 1.0], seed=29)
    for i, chunk in enumerate(chunks):
        tmp = str(tmp_path / f"_b{i}")
        chunk.coalesce(1).write.mode("overwrite").parquet(tmp)
        for f in glob.glob(tmp + "/*.parquet"):
            shutil.copy(f, f"{stage}/b{i}.parquet")
        shutil.rmtree(tmp)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    dpath = str(tmp_path / "d")
    q, mon = stream_distinct(
        stream, "user_id", k=64,
        checkpoint=str(tmp_path / "ckpt"), path=dpath,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    direct = kmv_build(ev, [], "user_id", k=64).collect()[0]
    assert mon.kmin == list(direct["kmin"])  # exact state equality
    truth = ev.select("user_id").distinct().count()
    est = mon.estimate()
    assert abs(est - truth) / truth < 0.6  # k=64 → ~12% σ, 4.5σ envelope

    out = spark.read.parquet(dpath)
    assert out.count() == 3
    last = out.orderBy(F.col("batch_id").desc()).first()
    assert last.n_distinct_est == round(est, 10) or abs(last.n_distinct_est - est) < 1e-6


def _stage_file(df, stage: str, name: str, tmp_path) -> None:
    tmp = str(tmp_path / f"_stage_{name}")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    for f in glob.glob(tmp + "/*.parquet"):
        shutil.copy(f, f"{stage}/{name}.parquet")
    shutil.rmtree(tmp)


def test_stream_distinct_state_survives_restart(spark, tables, tmp_path):
    """Monitor state persists under the estimates sink: a monitor-less
    restart (same streaming checkpoint) restores the fold and continues
    EXACTLY — final KMV state equals a single uninterrupted run's."""
    from distributedqueryengine_spark.streaming.sketches import (
        KMVMonitor,
        stream_distinct,
    )

    ev = tables["events"].select("user_id")
    chunks = ev.randomSplit([1.0, 1.0, 1.0], seed=11)
    stage = str(tmp_path / "src")
    os.makedirs(stage)
    _stage_file(chunks[0], stage, "b0", tmp_path)
    _stage_file(chunks[1], stage, "b1", tmp_path)

    sink = str(tmp_path / "est")
    ckpt = str(tmp_path / "ckpt")

    def start():
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
        )
        return stream_distinct(
            stream, "user_id", k=64, checkpoint=ckpt, path=sink
        )

    q1, mon1 = start()
    try:
        q1.processAllAvailable()
    finally:
        q1.stop()
    assert mon1.last_batch_id == 1 and mon1.kmin

    # "crash": process dies (monitor object lost); a third file arrives
    _stage_file(chunks[2], stage, "b2", tmp_path)
    q2, mon2 = start()  # monitor=None -> restores from _monitor_state
    assert mon2.kmin == mon1.kmin  # restored, not fresh
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    # uninterrupted reference fold over the same three chunks
    ref = KMVMonitor(64)
    from distributedqueryengine_spark.operators.aggregates import kmv_build

    for ch in chunks:
        st = kmv_build(ch, [], "user_id", k=64).collect()
        if st:
            ref.merge_state(st[0]["kmin"])
    assert mon2.kmin == ref.kmin
    assert mon2.estimate() == ref.estimate()


def test_stream_quantiles_state_survives_restart(spark, tables, tmp_path):
    """Same restart contract for the bottom-k quantile monitor: n and
    the sample continue exactly (bottom-k merge is exact)."""
    from distributedqueryengine_spark.operators.aggregates import (
        quantile_state_build,
    )
    from distributedqueryengine_spark.streaming.sketches import (
        QuantileMonitor,
        stream_quantiles,
    )

    ev = tables["events"].select("event_id", "value")
    chunks = ev.randomSplit([1.0, 1.0], seed=13)
    stage = str(tmp_path / "src")
    os.makedirs(stage)
    _stage_file(chunks[0], stage, "b0", tmp_path)

    sink = str(tmp_path / "est")
    ckpt = str(tmp_path / "ckpt")

    def start():
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
        )
        return stream_quantiles(
            stream, "value", "event_id", r=128, checkpoint=ckpt, path=sink
        )

    q1, mon1 = start()
    try:
        q1.processAllAvailable()
    finally:
        q1.stop()

    _stage_file(chunks[1], stage, "b1", tmp_path)
    q2, mon2 = start()
    assert mon2.n == mon1.n and mon2.sample == mon1.sample
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    ref = QuantileMonitor(128)
    for ch in chunks:
        st = quantile_state_build(ch, [], "value", "event_id", r=128).collect()
        if st:
            row = st[0]
            ref.merge_state(
                row["n"], [(e["rank"], e["v"]) for e in row["sample"]]
            )
    assert mon2.n == ref.n
    assert mon2.sample == ref.sample


def test_stream_heavy_hitters_replayed_batch_not_double_counted(
    spark, tables, tmp_path
):
    """A fresh streaming checkpoint re-reads the same files with batch
    ids restarting at 0. Monitor state is bound to ONE checkpoint
    lifetime (r12): the leftover state file is ignored, the fold
    restarts, and re-folding the same single source file lands on the
    same counts — never doubled (stale state merged again) and never
    silently skipped (stale last_batch_id suppressing new batches)."""
    from distributedqueryengine_spark.streaming.sketches import (
        stream_heavy_hitters,
    )

    ev = tables["events"].select("event_type")
    stage = str(tmp_path / "src")
    os.makedirs(stage)
    _stage_file(ev, stage, "b0", tmp_path)
    sink = str(tmp_path / "est")

    def start(ck):
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
        )
        return stream_heavy_hitters(
            stream, "event_type", k=8, checkpoint=str(tmp_path / ck), path=sink
        )

    q1, mon1 = start("ck1")
    try:
        q1.processAllAvailable()
    finally:
        q1.stop()
    est1 = mon1.estimates()

    # NEW checkpoint: the file source re-emits the same file as batch 0
    # — a pure replay from the monitor's point of view
    q2, mon2 = start("ck2")
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert mon2.estimates() == est1  # skipped, not double-counted


def test_stream_heavy_hitters_stale_state_does_not_skip_new_data(
    spark, tables, tmp_path
):
    """The ADVICE r11 failure scenario: a leftover state file with a
    high last_batch_id plus a FRESH checkpoint (batch ids restart at
    0) must NOT silently skip folding genuinely new data. State is
    bound to the checkpoint identity, so run 2 starts a fresh fold and
    its counts reflect ALL the data it read."""
    from distributedqueryengine_spark.streaming.sketches import (
        stream_heavy_hitters,
    )

    ev = tables["events"].select("event_type")
    chunks = ev.randomSplit([1.0, 1.0, 1.0], seed=23)
    stage = str(tmp_path / "src")
    os.makedirs(stage)
    # run 1 folds three files under ck1 -> last_batch_id == 2 on disk
    for i in range(3):
        _stage_file(chunks[i], stage, f"b{i}", tmp_path)
    sink = str(tmp_path / "est")

    def start(ck):
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
        )
        return stream_heavy_hitters(
            stream, "event_type", k=8, checkpoint=str(tmp_path / ck), path=sink
        )

    q1, mon1 = start("ck1")
    try:
        q1.processAllAvailable()
    finally:
        q1.stop()
    assert mon1.last_batch_id == 2

    # fresh checkpoint: source re-reads all three files as batches 0-2.
    # Under the old guard the stale last_batch_id=2 suppressed ALL of
    # them; now the stale state is ignored and the fold re-runs fully.
    q2, mon2 = start("ck2")
    assert mon2.last_batch_id == -1  # stale state not restored
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert mon2.last_batch_id == 2  # new batches actually folded
    assert mon2.estimates() == mon1.estimates()


def test_stream_heavy_hitters_state_file_uri_scheme(spark, tables, tmp_path):
    """An explicit file: URI sink exercises the Hadoop-FS state path
    (the non-POSIX branch routes through the same code for hdfs/s3a):
    state persists, restores under the same checkpoint, and continues."""
    from distributedqueryengine_spark.streaming.sketches import (
        stream_heavy_hitters,
    )

    ev = tables["events"].select("event_type")
    chunks = ev.randomSplit([1.0, 1.0], seed=31)
    stage = str(tmp_path / "src")
    os.makedirs(stage)
    _stage_file(chunks[0], stage, "b0", tmp_path)
    sink = str(tmp_path / "est")
    ckpt = str(tmp_path / "ckpt")
    # force the Hadoop FS branch: scheme-qualified state path
    state = "file://" + str(tmp_path / "state_dir")

    def start():
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
        )
        return stream_heavy_hitters(
            stream, "event_type", k=8, checkpoint=ckpt, path=sink,
            state_path=state,
        )

    q1, mon1 = start()
    try:
        q1.processAllAvailable()
    finally:
        q1.stop()
    assert mon1.last_batch_id == 0

    _stage_file(chunks[1], stage, "b1", tmp_path)
    q2, mon2 = start()  # monitor=None -> restore via Hadoop FS read
    assert mon2.last_batch_id == 0  # restored
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert mon2.last_batch_id == 1

    # uninterrupted single-pass reference over both chunks
    from distributedqueryengine_spark.operators.aggregates import mg_summary
    from distributedqueryengine_spark.streaming.sketches import (
        HeavyHittersMonitor,
    )

    ref = HeavyHittersMonitor(8)
    for ch in chunks:
        ref.merge_summary(
            [(r.item, r.c) for r in mg_summary(ch, "event_type", k=8).collect()]
        )
    assert mon2.estimates() == ref.estimates()


def test_hadoop_state_commit_atomic_and_tmp_recovery(spark, tmp_path):
    """ADVICE r12: the Hadoop-FS state commit must not lose the WHOLE
    accumulated state to a crash between delete(dst) and rename. The
    preferred path is a single FileContext OVERWRITE rename; and even
    when only the fallback exists, a dst-missing/.tmp-present layout
    (the exact crash window) must restore from the .tmp."""
    from distributedqueryengine_spark.streaming.sketches import (
        _hadoop_fs,
        _load_state,
        _save_state,
    )

    fname = "file://" + str(tmp_path / "st" / "state.json")

    # overwrite an EXISTING dst repeatedly — exercises the OVERWRITE
    # rename (or fallback) with dst present; latest write wins
    _save_state(spark, fname, {"v": 1})
    _save_state(spark, fname, {"v": 2})
    assert _load_state(spark, fname) == {"v": 2}
    # no stray .tmp after a clean commit
    jvm, fs, dst = _hadoop_fs(spark, fname)
    assert not fs.exists(jvm.org.apache.hadoop.fs.Path(fname + ".tmp"))

    # simulate the fallback crash window: fully-written .tmp, dst gone
    tmp = jvm.org.apache.hadoop.fs.Path(fname + ".tmp")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(b'{"v": 3}'))
    finally:
        out.close()
    fs.delete(dst, False)
    assert _load_state(spark, fname) == {"v": 3}  # recovered, not None
