"""Effectively-once parquet sink: stream content equals the source with
no duplicates, an explicit batch REPLAY leaves the output identical,
and a checkpoint restart does not re-append old batches."""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import functions as F

from distributedqueryengine_spark.streaming.sinks import (
    exactly_once_parquet_sink,
    write_batch_idempotent,
)


def _stage(spark, tmp_path, batches):
    stage = str(tmp_path / "src")
    os.makedirs(stage, exist_ok=True)
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, "id long, v string")
        tmp = str(tmp_path / f"_b{i}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        for f in glob.glob(tmp + "/*.parquet"):
            shutil.copy(f, f"{stage}/b{i}.parquet")
        shutil.rmtree(tmp)
    return stage


def test_exactly_once_sink_and_replay(spark, tmp_path):
    b1 = [(1, "a"), (2, "b")]
    b2 = [(3, "c")]
    stage = _stage(spark, tmp_path, [b1, b2])
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = spark.read.parquet(stage).schema

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(stage)
    )
    q = exactly_once_parquet_sink(stream, out, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = spark.read.parquet(out)
    assert sorted((r.id, r.v) for r in got.collect()) == sorted(b1 + b2)
    batch_ids = {r.batch_id for r in got.select("batch_id").distinct().collect()}
    assert len(batch_ids) == 2

    # explicit REPLAY of a committed batch: rewrite its partition only —
    # content identical, no duplicates, other batches untouched
    replay_id = sorted(batch_ids)[0]
    replay_df = spark.createDataFrame(b1, "id long, v string")
    before_other = sorted(
        tuple(r)
        for r in spark.read.parquet(out)
        .filter(F.col("batch_id") != replay_id)
        .collect()
    )
    write_batch_idempotent(replay_df, replay_id, out)
    after = spark.read.parquet(out)
    assert sorted((r.id, r.v) for r in after.collect()) == sorted(b1 + b2)
    assert (
        sorted(
            tuple(r)
            for r in after.filter(F.col("batch_id") != replay_id).collect()
        )
        == before_other
    )

    # restart from the checkpoint with a NEW file: old batches not
    # re-appended, the new one lands
    b3 = [(4, "d")]
    df3 = spark.createDataFrame(b3, "id long, v string")
    tmp = str(tmp_path / "_b3")
    df3.coalesce(1).write.mode("overwrite").parquet(tmp)
    for f in glob.glob(tmp + "/*.parquet"):
        shutil.copy(f, f"{stage}/b3.parquet")
    shutil.rmtree(tmp)

    stream2 = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(stage)
    )
    q2 = exactly_once_parquet_sink(stream2, out, ckpt)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    final = spark.read.parquet(out)
    assert sorted((r.id, r.v) for r in final.collect()) == sorted(b1 + b2 + b3)
