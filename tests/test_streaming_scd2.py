"""Streaming SCD2 maintenance: incremental touched-keys rebuild ≡ batch
scd2_from_changes over the full change log, including late history
rewrites; partition-pruned merge leaves untouched keys byte-identical;
batch replay is idempotent."""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import functions as F

CHG_SCHEMA = "k long, ts long, name string"


def _mk(spark, rows):
    return spark.createDataFrame(rows, CHG_SCHEMA).select(
        "k", F.timestamp_seconds("ts").alias("ts"), "name"
    )


def _dim_rows(spark, path):
    return sorted(
        (r.k, r.name, r.valid_from, r.valid_to, r.is_current, r.version)
        for r in spark.read.parquet(path).collect()
    )


def _batch_reference(spark, rows):
    from distributedqueryengine_spark.operators.cdc import scd2_from_changes

    dim = scd2_from_changes(_mk(spark, rows), ["k"], "ts", ["name"], tiebreak=["name"])
    return sorted(
        (r.k, r.name, r.valid_from, r.valid_to, r.is_current, r.version)
        for r in dim.collect()
    )


def test_stream_scd2_apply_matches_batch_with_late_rewrite(spark, tmp_path):
    from distributedqueryengine_spark.streaming.scd2 import stream_scd2_apply

    b1 = [(1, 100, "alpha"), (2, 100, "x"), (1, 300, "beta")]
    b2 = [(1, 500, "gamma"), (2, 400, "y")]
    # LATE: ts=200 lands between alpha and beta → rewrites key 1's history
    b3 = [(1, 200, "mid"), (3, 50, "new")]
    batches = [b1, b2, b3]

    stage = str(tmp_path / "src")
    os.makedirs(stage)
    for i, rows in enumerate(batches):
        tmp = str(tmp_path / f"_b{i}")
        _mk(spark, rows).coalesce(1).write.mode("overwrite").parquet(tmp)
        for f in glob.glob(tmp + "/*.parquet"):
            shutil.copy(f, f"{stage}/b{i}.parquet")
        shutil.rmtree(tmp)

    dim_path = str(tmp_path / "dim")
    schema = spark.read.parquet(stage).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(stage)
    )
    sink: list = []
    q = stream_scd2_apply(
        stream, dim_path, ["k"], "ts", ["name"],
        sink=sink, checkpoint=str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    assert len(sink) == 3 and sink[0].get("created")
    got = _dim_rows(spark, dim_path)
    assert got == _batch_reference(spark, b1 + b2 + b3)
    # the late rewrite really happened: key 1 is alpha→mid→beta→gamma
    k1 = [(r[1], r[5]) for r in got if r[0] == 1]
    assert sorted(k1, key=lambda t: t[1]) == [
        ("alpha", 1), ("mid", 2), ("beta", 3), ("gamma", 4),
    ]


def test_apply_scd2_batch_idempotent_and_pruned(spark, tmp_path):
    """Replaying a batch leaves the dimension unchanged; with
    partition_by, untouched keys' partition files stay byte-identical."""
    from distributedqueryengine_spark.streaming.scd2 import apply_scd2_batch

    dim_path = str(tmp_path / "dim")
    b1 = [(1, 100, "a"), (2, 100, "p"), (3, 100, "u")]
    apply_scd2_batch(
        spark, _mk(spark, b1), dim_path, ["k"], "ts", ["name"],
        partition_by=["k"],
    )
    b2 = [(1, 200, "b")]

    def snap(d):
        out = {}
        for dp, _dirs, files in os.walk(d):
            for f in files:
                p = os.path.join(dp, f)
                st = os.stat(p)
                out[os.path.relpath(p, d)] = (st.st_size, st.st_mtime_ns)
        return out

    untouched_before = {
        d: snap(os.path.join(dim_path, d))
        for d in os.listdir(dim_path)
        if d in ("k=2", "k=3")
    }
    stats = apply_scd2_batch(
        spark, _mk(spark, b2), dim_path, ["k"], "ts", ["name"],
        partition_by=["k"],
    )
    assert stats["partitions_rewritten"] == ["k=1"]
    for d, before in untouched_before.items():
        assert snap(os.path.join(dim_path, d)) == before, d
    after = _dim_rows(spark, dim_path)
    assert after == _batch_reference(spark, b1 + b2)

    # idempotent replay of the same batch
    again = apply_scd2_batch(
        spark, _mk(spark, b2), dim_path, ["k"], "ts", ["name"],
        partition_by=["k"],
    )
    assert _dim_rows(spark, dim_path) == after
    assert again["n_changes"] == 1
