"""Streaming expectations: per-batch reports equal batch-evaluated
expectations on each file's rows; table-level checks are rejected."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributedqueryengine_spark.operators import expectations as E
from distributedqueryengine_spark.streaming.quality import stream_expectations


def test_stream_expectations_per_batch(spark, tables, tmp_path):
    ev = tables["events"].select("event_id", "user_id", "value").limit(400)
    # plant one violation: a negative value row
    bad = spark.createDataFrame([(999_999, 1, -5.0)], "event_id long, user_id long, value double")
    data = ev.unionByName(bad)
    src = str(tmp_path / "src")
    data.repartition(2).write.parquet(src)
    stream = (
        spark.readStream.schema(data.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    checks = [E.not_null("user_id"), E.in_range("value", 0, 1e9)]
    reports: list = []
    q = stream_expectations(
        stream, checks, lambda df, e: reports.extend(df.collect()),
        str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    epochs = {r.epoch_id for r in reports}
    assert len(epochs) >= 2  # one report per micro-batch
    by_check: dict = {}
    for r in reports:
        by_check.setdefault(r.check, []).append(r)
    # totals across batches == batch-mode evaluation on the full data
    full = {r.check: r for r in E.run_expectations(data, checks).collect()}
    for name, rows in by_check.items():
        assert sum(r.n_failed for r in rows) == full[name].n_failed
        assert sum(r.n_checked for r in rows) == full[name].n_checked
    assert not all(r.passed for r in by_check["in_range(value,0,1000000000.0)"])


def test_stream_expectations_rejects_table_level(spark, tables, tmp_path):
    stream = (
        spark.readStream.schema(tables["events"].schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path))
    )
    with pytest.raises(ValueError, match="table-level"):
        stream_expectations(
            stream,
            [E.not_null("user_id"), E.unique("event_id")],
            lambda df, e: None,
            str(tmp_path / "ckpt"),
        )
