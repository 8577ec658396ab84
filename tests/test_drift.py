"""PSI drift monitoring: reference-vs-identical ≈ 0, planted shift
crosses the action threshold, streaming monitor ≡ batch scoring."""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import functions as F

from distributedqueryengine_spark.functions.drift import (
    fit_reference_histogram,
    psi_score,
    stream_drift_monitor,
)


def test_psi_identical_and_shifted(spark, tables):
    ref = tables["lineitem"].select("l_extendedprice")
    frozen = fit_reference_histogram(ref, "l_extendedprice", n_bins=10)
    assert abs(sum(frozen["shares"]) - 1.0) < 1e-9

    same = psi_score(ref, "l_extendedprice", frozen)
    assert same["psi"] < 1e-9  # identical data scores ~0

    # planted shift: +40% price level moves mass across bins
    shifted = ref.select((F.col("l_extendedprice") * 1.4).alias("l_extendedprice"))
    drift = psi_score(shifted, "l_extendedprice", frozen)
    assert drift["psi"] > 0.25, drift  # industry action threshold

    # mild noise stays under the action threshold
    mild = ref.select((F.col("l_extendedprice") * 1.01).alias("l_extendedprice"))
    assert psi_score(mild, "l_extendedprice", frozen)["psi"] < 0.25


def test_psi_reference_hist_matches_duckdb(spark, tables):
    """The frozen reference shares equal DuckDB's fixed-edge histogram."""
    import duckdb

    ref = tables["lineitem"].select("l_extendedprice")
    frozen = fit_reference_histogram(ref, "l_extendedprice", n_bins=8)
    con = duckdb.connect()
    rows = con.execute(
        """
        WITH x AS (
          SELECT CAST(l_extendedprice AS DOUBLE) AS x
          FROM read_parquet('/root/testdata/sf0.001/lineitem.parquet')
          WHERE l_extendedprice IS NOT NULL
        )
        SELECT CAST(least(greatest(floor((x - ?) / ((? - ?) / 8)), 0), 7) AS INTEGER) AS bin,
               count(*) AS n
        FROM x GROUP BY 1 ORDER BY 1
        """,
        [frozen["lo"], frozen["hi"], frozen["lo"]],
    ).fetchall()
    n = sum(r[1] for r in rows)
    expect = {b: c / n for b, c in rows}
    for i, s in enumerate(frozen["shares"]):
        assert abs(s - expect.get(i, 0.0)) < 1e-12, i


def test_stream_drift_monitor_matches_batch(spark, tmp_path, tables):
    """Per-micro-batch PSI from the streaming monitor equals batch
    psi_score over the same file; the drifted batch is flagged."""
    ref = tables["lineitem"].select("l_extendedprice")
    frozen = fit_reference_histogram(ref, "l_extendedprice", n_bins=10)

    stage = str(tmp_path / "src")
    os.makedirs(stage)

    def add_file(name, df):
        tmp = str(tmp_path / ("_" + name))
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        for f in glob.glob(tmp + "/*.parquet"):
            shutil.copy(f, f"{stage}/{name}.parquet")
        shutil.rmtree(tmp)

    normal = ref.limit(2000)
    drifted = ref.limit(2000).select(
        (F.col("l_extendedprice") * 1.5).alias("l_extendedprice")
    )
    add_file("b0_normal", normal)
    add_file("b1_drifted", drifted)

    schema = spark.read.parquet(stage).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(stage)
    )
    sink: list = []
    q = stream_drift_monitor(
        stream, "l_extendedprice", frozen,
        sink=sink, checkpoint=str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    assert len(sink) == 2
    scores = sorted(sink, key=lambda r: r["batch_id"])
    # stream ≡ batch on each file's content
    b_normal = psi_score(normal, "l_extendedprice", frozen)["psi"]
    b_drift = psi_score(drifted, "l_extendedprice", frozen)["psi"]
    got = sorted(round(s["psi"], 6) for s in scores)
    assert got == sorted(round(x, 6) for x in (b_normal, b_drift))
    assert max(got) > 0.25 and min(got) < 0.25


def test_categorical_psi(spark, tables):
    """Identical categorical data scores ~0; collapsing the dominant
    category into another crosses the action threshold; novel unseen
    categories pool into <other> instead of erroring."""
    from distributedqueryengine_spark.functions.drift import (
        categorical_psi_score,
        fit_reference_categories,
    )

    ev = tables["events"].select("event_type")
    frozen = fit_reference_categories(ev, "event_type", top_n=10)
    assert abs(sum(frozen["shares"].values()) - 1.0) < 1e-9

    same = categorical_psi_score(ev, "event_type", frozen)
    assert same["psi"] < 1e-6

    # planted shift: rename the modal category (its mass moves to <other>)
    top_cat = frozen["categories"][0]
    shifted = ev.select(
        F.when(F.col("event_type") == top_cat, F.lit("BRAND_NEW_TYPE"))
        .otherwise(F.col("event_type"))
        .alias("event_type")
    )
    drift = categorical_psi_score(shifted, "event_type", frozen)
    assert drift["psi"] > 0.25, drift
    # the novel category pooled into <other>
    from distributedqueryengine_spark.functions.drift import OTHER

    assert drift["shares"].get(OTHER, 0) > 0


def test_stream_categorical_drift_monitor(spark, tmp_path, tables):
    """Streaming categorical scores equal batch scoring per file; the
    renamed-category batch is flagged."""
    import glob
    import os
    import shutil

    from distributedqueryengine_spark.functions.drift import (
        categorical_psi_score,
        fit_reference_categories,
        stream_categorical_drift_monitor,
    )

    ev = tables["events"].select("event_type")
    frozen = fit_reference_categories(ev, "event_type", top_n=10)
    top_cat = frozen["categories"][0]

    stage = str(tmp_path / "src")
    os.makedirs(stage)

    def add_file(name, df):
        tmp = str(tmp_path / ("_" + name))
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        for f in glob.glob(tmp + "/*.parquet"):
            shutil.copy(f, f"{stage}/{name}.parquet")
        shutil.rmtree(tmp)

    normal = ev.limit(3000)
    shifted = ev.limit(3000).select(
        F.when(F.col("event_type") == top_cat, F.lit("NEW_TYPE"))
        .otherwise(F.col("event_type"))
        .alias("event_type")
    )
    add_file("b0", normal)
    add_file("b1", shifted)

    schema = spark.read.parquet(stage).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(stage)
    )
    sink: list = []
    q = stream_categorical_drift_monitor(
        stream, "event_type", frozen,
        sink=sink, checkpoint=str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    assert len(sink) == 2
    got = sorted(round(s["psi"], 6) for s in sink)
    expect = sorted(
        round(categorical_psi_score(d, "event_type", frozen)["psi"], 6)
        for d in (normal, shifted)
    )
    assert got == expect
    assert max(got) > 0.25 and min(got) < 0.1


def test_stream_drift_monitor_parquet_sink_replay_idempotent(
    spark, tmp_path, tables
):
    """Production sink contract: scores land one row per batch in a
    batch_id-partitioned parquet dir; a restart with the same
    checkpoint re-emits nothing, and a simulated crash-replay of a
    batch REWRITES its partition instead of duplicating rows."""
    from distributedqueryengine_spark.streaming.sinks import (
        write_batch_idempotent,
    )

    ref = tables["lineitem"].select("l_extendedprice")
    frozen = fit_reference_histogram(ref, "l_extendedprice", n_bins=10)

    stage = str(tmp_path / "src")
    os.makedirs(stage)

    def add_file(name, df):
        tmp = str(tmp_path / ("_" + name))
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        for f in glob.glob(tmp + "/*.parquet"):
            shutil.copy(f, f"{stage}/{name}.parquet")
        shutil.rmtree(tmp)

    add_file("b0", ref.limit(1000))
    add_file(
        "b1",
        ref.limit(1000).select(
            (F.col("l_extendedprice") * 1.5).alias("l_extendedprice")
        ),
    )

    schema = spark.read.parquet(stage).schema
    scores = str(tmp_path / "scores")
    ckpt = str(tmp_path / "ckpt")

    def start():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
        )
        return stream_drift_monitor(
            stream, "l_extendedprice", frozen, checkpoint=ckpt, path=scores
        )

    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.read.parquet(scores)
    rows = out.collect()
    assert len(rows) == 2
    assert sorted(r.batch_id for r in rows) == [0, 1]
    assert all(r.n == 1000 for r in rows)

    # restart from the same checkpoint, no new data -> no new rows
    q2 = start()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert spark.read.parquet(scores).count() == 2

    # crash replay of batch 1: rewrite, don't duplicate
    replay = spark.createDataFrame(
        [(float(rows[0].psi), 1000)], "psi double, n long"
    )
    write_batch_idempotent(replay, 1, scores)
    after = spark.read.parquet(scores).collect()
    assert len(after) == 2
    assert sorted(r.batch_id for r in after) == [0, 1]


def test_stream_categorical_drift_monitor_parquet_sink(spark, tmp_path, tables):
    """Categorical monitor production path: scores land one row per
    batch under batch_id partitions, matching the driver-side sink."""
    from distributedqueryengine_spark.functions.drift import (
        fit_reference_categories,
        stream_categorical_drift_monitor,
    )

    ev = tables["events"].select("event_type")
    frozen = fit_reference_categories(ev, "event_type", top_n=10)
    stage = str(tmp_path / "src")
    os.makedirs(stage)
    tmp = str(tmp_path / "_b0")
    ev.limit(2000).coalesce(1).write.mode("overwrite").parquet(tmp)
    for f in glob.glob(tmp + "/*.parquet"):
        shutil.copy(f, f"{stage}/b0.parquet")
    shutil.rmtree(tmp)

    schema = spark.read.parquet(stage).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(stage)
    )
    sink: list = []
    scores = str(tmp_path / "scores")
    q = stream_categorical_drift_monitor(
        stream, "event_type", frozen,
        sink=sink, checkpoint=str(tmp_path / "ckpt"), path=scores,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.read.parquet(scores).collect()
    assert len(rows) == len(sink) == 1
    assert rows[0].batch_id == 0
    assert abs(rows[0].psi - sink[0]["psi"]) < 1e-12
    # n counts non-NULL event_type rows (the fixture has NULLs)
    assert rows[0].n == sink[0]["n"] > 0
