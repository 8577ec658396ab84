"""Streaming ANN probe ≡ batch probe (streaming/annprobe.py).

The probe is per-query independent (candidates, scoring, and top-k
never look across queries), so splitting a query set over micro-batches
must yield exactly the batch result's rows — pinned here with a 2-file
stream (≥2 epochs) against the same prebuilt LSH index.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

PARAMS = dict(n_planes=8, n_tables=8, seed=7)
DIM = 64
K = 5


@pytest.fixture(scope="module")
def built(spark, tables):
    from distributedqueryengine_spark.functions.similarity import build_lsh_index

    corpus = tables["embeddings"].select("vec_id", "embedding").persist()
    idx = build_lsh_index(corpus, DIM, **PARAMS).persist()
    idx.count()
    yield corpus, idx
    idx.unpersist()
    corpus.unpersist()


def test_stream_ann_probe_matches_batch(spark, built, tmp_path):
    from distributedqueryengine_spark.functions.similarity import probe_lsh_index
    from distributedqueryengine_spark.streaming.annprobe import (
        lsh_probe_batcher,
        stream_ann_topk,
    )

    corpus, idx = built
    queries = corpus.filter(F.col("vec_id") % 11 == 0).persist()
    n_queries = queries.count()
    assert n_queries >= 20

    qdir = str(tmp_path / "qstream")
    queries.repartition(2).write.parquet(qdir)
    stream = (
        spark.readStream.schema(queries.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(qdir)
    )

    got_rows: list = []
    epochs: list[int] = []

    def sink(df, epoch_id):
        epochs.append(epoch_id)
        got_rows.extend(df.collect())

    probe = lsh_probe_batcher(idx, corpus, K, DIM, **PARAMS)
    q = stream_ann_topk(stream, probe, sink, str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    assert len(epochs) >= 2, "stream must have probed across >=2 micro-batches"

    expect = probe_lsh_index(idx, corpus, queries, K, DIM, **PARAMS).collect()
    key = lambda r: (r.query_id, r.rnk)  # noqa: E731
    got_map = {key(r): (r.neighbor_id, r.cos) for r in got_rows}
    exp_map = {key(r): (r.neighbor_id, r.cos) for r in expect}
    assert got_map == exp_map
    assert {r.query_id for r in got_rows} == {
        r.vec_id for r in queries.select("vec_id").collect()
    } & {r.query_id for r in expect}  # every query with candidates answered
    queries.unpersist()


def test_stream_ivf_probe_matches_batch(spark, built, tmp_path):
    """Same stream ≡ batch property for the IVF batcher."""
    from distributedqueryengine_spark.functions.similarity import (
        build_ivf_index,
        probe_ivf_index,
        train_ivf_centroids,
    )
    from distributedqueryengine_spark.streaming.annprobe import (
        ivf_probe_batcher,
        stream_ann_topk,
    )

    corpus, _ = built
    centroids = train_ivf_centroids(corpus, n_cells=24, sample_per_cell=8)
    idx = build_ivf_index(corpus, centroids).persist()
    idx.count()
    queries = corpus.filter(F.col("vec_id") % 13 == 0).persist()
    assert queries.count() >= 20

    qdir = str(tmp_path / "ivf_qstream")
    queries.repartition(2).write.parquet(qdir)
    stream = (
        spark.readStream.schema(queries.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(qdir)
    )
    got_rows: list = []
    probe = ivf_probe_batcher(idx, corpus, centroids, K, n_probe=4)
    q = stream_ann_topk(
        stream, probe, lambda df, _e: got_rows.extend(df.collect()),
        str(tmp_path / "ivf_ckpt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    expect = probe_ivf_index(idx, corpus, queries, centroids, K, n_probe=4).collect()
    key = lambda r: (r.query_id, r.rnk)  # noqa: E731
    assert {key(r): (r.neighbor_id, r.cos) for r in got_rows} == {
        key(r): (r.neighbor_id, r.cos) for r in expect
    }
    idx.unpersist()
    queries.unpersist()
