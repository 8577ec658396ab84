"""SemDeDup semantic dedup: keep-rule semantics, determinism, DuckDB
parity on the real embeddings table, and the cell-saturation guard."""
from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from distributedqueryengine_spark.ann_oracle import semdedup_oracle_sql
from distributedqueryengine_spark.functions.semdedup import semantic_dedup

SF_DIR = "/root/testdata/sf0.001"


def _mk(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id bigint, embedding array<double>",
    )


def test_exact_duplicates_keep_min_id(spark):
    """Identical vectors always share a cell; only the lowest id
    survives."""
    vecs = [[1.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0],
            [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]]
    out = {r.vec_id: r.kept for r in
           semantic_dedup(_mk(spark, vecs), n_clusters=2,
                          threshold=0.99, n_sample=8).collect()}
    assert out[0] == 1 and out[1] == 0 and out[3] == 0
    assert out[2] == 1 and out[4] == 1


def test_threshold_above_one_keeps_everything(spark):
    vecs = [[1.0, 0.0], [1.0, 0.01], [0.0, 1.0]]
    out = semantic_dedup(_mk(spark, vecs), n_clusters=1,
                         threshold=1.0 + 1e-9, n_sample=8)
    assert all(r.kept == 1 for r in out.collect())


def test_drop_rule_is_pairwise_not_transitive(spark):
    """j is dropped iff ∃ i<j in the same cell with cos>=t — even when
    i itself was dropped by an earlier row (pairwise, chain-free)."""
    # three near-identical vectors: 1 dropped by 0, 2 dropped by 0 AND 1
    vecs = [[1.0, 0.0], [1.0, 1e-4], [1.0, 2e-4]]
    out = {r.vec_id: r.kept for r in
           semantic_dedup(_mk(spark, vecs), n_clusters=1,
                          threshold=0.999, n_sample=8).collect()}
    assert out == {0: 1, 1: 0, 2: 0}


def test_determinism(spark, tables):
    emb = tables["embeddings"]
    a = sorted(map(tuple, semantic_dedup(emb, threshold=0.35).collect()))
    b = sorted(map(tuple, semantic_dedup(emb, threshold=0.35).collect()))
    assert a == b


def test_duckdb_parity_real_table(spark, tables):
    got = sorted(
        (r.vec_id, r.cell, r.kept)
        for r in semantic_dedup(
            tables["embeddings"], n_clusters=8, threshold=0.35,
            n_iter=4, n_sample=256,
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/embeddings.parquet')"
    )
    want = sorted(
        tuple(r) for r in con.execute(
            semdedup_oracle_sql(threshold=0.35)
        ).fetchall()
    )
    assert got == want


def test_cell_saturation_raises(spark):
    """A cell above max_cell_rows must raise in-plan, naming the knob,
    instead of running the O(cell²) join."""
    vecs = [[1.0, float(i) * 1e-6] for i in range(40)]
    df = _mk(spark, vecs)
    with pytest.raises(Exception, match="max_cell_rows"):
        semantic_dedup(df, n_clusters=1, threshold=0.99,
                       n_sample=8, max_cell_rows=10).collect()


def test_bad_threshold_raises(spark):
    df = _mk(spark, [[1.0, 0.0]])
    with pytest.raises(ValueError, match="threshold"):
        semantic_dedup(df, threshold=0.0)
    with pytest.raises(ValueError, match="empty"):
        semantic_dedup(df.where(F.lit(False)), threshold=0.9).collect()
