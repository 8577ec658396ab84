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


def test_keep_centroid_far_keeps_atypical(spark):
    """Two exact-duplicate pairs plus one outlier per cell: under
    'centroid_far' the duplicate FARTHEST from the centroid survives,
    and singletons are untouched."""
    # cell will contain all vectors (n_clusters=1); centroid ≈ mean.
    # pair A: [1, 0] twice (ids 0, 1); pair B: [0.9, 0.44] twice
    # (ids 2, 3) — B is closer to the centroid than A.
    vecs = [[1.0, 0.0], [1.0, 0.0], [0.9, 0.44], [0.9, 0.44]]
    out = {r.vec_id: r.kept for r in
           semantic_dedup(_mk(spark, vecs), n_clusters=1, threshold=0.999,
                          n_sample=8, keep="centroid_far").collect()}
    # within each exact pair exactly one survives (tie on cos → min id)
    assert out[0] + out[1] == 1 and out[2] + out[3] == 1
    # and across strategies the SET of surviving contents is the same
    out_min = {r.vec_id: r.kept for r in
               semantic_dedup(_mk(spark, vecs), n_clusters=1, threshold=0.999,
                              n_sample=8, keep="min_id").collect()}
    assert sum(out.values()) == sum(out_min.values()) == 2


def test_keep_strategies_differ_on_asymmetric_neighborhood(spark):
    """A 3-chain where priority order changes the survivor: u (far from
    centroid) ~ v ~ w (near centroid); the chain collapses to exactly
    the highest-priority member, which differs per strategy."""
    import numpy as np
    base = np.array([1.0, 0.0])
    rot = lambda a: [float(np.cos(a)), float(np.sin(a))]
    # centroid pulled toward angle 0 by three extra singleton vectors
    vecs = [rot(0.30), rot(0.25), rot(0.20),   # ids 0,1,2: the chain
            rot(0.0), rot(0.01), rot(-0.01)]   # ids 3-5: anchor mass
    thr = 0.9987  # cos(0.05)≈0.99875 — adjacent chain links only
    far = {r.vec_id: r.kept for r in
           semantic_dedup(_mk(spark, vecs), n_clusters=1, threshold=thr,
                          n_sample=8, keep="centroid_far").collect()}
    near = {r.vec_id: r.kept for r in
            semantic_dedup(_mk(spark, vecs), n_clusters=1, threshold=thr,
                           n_sample=8, keep="centroid_near").collect()}
    # chain-free rule: a dropped row still drops its neighbors, so the
    # whole chain collapses to the single highest-priority member —
    # farthest-first keeps 0, nearest-first keeps 2
    assert far[0] == 1 and far[1] == 0 and far[2] == 0
    assert near[2] == 1 and near[1] == 0 and near[0] == 0


def test_bad_keep_raises(spark):
    with pytest.raises(ValueError, match="keep must be"):
        semantic_dedup(_mk(spark, [[1.0, 0.0]]), keep="random")
