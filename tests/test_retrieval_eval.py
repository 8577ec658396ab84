"""Retrieval metrics vs a DuckDB mirror and hand-computed values, plus
an end-to-end loop scoring the ANN ranking against exact brute force."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F


def test_retrieval_metrics_hand_and_duckdb(spark):
    from distributedqueryengine_spark.functions.retrieval_eval import (
        retrieval_metrics,
    )

    # q1: rel docs {10, 11, 12}; retrieved top4 = [10, 99, 11, 98]
    # q2: rel {20}; retrieved = [21, 22, 20]
    # q3: rel {30}; retrieved nothing
    results = [
        (1, 10, 1), (1, 99, 2), (1, 11, 3), (1, 98, 4),
        (2, 21, 1), (2, 22, 2), (2, 20, 3),
    ]
    labels = [(1, 10, 2.0), (1, 11, 1.0), (1, 12, 1.0), (2, 20, 1.0), (3, 30, 1.0)]
    res_df = spark.createDataFrame(results, "query_id long, doc_id long, rnk int")
    lab_df = spark.createDataFrame(labels, "query_id long, doc_id long, gain double")

    got = {
        r.query_id: (r.n_relevant, r.recall_at_k, r.mrr_at_k, r.ndcg_at_k)
        for r in retrieval_metrics(res_df, lab_df, k=4, gain_col="gain").collect()
    }
    import math

    # q1: hits 10@1 (g2), 11@3 (g1) → recall 2/3, mrr 1
    dcg1 = 2.0 / math.log2(2) + 1.0 / math.log2(4)
    idcg1 = 2.0 / math.log2(2) + 1.0 / math.log2(3) + 1.0 / math.log2(4)
    assert got[1][0] == 3
    assert abs(got[1][1] - round(2 / 3, 6)) < 1e-9
    assert got[1][2] == 1.0
    assert abs(got[1][3] - round(dcg1 / idcg1, 6)) < 1e-6
    # q2: hit 20@3 → recall 1, mrr 1/3, ndcg = (1/log2(4)) / (1/log2(2))
    assert got[2] == (1, 1.0, round(1 / 3, 6), 0.5)
    # q3: retrieved nothing → all zero, still present
    assert got[3] == (1, 0.0, 0.0, 0.0)

    # DuckDB mirror over the same frames
    con = duckdb.connect()
    con.execute("CREATE TABLE res(q BIGINT, d BIGINT, r INTEGER)")
    con.executemany("INSERT INTO res VALUES (?,?,?)", results)
    con.execute("CREATE TABLE lab(q BIGINT, d BIGINT, g DOUBLE)")
    con.executemany("INSERT INTO lab VALUES (?,?,?)", labels)
    expect = {
        row[0]: tuple(row[1:])
        for row in con.execute(
            """
            WITH hits AS (
              SELECT l.q, l.g, r.r FROM lab l JOIN res r
                ON l.q = r.q AND l.d = r.d AND r.r <= 4
            ), per_q AS (
              SELECT q, count(*) AS n_hit, min(r) AS fr,
                     sum(g / log2(r + 1)) AS dcg
              FROM hits GROUP BY q
            ), ideal AS (
              SELECT q, sum(g / log2(ir + 1)) AS idcg FROM (
                SELECT q, g, row_number() OVER (
                    PARTITION BY q ORDER BY g DESC, d ASC) AS ir
                FROM lab
              ) WHERE ir <= 4 GROUP BY q
            ), tot AS (
              SELECT q, count(*) AS n_rel FROM lab GROUP BY q
            )
            SELECT t.q, t.n_rel,
                   round(coalesce(p.n_hit, 0) / CAST(t.n_rel AS DOUBLE), 6),
                   round(coalesce(1.0 / p.fr, 0.0), 6),
                   round(coalesce(p.dcg, 0.0) / i.idcg, 6)
            FROM tot t JOIN ideal i ON t.q = i.q
            LEFT JOIN per_q p ON t.q = p.q
            """
        ).fetchall()
    }
    assert got == expect


def test_retrieval_metrics_scores_ann_vs_bruteforce(spark, tables):
    """Close the loop: exact brute-force top-k is the label set, the
    fused ANN ranking is the system under test — recall/MRR/nDCG all
    computable inside the engine, and high on the fixture."""
    from distributedqueryengine_spark.functions.retrieval_eval import (
        retrieval_metrics,
    )
    from distributedqueryengine_spark.functions.similarity import brute_force_topk

    emb = tables["embeddings"]
    queries = emb.limit(8)
    exact = brute_force_topk(queries, emb, k=5).select(
        F.col("query_id"), F.col("neighbor_id").alias("doc_id")
    )
    # a deliberately imperfect system: exact top-5 of a PERTURBED query
    noisy = queries.select(
        "vec_id",
        F.transform(
            "embedding", lambda x, i: x + F.when(i % 7 == 0, 0.05).otherwise(0.0)
        ).alias("embedding"),
    )
    system = brute_force_topk(noisy, emb, k=5).select(
        "query_id", F.col("neighbor_id").alias("doc_id"), F.col("rnk")
    )
    m = retrieval_metrics(system, exact, k=5).agg(
        F.avg("recall_at_k").alias("r"),
        F.avg("mrr_at_k").alias("mrr"),
        F.avg("ndcg_at_k").alias("ndcg"),
    ).first()
    assert 0.5 < m.r <= 1.0
    assert 0.5 < m.mrr <= 1.0
    assert 0.5 < m.ndcg <= 1.0


def test_rrf_fuse_matches_hand_computation(spark):
    """RRF over two per-query lists: weighted contributions, docs
    missing from one list, deterministic tie-break, k cut."""
    from distributedqueryengine_spark.functions.retrieval_eval import rrf_fuse

    lex = spark.createDataFrame(
        [("q1", 10, 1), ("q1", 11, 2), ("q1", 12, 3),
         ("q2", 20, 1), ("q2", 21, 2)],
        "qid string, doc_id long, rnk int",
    )
    dense = spark.createDataFrame(
        [("q1", 11, 1), ("q1", 13, 2),
         ("q2", 21, 1), ("q2", 20, 2)],
        "qid string, doc_id long, rnk int",
    )
    out = rrf_fuse(
        [lex, dense], by=["qid"], k=3, c=60.0, weights=[1.0, 2.0]
    ).collect()
    got = {(r.qid, r.doc_id): (round(r.rrf_score, 9), r.n_lists, r.rnk) for r in out}

    def rrf(*terms):
        return round(sum(terms), 9)

    expect = {
        # q1: 11 in both lists wins, then 13 (dense w=2), then 10
        ("q1", 11): (rrf(1 / 62, 2 / 61), 2, 1),
        ("q1", 13): (rrf(2 / 62), 1, 2),
        ("q1", 10): (rrf(1 / 61), 1, 3),
        # q2: 21 (lex rnk2 + dense rnk1) vs 20 (lex rnk1 + dense rnk2)
        ("q2", 21): (rrf(1 / 62, 2 / 61), 2, 1),
        ("q2", 20): (rrf(1 / 61, 2 / 62), 2, 2),
    }
    assert got == expect

    import pytest as _pytest

    with _pytest.raises(ValueError, match="weights"):
        rrf_fuse([lex], weights=[1.0, 2.0])
    with _pytest.raises(ValueError, match="positive"):
        rrf_fuse([lex, dense], weights=[1.0, 0.0])
