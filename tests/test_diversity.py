"""MMR diversification tests.

Reference model: pure-python greedy MMR with the same (score desc,
id asc) tie-break, float64 throughout — the operator must reproduce
the selection, ranks, and scores exactly (selection/ranks) or to
float tolerance (scores).
"""

from __future__ import annotations

import math
import random

import pytest

from distributedqueryengine_spark.functions.diversity import mmr_select


def _cos(a, b):
    num = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return num / (na * nb)


def _ref_mmr(rows, k, lam, id_key="vec_id", vec_key="embedding", rel_key="cos"):
    """rows: list of dicts. Returns [(id, rnk, mmr_score)]."""
    remaining = list(rows)
    picked = []
    out = []
    while remaining and len(picked) < k:
        best = None
        for r in remaining:
            if picked:
                pen = max(_cos(r[vec_key], p[vec_key]) for p in picked)
                score = lam * r[rel_key] - (1 - lam) * pen
            else:
                score = lam * r[rel_key]
            key = (-score, r[id_key])
            if best is None or key < best[0]:
                best = (key, r, score)
        _, chosen, score = best
        picked.append(chosen)
        remaining = [r for r in remaining if r[id_key] != chosen[id_key]]
        out.append((chosen[id_key], len(picked), score))
    return out


def _rows_from(df):
    return [
        (r["vec_id"], r["rnk"], r["mmr_score"])
        for r in df.orderBy("rnk").collect()
    ]


def test_mmr_prefers_diverse_over_redundant(spark):
    # Two near-identical high-relevance vectors + one orthogonal mid-
    # relevance vector: pure top-2 keeps the twins, MMR keeps one twin
    # plus the orthogonal item.
    rows = [
        {"vec_id": 1, "embedding": [1.0, 0.0], "cos": 0.99},
        {"vec_id": 2, "embedding": [0.999, 0.01], "cos": 0.98},
        {"vec_id": 3, "embedding": [0.0, 1.0], "cos": 0.60},
    ]
    df = spark.createDataFrame(rows)
    got = [r["vec_id"] for r in mmr_select(df, k=2, lam=0.5).orderBy("rnk").collect()]
    assert got == [1, 3]
    # lam=1.0 degrades to pure relevance top-k.
    got_rel = [
        r["vec_id"] for r in mmr_select(df, k=2, lam=1.0).orderBy("rnk").collect()
    ]
    assert got_rel == [1, 2]


@pytest.mark.parametrize("seed,n,k,lam", [(3, 40, 8, 0.5), (9, 60, 10, 0.7), (21, 25, 25, 0.3)])
def test_mmr_matches_reference_ungrouped(spark, seed, n, k, lam):
    rng = random.Random(seed)
    rows = [
        {
            "vec_id": i,
            "embedding": [rng.uniform(-1, 1) for _ in range(8)],
            "cos": rng.uniform(0, 1),
        }
        for i in range(n)
    ]
    df = spark.createDataFrame(rows).repartition(4)
    got = _rows_from(mmr_select(df, k=k, lam=lam))
    want = _ref_mmr(rows, k, lam)
    assert [(g[0], g[1]) for g in got] == [(w[0], w[1]) for w in want]
    for g, w in zip(got, want):
        assert math.isclose(g[2], w[2], rel_tol=1e-9, abs_tol=1e-9), (g, w)


def test_mmr_grouped_matches_reference_per_group(spark):
    rng = random.Random(77)
    rows = []
    for q in ["q1", "q2", "q3"]:
        for i in range(30):
            rows.append(
                {
                    "query_id": q,
                    "vec_id": i,
                    "embedding": [rng.uniform(-1, 1) for _ in range(6)],
                    "cos": rng.uniform(0, 1),
                }
            )
    df = spark.createDataFrame(rows).repartition(5)
    out = mmr_select(df, k=5, lam=0.6, by="query_id")
    assert set(out.columns) == {"query_id", "vec_id", "relevance", "mmr_score", "rnk"}
    by_q = {}
    for r in out.collect():
        by_q.setdefault(r["query_id"], []).append((r["rnk"], r["vec_id"], r["mmr_score"]))
    for q in ["q1", "q2", "q3"]:
        got = sorted(by_q[q])
        want = _ref_mmr([r for r in rows if r["query_id"] == q], 5, 0.6)
        assert [(g[1]) for g in got] == [w[0] for w in want]
        for g, w in zip(got, want):
            assert math.isclose(g[2], w[2], rel_tol=1e-9, abs_tol=1e-9)


def test_mmr_exact_tie_breaks_by_id(spark):
    # Identical vectors and relevance: every pick ties — ids ascend.
    rows = [
        {"vec_id": i, "embedding": [1.0, 0.0], "cos": 0.5} for i in (5, 3, 9, 1)
    ]
    df = spark.createDataFrame(rows)
    got = [r["vec_id"] for r in mmr_select(df, k=3, lam=0.5).orderBy("rnk").collect()]
    assert got == [1, 3, 5]


def test_mmr_k_exceeds_group_selects_all(spark):
    rows = [
        {"vec_id": 1, "embedding": [1.0, 0.0], "cos": 0.9},
        {"vec_id": 2, "embedding": [0.0, 1.0], "cos": 0.1},
    ]
    got = mmr_select(spark.createDataFrame(rows), k=10, lam=0.5).collect()
    assert sorted(r["rnk"] for r in got) == [1, 2]


def test_mmr_guards(spark):
    rows = [{"vec_id": 1, "embedding": [1.0], "cos": 0.5}]
    df = spark.createDataFrame(rows)
    with pytest.raises(ValueError, match="k must be"):
        mmr_select(df, k=0)
    with pytest.raises(ValueError, match="lam must be"):
        mmr_select(df, k=1, lam=1.5)
    with pytest.raises(ValueError, match="not in candidates"):
        mmr_select(df, k=1, rel_col="nope")
    big = spark.createDataFrame(
        [{"vec_id": i, "embedding": [1.0], "cos": 0.5} for i in range(30)]
    )
    with pytest.raises(ValueError, match="max_group_rows"):
        mmr_select(big, k=2, max_group_rows=10).collect()
    null_rel = spark.createDataFrame(
        [(1, [1.0], None)],
        "vec_id bigint, embedding array<double>, cos double",
    )
    with pytest.raises(Exception, match="NULL"):
        null_rel_df = mmr_select(null_rel, k=1)
        null_rel_df.collect()
    zero = spark.createDataFrame([{"vec_id": 1, "embedding": [0.0, 0.0], "cos": 0.5}])
    with pytest.raises(Exception, match="zero-norm"):
        mmr_select(zero, k=1).collect()


def test_mmr_over_fixture_candidates(spark):
    # End-to-end composition: brute-force top-20 per query off the
    # embeddings fixture, then MMR re-rank to a diverse top-5.
    from distributedqueryengine_spark.functions.similarity import brute_force_topk
    from distributedqueryengine_spark.session import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.limit(3).select(
        emb.vec_id.alias("query_id"), emb.embedding.alias("qvec")
    )
    cand = brute_force_topk(
        queries.withColumnRenamed("qvec", "embedding").withColumnRenamed(
            "query_id", "vec_id"
        ),
        emb,
        k=20,
    )
    from pyspark.sql import functions as F

    emb2 = emb.select(
        F.col("vec_id").alias("cand_id"), F.col("embedding").alias("cand_vec")
    )
    enriched = cand.join(emb2, cand.neighbor_id == emb2.cand_id).select(
        "query_id", "cand_id", F.col("cand_vec").alias("embedding"), "cos"
    )
    out = mmr_select(
        enriched, k=5, lam=0.5, by="query_id", id_col="cand_id"
    ).collect()
    per_q = {}
    for r in out:
        per_q.setdefault(r["query_id"], []).append(r)
    assert len(per_q) == 3
    for q, rs in per_q.items():
        assert sorted(r["rnk"] for r in rs) == [1, 2, 3, 4, 5]
        assert len({r["cand_id"] for r in rs}) == 5
