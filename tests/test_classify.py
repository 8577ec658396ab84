"""Embedding-space classification (functions/classify.py): kNN
majority vote and nearest-centroid assignment.

Verification strategy: a pure-numpy reference of the IDENTICAL math
(cosine rounded to 6dp before ranking, rank ties by neighbor id, vote
ties by smallest label) over the real embeddings fixture, plus
behavioral pins on a planted corpus where the true class structure is
known — well-separated clusters must classify perfectly under both
methods, and both must agree with each other there."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from distributedqueryengine_spark.functions.classify import (
    centroids,
    knn_classify,
    nearest_centroid,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _np_rows(df):
    rows = df.select("vec_id", "embedding", "label").collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    X = np.array([r[1] for r in rows], dtype=np.float64)
    y = np.array([r[2] for r in rows], dtype=np.int64)
    return ids, X, y


def _cos_matrix(Q, C):
    qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    return np.round(qn @ cn.T, 6)


def _py_knn(q_ids, Q, t_ids, T, t_y, k):
    sims = _cos_matrix(Q, T)
    out = {}
    for i, qid in enumerate(q_ids):
        # (cos desc, neighbor id asc) — brute_force_topk's total order
        order = sorted(range(len(t_ids)), key=lambda j: (-sims[i, j], t_ids[j]))
        top = [t_y[j] for j in order[:k]]
        votes: dict[int, int] = {}
        for lbl in top:
            votes[lbl] = votes.get(lbl, 0) + 1
        pred = min(votes, key=lambda lb: (-votes[lb], lb))
        out[int(qid)] = (int(pred), votes[pred])
    return out


def test_knn_matches_numpy_reference(emb):
    q = emb.filter(F.col("vec_id") % 10 == 0)
    t = emb.filter(F.col("vec_id") % 10 != 0)
    got = {
        r["query_id"]: (r["pred_label"], r["votes"])
        for r in knn_classify(q, t, k=5).collect()
    }
    q_ids, Q, _ = _np_rows(q)
    t_ids, T, t_y = _np_rows(t)
    assert got == _py_knn(q_ids, Q, t_ids, T, t_y, 5)


def test_centroid_matches_numpy_reference(emb):
    q = emb.filter(F.col("vec_id") % 10 == 0)
    t = emb.filter(F.col("vec_id") % 10 != 0)
    got = {
        r["query_id"]: (r["pred_label"], r["cos"])
        for r in nearest_centroid(q, t).collect()
    }
    q_ids, Q, _ = _np_rows(q)
    _, T, t_y = _np_rows(t)
    cents, labels = [], sorted(set(t_y.tolist()))
    for lbl in labels:
        cents.append(T[t_y == lbl].mean(axis=0))
    sims = _cos_matrix(Q, np.array(cents))
    for i, qid in enumerate(q_ids):
        j = min(range(len(labels)), key=lambda j: (-sims[i, j], labels[j]))
        pred, cos = got[int(qid)]
        assert pred == labels[j]
        assert abs(cos - sims[i, j]) < 1e-6


def test_centroids_shape_and_mean(emb):
    t = emb.filter(F.col("vec_id") % 10 != 0)
    rows = centroids(t).collect()
    _, T, t_y = _np_rows(t)
    assert {r["label"] for r in rows} == set(t_y.tolist())
    for r in rows:
        expect = T[t_y == r["label"]].mean(axis=0)
        assert np.allclose(np.array(r["centroid"]), expect, atol=1e-9)


def _planted(spark, n_per=30, dim=8, sep=10.0, seed=7):
    rng = np.random.default_rng(seed)
    rows = []
    vid = 0
    for lbl in range(3):
        mu = np.zeros(dim)
        mu[lbl] = sep
        for _ in range(n_per):
            v = (mu + rng.normal(0, 0.5, dim)).tolist()
            rows.append((vid, [float(x) for x in v], lbl))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")


def test_planted_clusters_classify_perfectly(spark):
    df = _planted(spark)
    q = df.filter(F.col("vec_id") % 5 == 0)
    t = df.filter(F.col("vec_id") % 5 != 0)
    truth = {r["vec_id"]: r["label"] for r in q.collect()}
    knn = {r["query_id"]: r["pred_label"] for r in knn_classify(q, t, k=5).collect()}
    cen = {r["query_id"]: r["pred_label"] for r in nearest_centroid(q, t).collect()}
    assert knn == truth
    assert cen == truth


def test_knn_votes_bounded_and_unanimous_on_planted(spark):
    df = _planted(spark, sep=50.0)
    q = df.filter(F.col("vec_id") % 5 == 0)
    t = df.filter(F.col("vec_id") % 5 != 0)
    out = knn_classify(q, t, k=5).collect()
    assert all(r["votes"] == 5 for r in out)  # clusters far apart → unanimous
