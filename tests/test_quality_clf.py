"""Hashed-ngram logistic quality classifier: distributed full-batch GD
must match a serial numpy reference of the identical math (same hashed
features, same tf normalization, same update rule), and the trained
model must actually separate planted good/bad documents."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from distributedqueryengine_spark.functions.dsir import hashed_ngram_features
from distributedqueryengine_spark.functions.quality_clf import (
    fit_hashed_logreg,
    score_hashed_logreg,
)

B = 64


def _np_fit(X, y, iters, lr, l2):
    n, d = X.shape
    w = np.zeros(d)
    b = 0.0
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(X @ w + b)))
        r = p - y
        w -= lr * (X.T @ r / n + l2 * w)
        b -= lr * (r.sum() / n)
    return w, b


def _feature_matrix(spark, df, n_ids):
    rows = hashed_ngram_features(df, "id", "text", num_buckets=B).collect()
    X = np.zeros((n_ids, B))
    for r in rows:
        X[r["id"], r["bucket"]] = r["cnt"]
    X = X / X.sum(axis=1, keepdims=True)
    return X


@pytest.fixture(scope="module")
def planted(spark):
    rows = []
    for i in range(60):
        good = i % 2 == 0
        words = (
            ["the", "model", "learns", "clean", "prose", "here"]
            if good
            else ["zz", "spam", "buy", "now", "zz", "click"]
        )
        text = " ".join(words[(i + j) % len(words)] for j in range(20))
        rows.append((i, text, 1 if good else 0))
    return spark.createDataFrame(rows, "id long, text string, label int")


def test_fit_matches_numpy_reference(spark, planted):
    model = fit_hashed_logreg(
        planted, "id", "text", "label", num_buckets=B, iters=15, lr=1.5, l2=1e-3
    )
    X = _feature_matrix(spark, planted, 60)
    y = np.array([r["label"] for r in planted.orderBy("id").collect()], float)
    w_ref, b_ref = _np_fit(X, y, iters=15, lr=1.5, l2=1e-3)
    assert np.allclose(model.weights, w_ref, atol=1e-8)
    assert abs(model.bias - b_ref) < 1e-8
    assert len(model.losses) == 15
    assert model.losses[-1] < model.losses[0]  # actually learned


def test_score_matches_numpy_and_separates(spark, planted):
    model = fit_hashed_logreg(
        planted, "id", "text", "label", num_buckets=B, iters=25, lr=2.0
    )
    got = {r["id"]: r["score"] for r in score_hashed_logreg(planted, "id", "text", model).collect()}
    X = _feature_matrix(spark, planted, 60)
    p_ref = 1.0 / (1.0 + np.exp(-(X @ model.weights + model.bias)))
    for i in range(60):
        assert abs(got[i] - p_ref[i]) < 1e-9
    good = [got[i] for i in range(60) if i % 2 == 0]
    bad = [got[i] for i in range(60) if i % 2 == 1]
    assert min(good) > max(bad)  # clean separation on disjoint vocab


def test_score_unseen_docs_and_oov(spark, planted):
    model = fit_hashed_logreg(
        planted, "id", "text", "label", num_buckets=B, iters=10, lr=2.0
    )
    new = spark.createDataFrame(
        [
            (100, "the model learns clean prose here"),
            (101, "zz spam buy now click"),
            (102, "wholly unseen vocabulary entirely"),
        ],
        "id long, text string",
    )
    s = {r["id"]: r["score"] for r in score_hashed_logreg(new, "id", "text", model).collect()}
    assert s[100] > 0.5 > s[101]
    assert 0.0 < s[102] < 1.0


def test_empty_training_raises(spark):
    empty = spark.createDataFrame([], "id long, text string, label int")
    with pytest.raises(ValueError):
        fit_hashed_logreg(empty, "id", "text", "label", num_buckets=B, iters=1)


def test_streaming_scoring_matches_batch(spark, planted, tmp_path):
    """Model-in-the-loop filtering on a stream: scoring is stateless
    per microbatch (foreachBatch), so streamed scores must equal the
    batch run exactly and every arriving doc must be scored once."""
    model = fit_hashed_logreg(
        planted, "id", "text", "label", num_buckets=B, iters=5, lr=2.0
    )
    src = str(tmp_path / "src")
    planted.select("id", "text").repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema("id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    got: dict[int, float] = {}

    def sink(df, epoch_id):
        for r in score_hashed_logreg(df, "id", "text", model).collect():
            got[r["id"]] = r["score"]

    q = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", str(tmp_path / "ckpt")
    ).start()
    q.processAllAvailable()
    q.stop()
    want = {
        r["id"]: r["score"]
        for r in score_hashed_logreg(planted, "id", "text", model).collect()
    }
    assert set(got) == set(want)
    for i, s in want.items():
        assert abs(got[i] - s) < 1e-12


def test_explain_surfaces_planted_vocab(spark, planted):
    from distributedqueryengine_spark.functions.quality_clf import (
        explain_hashed_logreg,
    )

    model = fit_hashed_logreg(
        planted, "id", "text", "label", num_buckets=4096, iters=25, lr=2.0
    )
    out = explain_hashed_logreg(planted, "id", "text", model, k=10).collect()
    good_vocab = {"the", "model", "learns", "clean", "prose", "here"}
    bad_vocab = {"zz", "spam", "buy", "now", "click"}
    # a colliding bucket legitimately lists grams from BOTH vocabularies
    # (that is what n_grams_in_bucket flags); the precise claim is about
    # collision-FREE rows: their vocabulary must match their direction
    pos = [r["gram"] for r in out
           if r["direction"] == "positive" and r["n_grams_in_bucket"] == 1]
    neg = [r["gram"] for r in out
           if r["direction"] == "negative" and r["n_grams_in_bucket"] == 1]
    for g in pos:
        assert all(w in good_vocab for w in g.split()), g
    for g in neg:
        assert all(w in bad_vocab for w in g.split()), g
    assert pos and neg
    # weights ordered by |w| desc on each side; counts are real
    pw = [r["weight"] for r in out if r["direction"] == "positive"]
    nw = [r["weight"] for r in out if r["direction"] == "negative"]
    assert pw == sorted(pw, reverse=True) and all(w > 0 for w in pw)
    assert nw == sorted(nw) and all(w < 0 for w in nw)
    assert all(r["n_occurrences"] >= 1 and r["n_grams_in_bucket"] >= 1 for r in out)


# --------------------------------------------------------------------------
# r14: one action per GD iteration, early stop, zero-gram labeled docs
# --------------------------------------------------------------------------

def test_one_job_per_iteration(spark, planted):
    """Each GD iteration must schedule exactly ONE action — measured
    as 2 jobs: the ≤num_buckets+1-row model-table broadcast exchange
    plus the unified gradient+loss collect. r13 paid 4 (two collects,
    two broadcasts — the per-doc residual frame no longer ships at
    all; logits are a window sum over the cached feature rows). Fixed
    overhead (featurize, count, persist) cancels by differencing two
    run lengths, the pagerank probe pattern."""
    sc = spark.sparkContext

    def jobs_for(n_iter):
        group = f"clf_jobs_{n_iter}"
        sc.setJobGroup(group, "clf job-count probe")
        try:
            fit_hashed_logreg(
                planted, "id", "text", "label",
                num_buckets=B, iters=n_iter, lr=1.0,
            )
        finally:
            sc.setJobGroup(None, None)
        return len(sc.statusTracker().getJobIdsForGroup(group))

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        per_iter = (jobs_for(9) - jobs_for(3)) / 6
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert per_iter == 2.0, per_iter


def test_early_stop_on_loss_plateau(spark, planted):
    """tol > 0 halts once the loss delta flattens: strictly fewer
    iterations than the cap, and the delta at the stopping point is
    below tol; tol = 0 (default) keeps the full count."""
    model = fit_hashed_logreg(
        planted, "id", "text", "label",
        num_buckets=B, iters=120, lr=1.5, tol=5e-3,
    )
    assert 2 <= len(model.losses) < 120
    assert abs(model.losses[-2] - model.losses[-1]) < 5e-3
    assert model.losses[-1] < model.losses[0]
    # the early-stopped model already ranks good above bad on average
    got = {r["id"]: r["score"]
           for r in score_hashed_logreg(planted, "id", "text", model).collect()}
    good = [got[i] for i in range(60) if i % 2 == 0]
    bad = [got[i] for i in range(60) if i % 2 == 1]
    assert sum(good) / len(good) > sum(bad) / len(bad)


def test_blank_docs_contribute_to_bias(spark):
    """r13 ADVICE: labeled docs producing zero n-grams vanished from
    the feature table but still inflated n — the bias gradient and
    loss silently diverged from full-batch GD over the labeled set.
    With the intercept-feature fix, the distributed fit must match a
    numpy reference whose design matrix keeps the blank rows (all-zero
    feature rows, intercept only)."""
    rows = []
    for i in range(24):
        if i % 4 == 0:
            text = "" if i % 8 == 0 else "   "  # blank / whitespace
            label = 1  # all-blank docs labeled positive: shifts bias UP
        else:
            good = i % 2 == 0
            text = " ".join(
                (["the", "model", "learns"] if good else ["zz", "spam", "buy"])
                [(i + j) % 3] for j in range(12)
            )
            label = 1 if good else 0
        rows.append((i, text, label))
    df = spark.createDataFrame(rows, "id long, text string, label int")
    model = fit_hashed_logreg(
        df, "id", "text", "label", num_buckets=B, iters=12, lr=1.5, l2=1e-3
    )
    feat_rows = hashed_ngram_features(df, "id", "text", num_buckets=B).collect()
    X = np.zeros((24, B))
    for r in feat_rows:
        X[r["id"], r["bucket"]] = r["cnt"]
    sums = X.sum(axis=1, keepdims=True)
    X = np.divide(X, sums, out=np.zeros_like(X), where=sums > 0)
    y = np.array([r["label"] for r in df.orderBy("id").collect()], float)
    w_ref, b_ref = _np_fit(X, y, iters=12, lr=1.5, l2=1e-3)
    assert np.allclose(model.weights, w_ref, atol=1e-8)
    assert abs(model.bias - b_ref) < 1e-8
    # six positive-labeled blank docs must push the bias positive —
    # the pre-fix code gave them zero pull
    assert model.bias > 0
