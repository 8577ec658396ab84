"""Hashed-ngram logistic quality classifier (fastText-shaped linear
model) — distributed full-batch training + corpus scoring.

The model-in-the-loop filtering step every large pretraining corpus
uses (CCNet/RefinedWeb/GPT-3 style): train a cheap linear classifier
on a small labeled seed (good vs bad documents), score the whole
corpus, keep by threshold or quantile. Extends the reference's
scan->agg algebra (RPC.cs:343-375) with the one ML primitive the
LLM-data pipeline genuinely needs in-engine.

Spark-first design — the model moves, the corpus doesn't:

- Features are the DSIR featurizer's hashed unigram+bigram counts
  (``dsir.hashed_ngram_features`` — arrays_zip codegen, one scan),
  tf-normalized per document; the featurized table is persisted ONCE
  and every training iteration reads the cache.
- The weight vector is dense but tiny (num_buckets + bias, <=4096
  doubles) and lives on the driver; each full-batch GD iteration
  broadcasts it as a (bucket, w) table, computes per-doc logits with a
  broadcast join + hash agg (pure JVM, no UDF), and reduces the
  gradient back to <=num_buckets rows. Per-iteration shuffle is
  O(docs x distinct-buckets-per-doc) count rows — never text, never
  the corpus.
- Scoring is the same broadcast-join + agg over any corpus, one scan.

Determinism: float partial sums reduce in partition order, so weights
agree with a serial reference only to ~1e-9 relative — tests compare
with tolerance and pin the induced ordering/decisions, not bits.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
from pyspark.sql import DataFrame, functions as F

from distributedqueryengine_spark.functions.dsir import (
    hashed_ngram_features,
    hashed_ngram_occurrences as _gram_buckets,
)

__all__ = [
    "LogRegModel",
    "fit_hashed_logreg",
    "score_hashed_logreg",
    "explain_hashed_logreg",
]


class LogRegModel(NamedTuple):
    weights: np.ndarray  # shape (num_buckets,)
    bias: float
    num_buckets: int
    portable: bool
    losses: tuple  # per-iteration mean log-loss (driver-computed)


def _tf_features(
    df: DataFrame, id_col: str, text_col: str, num_buckets: int, portable: bool
) -> DataFrame:
    """(id, bucket, tf): per-doc hashed-ngram counts, tf-normalized."""
    feats = hashed_ngram_features(
        df, id_col, text_col, num_buckets=num_buckets, portable=portable
    )
    tot = feats.groupBy("id").agg(F.sum("cnt").alias("__tot"))
    return feats.join(tot, "id").select(
        "id", "bucket", (F.col("cnt") / F.col("__tot")).alias("tf")
    )


def fit_hashed_logreg(
    df: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str,
    num_buckets: int = 1024,
    iters: int = 30,
    lr: float = 2.0,
    l2: float = 1e-4,
    portable: bool = False,
    tol: float = 0.0,
) -> LogRegModel:
    """Full-batch gradient-descent logistic regression on hashed
    n-gram tf features. `label_col` must be 0/1.

    Each iteration is ONE action (r14 — was two): the per-doc logit is
    a window sum over the doc's feature rows (no residual join-back,
    no second broadcast), and the per-bucket gradient + the mean
    log-loss collect together as ONE ≤ num_buckets+1-row aggregation —
    so an iteration schedules exactly 2 jobs (the model-table
    broadcast exchange and the gradient collect; r13 paid 4). The
    bias is an intercept FEATURE (synthetic bucket ``num_buckets``,
    tf = 1.0, added for every labeled doc): its per-bucket gradient
    row IS the bias gradient, its group's mean per-doc log-loss IS
    the training loss, and — closing the r13 ADVICE gap — docs whose
    text produces zero n-grams (blank/whitespace) still carry their
    intercept row, so they contribute r = sigmoid(b) − y to the bias
    gradient and loss instead of silently vanishing while inflating
    the denominator. No l2 is applied to the bias.

    ``tol`` > 0 enables early stopping: iteration halts once the
    absolute loss delta between consecutive iterations drops below
    tol (``iters`` becomes a maximum). Default 0.0 = fixed count.

    At 100 TB the seed set this trains on is small by construction
    (labels are expensive); the corpus-sized pass is scoring, which
    is one scan.
    """
    spark = df.sparkSession
    labels = df.select(
        F.col(id_col).alias("id"), F.col(label_col).cast("double").alias("y")
    )
    intercept = labels.select(
        "id", F.lit(num_buckets).cast("long").alias("bucket"),
        F.lit(1.0).alias("tf"), "y",
    )
    feats = (
        _tf_features(df, id_col, text_col, num_buckets, portable)
        .join(labels, "id")
        .select("id", "bucket", "tf", "y")
        .unionByName(intercept)
        .persist()
    )
    n = labels.count()
    if n == 0:
        raise ValueError("fit_hashed_logreg: empty training set")
    w = np.zeros(num_buckets, dtype=np.float64)
    b = 0.0
    losses = []
    from pyspark.sql.window import Window

    w_doc = Window.partitionBy("id")
    try:
        for _ in range(iters):
            # bias always ships (bucket = num_buckets), features only
            # when nonzero — the broadcast stays ≤ num_buckets+1 rows
            wt = spark.createDataFrame(
                [(num_buckets, float(b))]
                + [(int(i), float(v)) for i, v in enumerate(w) if v != 0.0],
                "bucket long, w double",
            )
            dot = F.sum(
                F.coalesce(F.col("w"), F.lit(0.0)) * F.col("tf")
            ).over(w_doc)
            scored = (
                feats.join(F.broadcast(wt), "bucket", "left")
                .withColumn(
                    "p", F.lit(1.0) / (F.lit(1.0) + F.exp(-dot))
                )
                .withColumn("r", F.col("p") - F.col("y"))
            )
            # per-bucket gradient; the intercept group (every doc has
            # exactly one intercept row) doubles as the per-doc loss
            # average — one aggregation, ONE action per iteration
            rows = (
                scored.groupBy("bucket")
                .agg(
                    F.sum(F.col("tf") * F.col("r")).alias("g"),
                    F.avg(
                        -(
                            F.col("y")
                            * F.log(F.greatest(F.col("p"), F.lit(1e-12)))
                            + (1 - F.col("y"))
                            * F.log(F.greatest(1 - F.col("p"), F.lit(1e-12)))
                        )
                    ).alias("l"),
                )
                .collect()
            )
            gw = np.zeros(num_buckets, dtype=np.float64)
            gb = 0.0
            loss = float("nan")
            for row in rows:
                bk = row["bucket"]
                if bk == num_buckets:
                    gb = float(row["g"])
                    loss = float(row["l"])
                else:
                    gw[bk] = row["g"]
            w -= lr * (gw / n + l2 * w)
            b -= lr * (gb / n)
            losses.append(loss)
            if tol > 0 and len(losses) >= 2 and abs(losses[-2] - losses[-1]) < tol:
                break
    finally:
        feats.unpersist()
    return LogRegModel(w, float(b), num_buckets, portable, tuple(losses))


def score_hashed_logreg(
    df: DataFrame, id_col: str, text_col: str, model: LogRegModel
) -> DataFrame:
    """Score a corpus with a trained model: (id, score) with score the
    positive-class probability.

    Fused single-shuffle plan: because the features are tf-normalized,
    sum_b (cnt_b / tot) * w_b == (sum over gram occurrences of
    w[bucket(gram)]) / n_grams — so scoring skips the per-(id, bucket)
    count table entirely: explode grams, map-side broadcast-join the
    (<=num_buckets)-row weight table, ONE partial-aggregated hash agg
    per doc (sum w, count). The corpus shuffles once, as (id, two
    doubles) partials, never as a feature table. (The r13 probe on the
    pre-fusion three-shuffle plan measured 735 MB shuffle at 100x;
    this plan moves only the per-doc partials.)"""
    spark = df.sparkSession
    wt = spark.createDataFrame(
        [(int(i), float(v)) for i, v in enumerate(model.weights) if v != 0.0]
        or [(0, 0.0)],
        "bucket long, w double",
    )
    grams = _gram_buckets(df, id_col, text_col, model.num_buckets, model.portable)
    return (
        grams.join(F.broadcast(wt), "bucket", "left")
        .groupBy("id")
        .agg(
            F.sum(F.coalesce(F.col("w"), F.lit(0.0))).alias("sw"),
            F.count(F.lit(1)).alias("ng"),
        )
        .select(
            "id",
            (
                F.lit(1.0)
                / (
                    F.lit(1.0)
                    + F.exp(-(F.col("sw") / F.col("ng") + F.lit(model.bias)))
                )
            ).alias("score"),
        )
    )


def explain_hashed_logreg(
    df: DataFrame,
    id_col: str,
    text_col: str,
    model: LogRegModel,
    k: int = 20,
    tokens_col: str | None = None,
) -> DataFrame:
    """Model introspection: the top-k most positive and most negative
    n-grams, resolved from hash buckets back to grams actually observed
    in `df` (hashing is one-way; the corpus is the dictionary). For
    each surviving gram: its bucket weight, corpus occurrence count,
    and how many distinct grams share its bucket (collision context —
    a heavy bucket's weight is attributable only up to its collision
    set, which this column makes explicit).

    One gram scan (the same arrays_zip codegen pass as the featurizer),
    a vocab-sized distinct count, a broadcast join against the nonzero
    weights (<= num_buckets rows), and two TakeOrdered top-k's — the
    corpus-sized stage map-side-combines into vocabulary-sized state.

    Returns (direction, gram, bucket, weight, n_occurrences,
    n_grams_in_bucket) with direction in {'positive', 'negative'},
    each side ordered by |weight| desc then gram asc.
    """
    spark = df.sparkSession
    wt = spark.createDataFrame(
        [(int(i), float(v)) for i, v in enumerate(model.weights) if v != 0.0]
        or [(0, 0.0)],
        "bucket long, w double",
    )
    occ = _gram_occurrence_counts(
        df, id_col, text_col, model.num_buckets, model.portable,
        tokens_col=tokens_col,
    )
    per_bucket = occ.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_grams_in_bucket")
    )
    scored = (
        occ.join(F.broadcast(wt), "bucket")
        .join(F.broadcast(per_bucket), "bucket")
        .select(
            "gram", "bucket", F.col("w").alias("weight"),
            "n_occurrences", "n_grams_in_bucket",
        )
    )
    pos = (
        scored.filter(F.col("weight") > 0)
        .orderBy(F.col("weight").desc(), F.col("gram").asc())
        .limit(k)
        .select(F.lit("positive").alias("direction"), "*")
    )
    neg = (
        scored.filter(F.col("weight") < 0)
        .orderBy(F.col("weight").asc(), F.col("gram").asc())
        .limit(k)
        .select(F.lit("negative").alias("direction"), "*")
    )
    return pos.unionByName(neg)


def _gram_occurrence_counts(
    df: DataFrame, id_col: str, text_col: str, num_buckets: int, portable: bool,
    tokens_col: str | None = None,
) -> DataFrame:
    """(gram, bucket, n_occurrences): corpus-wide counts per distinct
    unigram/bigram, with the model's bucket assignment. ``tokens_col``
    names a pre-split raw-token array column (suite-shared projection)
    to skip the tokenize pass; the empty-token filter still applies."""
    from distributedqueryengine_spark.functions.dedup import portable_hash64
    from distributedqueryengine_spark.functions.text import normalize_text

    src = (
        F.col(tokens_col) if tokens_col is not None
        else F.split(normalize_text(text_col), " ")
    )
    toks = F.filter(src, lambda t: F.length(t) > 0)
    base = df.select(toks.alias("t"))
    uni = base.select(F.explode("t").alias("g"))
    n_bi = F.greatest(F.size(F.col("t")) - 1, F.lit(0))
    zipped = F.arrays_zip(
        F.slice(F.col("t"), 1, n_bi).alias("a"),
        F.slice(F.col("t"), 2, n_bi).alias("b"),
    )
    bi = base.select(F.explode(zipped).alias("z")).select(
        F.concat_ws(" ", F.col("z.a"), F.col("z.b")).alias("g")
    )
    grams = uni.unionByName(bi).groupBy(F.col("g").alias("gram")).agg(
        F.count(F.lit(1)).alias("n_occurrences")
    )
    h = (
        portable_hash64(F.col("gram")) if portable else F.xxhash64(F.col("gram"))
    )
    return grams.select(
        "gram", F.pmod(h, F.lit(num_buckets)).alias("bucket"), "n_occurrences"
    )
