"""Embedding-space classification: kNN majority vote + nearest centroid.

Training-data-pipeline use: label propagation over an embedded corpus
(spread a small set of human quality/topic labels to the whole corpus)
and prototype-based filtering (score every document against class
centroids, keep the class you want). The reference engine has no ML
surface; these extend its scan→join→agg algebra (RPC.cs:248-329) with
the two classic embedding classifiers, built entirely from relational
pieces so they stay inside Catalyst.

Scale shape (the part that matters at 100 TB):

- ``knn_classify`` reuses :func:`similarity.brute_force_topk` — the
  labeled "train" matrix never moves; queries broadcast; each corpus
  partition emits only its local top-k, so the shuffled intermediate is
  O(partitions x queries x k). The vote is a hash agg over that tiny
  table, and the label lookup joins the top-k table (small side,
  broadcast) against the corpus projection (id, label) — the corpus is
  scanned once and never reshuffled.
- ``nearest_centroid`` computes per-label mean vectors with
  posexplode + partial-aggregated hash agg (labels x dim rows — KB,
  not corpus-sized), broadcasts them, and assigns every query in one
  map pass (zip_with dot product, no shuffle on the query side).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from distributedqueryengine_spark.functions.similarity import brute_force_topk

__all__ = ["knn_classify", "nearest_centroid", "centroids"]


def _dot(a: Column, b: Column) -> Column:
    """JVM-side dot product of two double arrays (no Python UDF)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def knn_classify(
    queries: DataFrame,
    train: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """k-nearest-neighbor majority-vote classification.

    For each query vector: the exact cosine top-``k`` among ``train``
    rows, then the modal neighbor label. Deterministic end to end —
    neighbor rank ties break by neighbor id (brute_force_topk's
    contract), vote ties break by smallest label.

    Returns ``(query_id, pred_label, votes)``.
    """
    topk = brute_force_topk(queries, train, k=k, id_col=id_col, vec_col=vec_col)
    labels = train.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).cast("long").alias("pred_label"),
    )
    # top-k table is O(n_q * k) — broadcast it so the corpus-sized label
    # projection is a map-side join, never a shuffle of the corpus.
    votes = (
        F.broadcast(topk)
        .join(labels, "neighbor_id")
        .groupBy("query_id", "pred_label")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("votes").desc(), F.col("pred_label").asc()
    )
    return (
        votes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("query_id", "pred_label", "votes")
    )


def centroids(
    train: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Per-label mean vector: ``(label, centroid: array<double>)``.

    posexplode + hash agg — partial aggregation reduces each partition
    to (labels x dim) rows before the shuffle, so the shuffled bytes are
    independent of corpus size.
    """
    dims = train.select(
        F.col(label_col).cast("long").alias("label"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "v"),
    ).groupBy("label", "pos").agg(F.avg("v").alias("m"))
    return dims.groupBy("label").agg(
        F.array_sort(
            F.collect_list(F.struct("pos", "m"))
        ).getField("m").alias("centroid")
    )


def nearest_centroid(
    queries: DataFrame,
    train: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Nearest-centroid (Rocchio) classification by cosine.

    Centroids (labels x dim — KB at any corpus size) broadcast against
    the query side; assignment is one map pass of JVM zip_with dot
    products, no shuffle of the queries. Cosine rounds to 6dp before
    the argmax (ties break by smallest label) so the decision is
    engine-portable.

    Returns ``(query_id, pred_label, cos)``.
    """
    cent = centroids(train, vec_col=vec_col, label_col=label_col)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    scored = q.join(F.broadcast(cent)).select(
        "query_id",
        F.col("label").alias("pred_label"),
        F.round(
            _dot(F.col("qv"), F.col("centroid"))
            / (
                F.sqrt(_dot(F.col("qv"), F.col("qv")))
                * F.sqrt(_dot(F.col("centroid"), F.col("centroid")))
            ),
            6,
        ).alias("cos"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("pred_label").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("query_id", "pred_label", "cos")
    )
