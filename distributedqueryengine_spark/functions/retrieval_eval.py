"""Retrieval evaluation: recall@k, MRR@k, nDCG@k over ranked results.

The measurement half of the similarity/ANN family: similarity.py
produces (query_id, neighbor_id, rnk) rankings; this scores them
against relevance labels so index tuning (n_planes, n_cells, probe
widths) is a measured loop inside the engine instead of an external
notebook. All three metrics are standard IR definitions:

- recall@k: |retrieved@k ∩ relevant| / |relevant|
- MRR@k: 1 / rank of the first relevant hit (0 if none in top k)
- nDCG@k: DCG@k / ideal-DCG@k with graded `gain` labels,
  DCG = Σ gain_i / log2(rank_i + 1)

Shape: one join of the rankings against the labels on (query, doc) —
both sides are results-sized, not corpus-sized — then a query-keyed
aggregate; the ideal-DCG side is a window top-k over the labels. Pure
JVM expressions, engine-portable math (DuckDB-differential in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def retrieval_metrics(
    results: DataFrame,
    labels: DataFrame,
    k: int,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rnk",
    gain_col: str | None = None,
) -> DataFrame:
    """Per-query (n_relevant, recall_at_k, mrr_at_k, ndcg_at_k).

    `results`: one row per (query, doc) with 1-based `rank_col`.
    `labels`: one row per (query, doc) judged relevant; `gain_col`
    (optional, default gain 1.0) carries graded relevance for nDCG.
    Queries present in `labels` but absent from `results` score 0 on
    every metric (a retrieval system that returns nothing must not
    vanish from its own evaluation); queries with no labels are
    excluded (nothing to measure)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    gain = F.col(gain_col).cast("double") if gain_col else F.lit(1.0)
    lab = labels.select(
        F.col(query_col).alias("q"),
        F.col(doc_col).alias("d"),
        gain.alias("g"),
    )
    res = results.filter(F.col(rank_col) <= k).select(
        F.col(query_col).alias("q"),
        F.col(doc_col).alias("d"),
        F.col(rank_col).cast("int").alias("r"),
    )
    # hits: labeled docs actually retrieved in the top k
    hits = lab.join(res, ["q", "d"])
    per_q_hits = hits.groupBy("q").agg(
        F.count(F.lit(1)).alias("n_hit"),
        F.min("r").alias("first_rel_rank"),
        F.sum(F.col("g") / F.log2(F.col("r") + 1)).alias("dcg"),
    )
    # ideal DCG: top-k labels by gain (desc, doc asc for determinism)
    w = Window.partitionBy("q").orderBy(F.col("g").desc(), F.col("d").asc())
    ideal = (
        lab.withColumn("ir", F.row_number().over(w))
        .filter(F.col("ir") <= k)
        .groupBy("q")
        .agg(F.sum(F.col("g") / F.log2(F.col("ir") + 1)).alias("idcg"))
    )
    totals = lab.groupBy("q").agg(F.count(F.lit(1)).alias("n_relevant"))
    return (
        totals.join(ideal, "q")
        .join(per_q_hits, "q", "left")
        .select(
            F.col("q").alias(query_col),
            "n_relevant",
            F.round(
                F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_relevant"), 6
            ).alias("recall_at_k"),
            F.round(
                F.coalesce(1.0 / F.col("first_rel_rank"), F.lit(0.0)), 6
            ).alias("mrr_at_k"),
            F.round(
                F.coalesce(F.col("dcg"), F.lit(0.0)) / F.col("idcg"), 6
            ).alias("ndcg_at_k"),
        )
    )


def rrf_fuse(
    rankings,
    id_col: str = "doc_id",
    rank_col: str = "rnk",
    by=(),
    k: int = 10,
    c: float = 60.0,
    weights=None,
) -> DataFrame:
    """Reciprocal-Rank Fusion of N ranked lists — the standard hybrid-
    retrieval combiner (Cormack et al., SIGIR'09): fuse a lexical BM25
    ranking with a dense ANN/cosine ranking (or any mix of rankers)
    without score calibration, since only RANKS enter:

        rrf(d) = Σ_i  w_i / (c + rank_i(d))

    Documents absent from a list contribute 0 for it (the lists are
    top-k by construction); `c` (default 60, the paper's constant)
    damps the head so one ranker can't dominate. Inputs: DataFrames
    each holding (by..., id_col, rank_col) — `by` names per-query key
    columns when fusing many queries at once; () fuses single global
    lists. Output: (by..., id_col, rrf_score, n_lists, rnk ≤ k),
    ranked by (rrf_score desc, id asc), score rounded to 9 (stable
    across engines; contributions are tiny, ranks differ well above
    1e-9).

    Scale shape: the inputs are ALREADY top-k lists (results-sized,
    never corpus-sized), so this is a union + one id-keyed aggregate +
    a per-query window over ≤ Σk_i candidate rows per query. With
    by=() the final window is a single partition of ≤ Σk_i rows —
    bounded by the input lists, not the data."""
    rankings = list(rankings)
    if not rankings:
        raise ValueError("rankings must contain at least one ranked list")
    if weights is None:
        weights = [1.0] * len(rankings)
    if len(weights) != len(rankings):
        raise ValueError(
            f"{len(weights)} weights for {len(rankings)} rankings"
        )
    if any(w <= 0 for w in weights):
        raise ValueError("weights must be positive")
    if c <= 0 or k < 1:
        raise ValueError("need c > 0 and k >= 1")
    keys = list(by)
    parts = [
        r.select(
            *keys,
            F.col(id_col).alias("__id"),
            (
                F.lit(float(w)) / (F.lit(float(c)) + F.col(rank_col).cast("double"))
            ).alias("__contrib"),
        )
        for w, r in zip(weights, rankings)
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    scores = u.groupBy(*keys, "__id").agg(
        F.round(F.sum("__contrib"), 9).alias("rrf_score"),
        F.count(F.lit(1)).cast("int").alias("n_lists"),
    )
    w_ = Window.partitionBy(*keys).orderBy(
        F.col("rrf_score").desc(), F.col("__id").asc()
    )
    return (
        scores.withColumn("rnk", F.row_number().over(w_).cast("int"))
        .filter(F.col("rnk") <= k)
        .select(*keys, F.col("__id").alias(id_col), "rrf_score", "n_lists", "rnk")
    )
