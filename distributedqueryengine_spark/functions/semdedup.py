"""SemDeDup-style semantic deduplication: cluster, then dedupe within
clusters.

The reference engine has no embedding operators at all (its data model
is relational rows over SQL Server — `QueryService.asmx.cs:90-100`);
this module is part of the LLM-training-data extension surface, after
Abbas et al., "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication" (arXiv:2303.09540). The insight over plain
pairwise near-dup (`similarity.cosine_pairs_above_scaled`): an O(n²)
cosine pass is unpayable at corpus scale, but semantic duplicates are
*by definition* close in embedding space, so a coarse k-means
partition makes within-cluster pairwise exact — Σ(nᵢ²) work instead of
n², with cluster size (hence the per-task bound) controlled by
`n_clusters ∝ n / target_cluster_rows`.

Pipeline (all deterministic, DuckDB-oracled end to end via
`ann_oracle.semdedup_oracle_sql`):

1. **Train** spherical k-means centroids driver-side on the first
   `n_sample` vectors by id (`similarity._train_centroids_kmeans`, the
   FAISS coarse-quantizer recipe — constant cost in corpus size).
2. **Assign** every vector to its nearest centroid — one Arrow-batched
   matmul per partition (`similarity._nearest_cells_udf`), no shuffle.
3. **Dedupe within cells**: self-join on the cell id (ONE hash shuffle,
   keyed by cell), exact vectorized cosine on the pairs, and the min-id
   keep rule — a vector is dropped iff some lower-id vector in its cell
   has round(cos, 6) >= threshold. Deterministic, order-free, and
   chain-free: each decision looks only at pairs, so it parallelizes
   without the sequential scan the greedy SemDeDup formulation implies.

At 100 TB: the only all-data shuffles are the cell-keyed self-join and
its groupBy — both keyed by cell, whose cardinality and balance you
control. `max_cell_rows` raises in-plan (not silently) when a cell
exceeds the pair-explosion budget, the signal to raise `n_clusters`.
"""
from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

from distributedqueryengine_spark.functions.similarity import (
    _cosine_udf,
    _nearest_cells_udf,
    _train_centroids_kmeans,
    as_double,
)

__all__ = ["semantic_dedup", "assign_cells"]


def _centroids_from_prefix(
    df: DataFrame, id_col: str, vec_col: str, n_clusters: int,
    n_sample: int, n_iter: int,
) -> np.ndarray:
    rows = (
        df.select(F.col(id_col), as_double(vec_col).alias("v"))
        .orderBy(F.col(id_col))
        .limit(n_sample)
        .collect()
    )
    if not rows:
        raise ValueError("semantic_dedup: empty input")
    S = np.array([r["v"] for r in rows], dtype=np.float64)
    return _train_centroids_kmeans(S, min(n_clusters, len(S)), n_iter=n_iter)


def assign_cells(
    df: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """df + `cell` int column: nearest-centroid assignment, one matmul
    per Arrow batch, zero shuffle."""
    nearest = _nearest_cells_udf(centroids, 1)
    return df.withColumn(
        "cell", F.explode(nearest(as_double(vec_col)))
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 8,
    threshold: float = 0.9,
    n_iter: int = 4,
    n_sample: int = 256,
    max_cell_rows: int | None = None,
) -> DataFrame:
    """(id, cell, kept) for every input row — kept=1 survivors, kept=0
    semantic duplicates (some lower-id same-cell vector has cosine >=
    threshold). Filter `kept = 1` and join back for the deduped corpus.

    `n_sample` bounds the driver-side training collect; ids must be
    unique (the min-id rule needs a total order). `max_cell_rows`
    (default 50 * expected cell size) raises in-plan if any cell
    exceeds it — the pair join is O(cell²), so a saturated cell means
    `n_clusters` is too small for this corpus; the raise names the
    bound rather than letting one task quadratically absorb the skew.
    """
    if not (0.0 < threshold <= 1.0 + 1e-9):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    centroids = _centroids_from_prefix(
        df, id_col, vec_col, n_clusters, n_sample, n_iter
    )
    base = df.select(
        F.col(id_col).alias("__id"), as_double(vec_col).alias("__v")
    )
    cells = assign_cells(base, centroids, "__id", "__v").select(
        "__id", "__v", "cell"
    )

    if max_cell_rows is None:
        max_cell_rows = max(1000, 50 * (n_sample // max(n_clusters, 1)))
    # In-plan guard: count per cell once (cheap — reuses the same
    # cell-keyed shuffle partitioning), raise on saturation instead of
    # quietly running an O(cell²) join on a mega-cell.
    counts = cells.groupBy("cell").agg(F.count(F.lit(1)).alias("__n"))
    guarded = cells.join(counts, "cell").withColumn(
        "__v",
        F.when(F.col("__n") <= max_cell_rows, F.col("__v")).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "semantic_dedup: cell "
                    ),
                    F.col("cell").cast("string"),
                    F.lit(
                        f" exceeds max_cell_rows={max_cell_rows}; raise "
                        "n_clusters (pair join is O(cell^2))"
                    ),
                )
            )
        ),
    ).drop("__n")

    cos = _cosine_udf()
    a = guarded.select(
        F.col("cell"), F.col("__id").alias("__ida"), F.col("__v").alias("__va")
    )
    b = guarded.select(
        F.col("cell"), F.col("__id").alias("__idb"), F.col("__v").alias("__vb")
    )
    dropped = (
        a.join(b, "cell")
        .where(F.col("__ida") < F.col("__idb"))
        .where(F.round(cos(F.col("__va"), F.col("__vb")), 6) >= threshold)
        .select(F.col("__idb").alias("__dropped_id"))
        .distinct()
    )
    return (
        cells.join(
            dropped, cells["__id"] == dropped["__dropped_id"], "left"
        )
        .select(
            F.col("__id").alias(id_col),
            F.col("cell").cast("int").alias("cell"),
            F.col("__dropped_id").isNull().cast("int").alias("kept"),
        )
    )
