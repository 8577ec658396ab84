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
3. **Dedupe within cells**: ONE cell-keyed shuffle into
   `applyInPandas`, then a blocked numpy Gram matmul per cell and the
   min-id keep rule — a vector is dropped iff some lower-id vector in
   its cell has round(cos, 6) >= threshold. Deterministic, order-free,
   and chain-free: each decision looks only at pairs, so it
   parallelizes without the sequential scan the greedy SemDeDup
   formulation implies. (A pair self-join would move every vector
   once PER PAIR — cell_rows× more shuffle; the matmul formulation
   moves each vector exactly once and does the O(cell²) arithmetic in
   BLAS, blocked to cap memory at block_rows·cell floats.)

At 100 TB: the only all-data shuffle is the cell-keyed grouping, whose
cardinality and balance you control via `n_clusters`. `max_cell_rows`
raises (not silently) when a cell exceeds the O(cell²) budget, the
signal to raise `n_clusters`.
"""
from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

from distributedqueryengine_spark.functions.similarity import (
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
    keep: str = "min_id",
) -> DataFrame:
    """(id, cell, kept) for every input row — kept=1 survivors, kept=0
    semantic duplicates (some higher-priority same-cell vector has
    cosine >= threshold). Filter `kept = 1` and join back for the
    deduped corpus.

    `keep` picks the survivor-priority order inside a duplicate
    neighborhood:
    - 'min_id' (default, the ORACLED mode): lowest id wins —
      deterministic without touching geometry.
    - 'centroid_far': keep the example FARTHEST from its cluster
      centroid (lowest cos-to-centroid first, ties by id) — the
      SemDeDup paper's choice (§3, arXiv:2303.09540): among semantic
      duplicates the most atypical example adds the most training
      signal.
    - 'centroid_near': nearest-to-centroid wins — the prototype-keeping
      variant for eval-set curation.
    All three use the same pairwise chain-free rule — j is dropped iff
    some higher-priority i in its cell has round(cos,6) >= threshold.

    `n_sample` bounds the driver-side training collect; ids must be
    unique (priority ties break by id, so determinism needs a total
    order). `max_cell_rows` (default 50 * expected cell size) raises
    in-plan if any cell exceeds it — within-cell work is O(cell²), so
    a saturated cell means `n_clusters` is too small for this corpus;
    the raise names the bound rather than letting one task
    quadratically absorb the skew.
    """
    if not (0.0 < threshold <= 1.0 + 1e-9):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    if keep not in ("min_id", "centroid_far", "centroid_near"):
        raise ValueError(
            f"keep must be min_id | centroid_far | centroid_near, got {keep!r}"
        )
    import pandas as pd

    from distributedqueryengine_spark.functions.similarity import _safe_norm

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
    _max_rows = max_cell_rows
    _thresh = threshold
    _keep = keep
    _centroids = centroids  # (n_clusters, dim), L2-normalized

    def _dedupe_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n > _max_rows:
            raise ValueError(
                f"semantic_dedup: cell {int(pdf['cell'].iloc[0])} has {n} "
                f"rows > max_cell_rows={_max_rows}; raise n_clusters "
                "(within-cell work is O(cell^2))"
            )
        # survivor-priority order: position 0 = highest priority
        pdf = pdf.sort_values("__id", kind="mergesort").reset_index(drop=True)
        Vn = _safe_norm(np.vstack(pdf["__v"].to_numpy()).astype(np.float64))
        if _keep != "min_id":
            cen = _centroids[int(pdf["cell"].iloc[0])]
            cos_c = np.round(Vn @ cen, 6)
            order = np.argsort(
                cos_c if _keep == "centroid_far" else -cos_c,
                kind="stable",  # id ascending breaks priority ties
            )
            pdf = pdf.iloc[order].reset_index(drop=True)
            Vn = Vn[order]
        kept = np.ones(n, dtype=bool)
        # blocked Gram matmul: block_rows × n floats live at once, so a
        # 100k-row cell peaks at ~800 MB / blocks of 1024 → ~800 KB·n
        block = 1024
        for lo in range(0, n, block):
            hi = min(lo + block, n)
            sims = np.round(Vn[lo:hi] @ Vn.T, 6)  # (hi-lo, n)
            # j = lo+off dropped iff any higher-priority i (position
            # < j) has sims >= threshold; i counts kept AND dropped
            # rows — chain-free. Columns [0, lo) fully count; within-
            # block columns form a strictly-lower triangle.
            mask = sims >= _thresh
            pre = mask[:, :lo].any(axis=1)
            tri = np.tril(mask[:, lo:hi], k=-1).any(axis=1)
            kept[lo:hi] = ~(pre | tri)
        return pd.DataFrame(
            {
                "__id": pdf["__id"],
                "cell": pdf["cell"].astype("int32"),
                "kept": kept.astype("int32"),
            }
        )

    out = cells.groupBy("cell").applyInPandas(
        _dedupe_cell, schema=f"__id {base.schema['__id'].dataType.simpleString()}, cell int, kept int"
    )
    return out.select(
        F.col("__id").alias(id_col),
        F.col("cell").cast("int").alias("cell"),
        F.col("kept").cast("int").alias("kept"),
    )
