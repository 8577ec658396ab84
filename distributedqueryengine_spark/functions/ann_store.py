"""Persisted IVF index: save/load the build across sessions, probe
with cell-pruned reads.

`similarity.build_ivf_index` + `probe_ivf_index` amortize the ANN
build over many query batches — but only within one session, because
the index lives in the cache. This module is the production half of
the amortization story: the build lands on the lake ONCE and every
later session (or service instance) probes it with a partition-pruned
scan — no rebuild, no full-index read.

Layout under `<path>/`:
- `index/` — the build_ivf_index table (neighbor_id, cell, cv),
  written partitioned by `cell_bucket = cell % n_buckets`. Bucketing
  bounds the directory fan-out (n_buckets dirs, not n_cells) while a
  probe still prunes to the buckets its cells live in — partition
  pruning on `cell_bucket`, then parquet row-group min/max skipping on
  `cell` inside each bucket (the writer sorts by cell within buckets
  to keep those ranges tight).
- `centroids/` — (cell, vector) rows; model-sized.
- `meta/` — one row: dim, n_cells, n_buckets, with_vectors, version.

`probe_saved_ivf_index` computes the batch's probed cells first (one
tiny job over the query batch), then reads ONLY those cells' buckets
with an explicit `cell_bucket IN … AND cell IN …` filter — static
pruning a reader can verify via inputFiles(), rather than hoping
dynamic partition pruning fires through the join. At 100 TB the index
table is the big object; a probe touching n_probe·batch cells reads
n_probe·batch/n_cells of it.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["save_ivf_index", "load_ivf_index", "probe_saved_ivf_index"]

_VERSION = 1


def save_ivf_index(
    index: DataFrame,
    centroids: np.ndarray,
    path: str,
    n_buckets: int = 64,
) -> None:
    """Persist a `build_ivf_index` table + its centroids under `path`.
    The index MUST carry vectors (with_vectors=True, the default
    build) — a saved index exists to make probes corpus-free."""
    if "cv" not in index.columns:
        raise ValueError("save_ivf_index needs a vector-carrying index "
                         "(build_ivf_index with_vectors=True)")
    n_cells, dim = centroids.shape
    n_buckets = max(1, min(int(n_buckets), n_cells))
    spark = index.sparkSession
    base = path.rstrip("/")
    (
        index.withColumn("cell_bucket", F.pmod(F.col("cell"), F.lit(n_buckets)))
        .repartition("cell_bucket")
        .sortWithinPartitions("cell")  # tight per-file cell ranges
        .write.mode("overwrite")
        .partitionBy("cell_bucket")
        .parquet(base + "/index")
    )
    cent_rows = [(i, [float(x) for x in centroids[i]]) for i in range(n_cells)]
    spark.createDataFrame(
        cent_rows, "cell int, vector array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(base + "/centroids")
    spark.createDataFrame(
        [(int(dim), int(n_cells), int(n_buckets), True, _VERSION)],
        "dim int, n_cells int, n_buckets int, with_vectors boolean, version int",
    ).coalesce(1).write.mode("overwrite").parquet(base + "/meta")


def _read_meta(spark: SparkSession, path: str):
    row = spark.read.parquet(path.rstrip("/") + "/meta").collect()[0]
    if row["version"] > _VERSION:
        raise ValueError(
            f"saved IVF index at {path} has version {row['version']} > "
            f"supported {_VERSION}"
        )
    return row


def load_ivf_index(
    spark: SparkSession, path: str
) -> tuple[DataFrame, np.ndarray]:
    """(index DataFrame, centroids array) from a `save_ivf_index`
    layout — drop-in arguments for `similarity.probe_ivf_index`. The
    returned DataFrame scans the whole index; use
    `probe_saved_ivf_index` for cell-pruned per-batch reads."""
    base = path.rstrip("/")
    meta = _read_meta(spark, base)
    cent = (
        spark.read.parquet(base + "/centroids")
        .orderBy("cell")
        .collect()
    )
    centroids = np.array([r["vector"] for r in cent], dtype=np.float64)
    if centroids.shape != (meta["n_cells"], meta["dim"]):
        raise ValueError(
            f"centroids shape {centroids.shape} != meta "
            f"({meta['n_cells']}, {meta['dim']}) — torn write?"
        )
    idx = spark.read.parquet(base + "/index").drop("cell_bucket")
    return idx, centroids


def probe_saved_ivf_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 4,
    centroids: np.ndarray | None = None,
    n_buckets: int | None = None,
) -> DataFrame:
    """Approximate top-k against a saved index, reading ONLY the
    probed cells: the batch's nearest cells are computed first (one
    job over the batch — bounded by the query-batch contract), then
    the index read carries `cell_bucket IN … AND cell IN …`, so
    partition pruning + row-group stats skip everything else. Scoring
    then reuses `similarity.probe_ivf_index` on the pruned slice.

    A probe-many service should load the (model-sized) centroids once
    and pass them back in with the saved `n_buckets` — measured at
    1.3M rows the per-call centroid/meta re-read is most of the
    4.5s-vs-1.9s gap between saved and in-memory probes."""
    from distributedqueryengine_spark.functions.similarity import (
        _nearest_cells_udf,
        as_double,
        probe_ivf_index,
    )

    base = path.rstrip("/")
    if centroids is None or n_buckets is None:
        meta = _read_meta(spark, base)
        n_buckets = int(meta["n_buckets"])
        _, centroids = load_ivf_index(spark, base)
    meta = {"n_buckets": int(n_buckets)}

    query_cell = _nearest_cells_udf(centroids, n_probe)
    cells = sorted(
        r["cell"]
        for r in queries.select(
            F.explode(query_cell(as_double(vec_col))).alias("cell")
        )
        .distinct()
        .collect()
    )
    buckets = sorted({c % meta["n_buckets"] for c in cells})
    pruned = (
        spark.read.parquet(base + "/index")
        .filter(
            F.col("cell_bucket").isin(buckets) & F.col("cell").isin(cells)
        )
        .drop("cell_bucket")
    )
    # corpus arg is unused on the vector-carrying path; pass the pruned
    # index to keep the signature honest without a second scan source
    return probe_ivf_index(
        pruned,
        pruned.select(F.col("neighbor_id").alias(id_col),
                      F.col("cv").alias(vec_col)),
        queries, centroids, k,
        id_col=id_col, vec_col=vec_col, n_probe=n_probe,
    )
