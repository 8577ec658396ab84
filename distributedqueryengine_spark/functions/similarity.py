"""Similarity search over embedding columns (array<float>).

North-star capability (BASELINE.json). Two paths:

- `brute_force_topk`: exact cosine top-k. The query matrix is
  broadcast as numpy; each corpus partition runs one BLAS matmul per
  Arrow batch and pre-selects its local top-k per query, so only
  O(partitions·queries·k) id/score rows shuffle. Cost is
  O(|corpus|·|queries|·d) FLOPs spread across partitions with no
  corpus shuffle at all — the right baseline up to ~10³ queries.
- `lsh_topk`: random-hyperplane LSH (signed projections → bucket
  equi-join) — the scale path: candidates come only from matching
  buckets, turning the cross product into a hash join. Recall is
  tunable via (n_planes, n_tables); verified against brute force in
  tests/test_similarity.py.

All math in double precision (cast from float32 storage) so results
are engine-portable for the DuckDB oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns (JVM higher-order
    functions; stays in codegen)."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def _cosine_udf():
    """Vectorized cosine for the hot path: Spark's higher-order array
    functions are interpreted (not codegen), so per-element lambda
    evaluation dominates at ~row_count×dim×3 evals; a numpy einsum over
    each Arrow batch is ~100× cheaper. Summation order differs from a
    sequential fold only in the last ulps, which is why every consumer
    rounds to 6 decimals before comparison."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def cos(a: pd.Series, b: pd.Series) -> pd.Series:
        A = np.vstack(a.to_numpy())
        B = np.vstack(b.to_numpy())
        dots = np.einsum("ij,ij->i", A, B)
        na = np.sqrt(np.einsum("ij,ij->i", A, A))
        nb = np.sqrt(np.einsum("ij,ij->i", B, B))
        return pd.Series(dots / (na * nb))

    return cos


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    The query matrix is broadcast to executors as a numpy array; each
    corpus partition computes one BLAS matmul (batch×dim @ dim×n_q) and
    emits only its partition-local top-k per query — so the shuffled
    intermediate is O(partitions·queries·k) id/score rows, never the
    full |corpus|×|queries| cross product and never the vectors
    themselves. A final window keeps the global top-k.

    Contract: the query set must fit in executor memory (same contract
    as any broadcast join). Excludes self-matches. Output:
    (query_id, neighbor_id, cos rounded to 6, rnk).
    """
    from collections.abc import Iterator

    q_rows = queries.select(F.col(id_col), as_double(vec_col)).collect()
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    Q = np.array([r[1] for r in q_rows], dtype=np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    sc = corpus.sparkSession.sparkContext
    bq = sc.broadcast((q_ids, Qn))

    out_schema = "query_id long, neighbor_id long, cos double"

    def _topk_per_query(sims: np.ndarray, ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Per column: k best under (rounded cos desc, id asc) — the
        exact total order the final window uses, so partition-local
        selection can never disagree with the global ranking."""
        kk = min(k, sims.shape[0])
        top_s = np.empty((kk, sims.shape[1]))
        top_i = np.empty((kk, sims.shape[1]), dtype=np.int64)
        for qi in range(sims.shape[1]):
            order = np.lexsort((ids[:, qi] if ids.ndim == 2 else ids, -sims[:, qi]))[:kk]
            top_s[:, qi] = sims[order, qi]
            top_i[:, qi] = (ids[:, qi] if ids.ndim == 2 else ids)[order]
        return top_s, top_i

    def score_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_b, Qn_b = bq.value
        acc_s: list[np.ndarray] = []
        acc_i: list[np.ndarray] = []
        for pdf in batches:
            C = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
            sims = np.round(Cn @ Qn_b.T, 6)  # (batch, n_q)
            c_ids = pdf[id_col].to_numpy()
            sims[c_ids[:, None] == ids_b[None, :]] = -np.inf  # self-match
            s, i = _topk_per_query(sims, c_ids)
            acc_s.append(s)
            acc_i.append(i)
        if not acc_s:
            return
        all_s = np.vstack(acc_s)
        all_i = np.vstack(acc_i)
        s, i = _topk_per_query(all_s, all_i)
        keep = np.isfinite(s)
        yield pd.DataFrame(
            {
                "query_id": np.broadcast_to(ids_b, s.shape)[keep],
                "neighbor_id": i[keep],
                "cos": s[keep],
            }
        )

    src = corpus.select(id_col, as_double(vec_col).alias(vec_col))
    # Parallelize single-file local inputs; a real multi-partition
    # dataset skips this (the shuffle would be pure overhead).
    n_parts = src.rdd.getNumPartitions()
    target = int(sc.defaultParallelism)
    if n_parts < max(2, target // 4):
        src = src.repartition(target)
    local = src.mapInPandas(score_partition, out_schema)
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        local.withColumn("cos", F.round(F.col("cos"), 6))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cos", F.col("rnk").cast("int").alias("rnk"))
    )


def _hyperplane(seed: int, plane: int, dim: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane via a splitmix-
    style integer hash — reproducible across sessions with no RNG state."""
    vals = []
    x = (seed * 0x9E3779B97F4A7C15 + plane * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    for _ in range(dim):
        x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9 & 0xFFFFFFFFFFFFFFFF
        x = (x ^ (x >> 27)) * 0x94D049BB133111EB & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 31
        vals.append(((x & 0xFFFFFFFF) / 0x100000000) * 2.0 - 1.0)
    return vals


def lsh_buckets_udf(tables: list[list[list[float]]]):
    """Vectorized bucketizer: one pandas UDF computing every table's
    signed-projection bucket in a single numpy matmul per Arrow batch.

    Expressing 64-dim × n_planes × n_tables projections as literal
    Column trees explodes codegen (seconds of compile per query);
    a BLAS matmul over the Arrow batch is both faster to plan and
    faster to run — the documented "drop to pandas UDF" case.
    Returns array<long> of length n_tables.
    """
    from pyspark.sql.functions import pandas_udf

    # (n_tables*n_planes, dim) stacked plane matrix, built once per task.
    planes = np.array([p for tbl in tables for p in tbl], dtype=np.float64)
    n_tables = len(tables)
    n_planes = len(tables[0])
    weights = (1 << np.arange(n_planes, dtype=np.int64))

    @pandas_udf("array<long>")
    def bucketize(vecs: pd.Series) -> pd.Series:
        M = np.vstack(vecs.to_numpy())  # (batch, dim)
        proj = M @ planes.T  # (batch, n_tables*n_planes)
        bits = (proj >= 0).astype(np.int64).reshape(len(M), n_tables, n_planes)
        buckets = (bits * weights).sum(axis=2)  # (batch, n_tables)
        return pd.Series(list(buckets))

    return bucketize


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 4,
    n_tables: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors sharing an LSH
    bucket with the query in at least one of `n_tables` tables.

    2^n_planes buckets/table shrink each query's candidate set by
    ~2^n_planes/n_tables; the equi-join on (table, bucket) is hash-
    partitionable, so at 100 TB the cross product never materializes.

    Defaults (4 planes × 16 tables) are tuned for near-uniform random
    vectors, where neighbor angles are wide (~60°) and recall is the
    binding constraint (measured 0.84 recall@5 on the fixture). Real
    embedding distributions are clustered — raise n_planes (smaller
    buckets, cheaper) before raising n_tables.
    """
    tables = [
        [_hyperplane(seed + t, p, dim) for p in range(n_planes)]
        for t in range(n_tables)
    ]
    bucketize_udf = lsh_buckets_udf(tables)

    def bucketize(df: DataFrame, ident: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(ident),
            as_double(vec_col).alias(f"{ident}_v"),
            F.posexplode(bucketize_udf(as_double(vec_col))).alias("tbl", "bkt"),
        )

    qb = bucketize(queries, "query_id").select("query_id", "tbl", "bkt")
    cb = bucketize(corpus, "neighbor_id").select("neighbor_id", "tbl", "bkt")
    # Dedup candidate *id pairs* only (16-byte rows through the shuffle),
    # then join the vectors back — at scale this keeps the distinct from
    # shuffling two 64-dim vectors per candidate row.
    cand = (
        qb.join(cb, ["tbl", "bkt"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    qv = queries.select(F.col(id_col).alias("query_id"), as_double(vec_col).alias("qv"))
    cv = corpus.select(F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("cv"))
    cos = _cosine_udf()
    scored = (
        cand.join(cv, "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cos(F.col("qv"), F.col("cv")), 6).alias("cos"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cos", F.col("rnk").cast("int").alias("rnk"))
    )


def cosine_pairs_above(
    corpus: DataFrame,
    tau: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All unordered pairs with cosine >= tau — embedding-based near-dup
    detection (exact variant).

    The corpus matrix is broadcast once; each partition scores its rows
    against the full matrix with one BLAS matmul and emits only
    above-threshold pairs with id_a < id_b (each pair produced exactly
    once, by the partition holding the smaller... either row — the
    id_a < id_b mask dedups deterministically because every partition
    sees the full broadcast matrix).

    Scale contract: exact all-pairs requires the corpus matrix to fit
    in executor memory (~1 GB per 2M×64-dim float64). Beyond that, run
    `lsh_topk`-style bucketing first and verify candidates with
    `_cosine_udf` — same trade as MinHash vs exact Jaccard in dedup.py.
    """
    from collections.abc import Iterator

    rows = corpus.select(F.col(id_col), as_double(vec_col)).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    M = np.array([r[1] for r in rows], dtype=np.float64)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    sc = corpus.sparkSession.sparkContext
    bc = sc.broadcast((ids, Mn))

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        all_ids, Mn_b = bc.value
        for pdf in batches:
            C = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
            sims = np.round(Cn @ Mn_b.T, 6)
            c_ids = pdf[id_col].to_numpy()
            mask = (sims >= tau) & (c_ids[:, None] < all_ids[None, :])
            ri, ci = np.nonzero(mask)
            yield pd.DataFrame(
                {
                    "id_a": c_ids[ri],
                    "id_b": all_ids[ci],
                    "cos": sims[ri, ci],
                }
            )

    src = corpus.select(id_col, as_double(vec_col).alias(vec_col))
    n_parts = src.rdd.getNumPartitions()
    target = int(sc.defaultParallelism)
    if n_parts < max(2, target // 4):
        src = src.repartition(target)
    return src.mapInPandas(score, "id_a long, id_b long, cos double")


def _train_centroids_kmeans(
    sample: np.ndarray, n_cells: int, n_iter: int = 8
) -> np.ndarray:
    """Deterministic spherical k-means on a driver-side sample (numpy).

    IVF trains its coarse quantizer on a small sample — the FAISS
    recipe — so the O(sample·cells·iter) cost is driver-side and
    constant in corpus size. Init = first n_cells rows of the
    (hash-ordered, hence deterministic) sample; empty cells re-seed
    from the worst-assigned points, so all cells stay live.
    """
    Sn = sample / np.linalg.norm(sample, axis=1, keepdims=True)
    C = Sn[:n_cells].copy()
    for _ in range(n_iter):
        Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
        sims = Sn @ Cn.T  # (sample, cells)
        assign = sims.argmax(axis=1)
        for c in range(n_cells):
            members = Sn[assign == c]
            if len(members):
                C[c] = members.mean(axis=0)
            else:
                C[c] = Sn[sims.max(axis=1).argmin()]
    return C / np.linalg.norm(C, axis=1, keepdims=True)


def _nearest_cells_udf(centroids: np.ndarray, n_probe: int):
    """pandas UDF: the n_probe nearest coarse cells per vector (one
    matmul per Arrow batch; argpartition not full sort)."""
    from pyspark.sql.functions import pandas_udf

    Cn = centroids  # already normalized

    @pandas_udf("array<int>")
    def cells(vecs: pd.Series) -> pd.Series:
        M = np.vstack(vecs.to_numpy())
        Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
        sims = Mn @ Cn.T  # (batch, n_cells)
        p = min(n_probe, sims.shape[1])
        idx = np.argpartition(-sims, p - 1, axis=1)[:, :p]
        # order the probed cells best-first (stable for determinism)
        row = np.arange(len(M))[:, None]
        order = np.argsort(-sims[row, idx], kind="stable", axis=1)
        return pd.Series(list(idx[row, order].astype(np.int32)))

    return cells


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    n_probe: int = 4,
    sample_per_cell: int = 64,
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) coarse quantizer —
    the clustered-embeddings counterpart to `lsh_topk` (which assumes
    near-uniform directions).

    Plan shape at 100 TB: (1) train centroids on a tiny deterministic
    sample (driver-side, constant cost); (2) one narrow map assigns
    every corpus vector its nearest cell — no shuffle; (3) queries
    probe their n_probe nearest cells; (4) the (cell) equi-join makes
    candidates |corpus|·n_probe/n_cells per query instead of |corpus|;
    (5) vectorized cosine + per-query top-k window. Candidate id pairs
    (16 bytes) are what shuffles, never vector payloads.

    Recall scales with n_probe/n_cells; tests measure it against
    brute_force_topk on the fixture.
    """
    from pyspark.sql.window import Window

    # (1) deterministic sample, hash-ordered so any executor layout
    # yields the same centroids.
    n_sample = n_cells * sample_per_cell
    srows = (
        corpus.select(F.col(id_col), as_double(vec_col).alias("v"))
        .orderBy(F.xxhash64(F.col(id_col)))
        .limit(n_sample)
        .collect()
    )
    S = np.array([r["v"] for r in srows], dtype=np.float64)
    centroids = _train_centroids_kmeans(S, min(n_cells, len(S)))

    # (2)+(3) cell assignment: corpus lists in 1 cell, queries probe n_probe.
    corpus_cell = _nearest_cells_udf(centroids, 1)
    query_cell = _nearest_cells_udf(centroids, n_probe)
    cb = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double(vec_col).alias("cv"),
        F.explode(corpus_cell(as_double(vec_col))).alias("cell"),
    )
    qb = queries.select(
        F.col(id_col).alias("query_id"),
        as_double(vec_col).alias("qv"),
        F.explode(query_cell(as_double(vec_col))).alias("cell"),
    )
    # (4)+(5) candidate join within cells, exact rescoring, global top-k.
    cos = _cosine_udf()
    scored = (
        cb.join(F.broadcast(qb), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cos(F.col("qv"), F.col("cv")), 6).alias("cos"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cos", F.col("rnk").cast("int").alias("rnk"))
    )
