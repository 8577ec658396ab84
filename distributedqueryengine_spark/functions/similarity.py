"""Similarity search over embedding columns (array<float>).

North-star capability (BASELINE.json). Two paths:

- `brute_force_topk`: exact cosine top-k. The query set is broadcast
  (it is the small side by construction); every corpus partition
  scores its vectors against all queries JVM-side (zip_with/aggregate
  — no Python), then a per-query top-k window keeps k rows. Cost is
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
    import heapq
    from collections.abc import Iterator

    q_rows = queries.select(F.col(id_col), as_double(vec_col)).collect()
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    Q = np.array([r[1] for r in q_rows], dtype=np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    sc = corpus.sparkSession.sparkContext
    bq = sc.broadcast((q_ids, Qn))

    out_schema = "query_id long, neighbor_id long, cos double"

    def score_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_b, Qn_b = bq.value
        # per-query heaps across all batches of this partition
        heaps: list[list[tuple[float, int]]] = [[] for _ in ids_b]
        for pdf in batches:
            C = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
            sims = Cn @ Qn_b.T  # (batch, n_q)
            c_ids = pdf[id_col].to_numpy()
            for qi in range(len(ids_b)):
                col = sims[:, qi]
                mask = c_ids != ids_b[qi]
                for s, nid in zip(np.round(col[mask], 6), c_ids[mask]):
                    h = heaps[qi]
                    # (rounded cos, -neighbor_id) ordering ≡ the final
                    # window's (rounded desc, id asc) — selecting on the
                    # unrounded value could disagree with the oracle at
                    # the k-th boundary when two sims round equal.
                    item = (float(s), -int(nid))
                    if len(h) < k:
                        heapq.heappush(h, item)
                    elif item > h[0]:
                        heapq.heapreplace(h, item)
        rows = [
            (int(ids_b[qi]), -nid_neg, s)
            for qi in range(len(ids_b))
            for (s, nid_neg) in heaps[qi]
        ]
        yield pd.DataFrame(rows, columns=["query_id", "neighbor_id", "cos"])

    local = corpus.select(id_col, as_double(vec_col).alias(vec_col)).mapInPandas(
        score_partition, out_schema
    )
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
