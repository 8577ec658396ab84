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


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Excludes self-matches. Output: (query_id, neighbor_id, cos) — cos
    rounded to 6 (double math is order-stable here: a fixed-length
    fold, identical on any engine).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("cv")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos"),
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


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Signed-projection bucket id: bit p = sign(vec · plane_p)."""
    bucket = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(vec, F.array(*[F.lit(v) for v in plane]), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket.bitwiseXOR(
            F.shiftleft(F.when(proj >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long")), p)
        )
    return bucket


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

    def bucketize(df: DataFrame, ident: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(ident),
            as_double(vec_col).alias(f"{ident}_v"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("tbl"),
                            lsh_bucket(as_double(vec_col), tables[t]).alias("bkt"),
                        )
                        for t in range(len(tables))
                    ]
                )
            ).alias("tb"),
        ).select(ident, f"{ident}_v", "tb.tbl", "tb.bkt")

    qb = bucketize(queries, "query_id")
    cb = bucketize(corpus, "neighbor_id")
    cand = (
        qb.join(cb, ["tbl", "bkt"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "query_id_v", "neighbor_id_v")
        .distinct()
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("query_id_v"), F.col("neighbor_id_v")), 6).alias("cos"),
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
