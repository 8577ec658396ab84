"""Skew mitigation: salted aggregation and salted broadcast-free join.

At 100 TB a single hot key (the null user, the default product, the
bot account) can put an entire shuffle partition on one executor. Two
standing remedies beyond AQE's automatic skew-join splitting
(spark.sql.adaptive.skewJoin, on by default in session.py):

- `salted_agg`: two-phase aggregation — keys are sharded into
  `n_salts` sub-keys, partially aggregated per shard (spreading the
  hot key over n_salts tasks), then re-aggregated. Works for any
  algebraic aggregate (sum/count/min/max; avg via sum+count).
- `salted_join`: replicate the small side n_salts times, salt the big
  side randomly-but-deterministically (hash of a unique column), join
  on (key, salt). Spreads a hot key's rows over n_salts tasks at the
  cost of replicating the other side n_salts×.

Both are pure DataFrame compositions — no custom partitioner — so AQE
and codegen still apply.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(df: DataFrame, n_salts: int, unique_cols: Sequence[str]) -> Column:
    """Deterministic pseudo-random salt in [0, n_salts): hash of columns
    that are (together) unique per row — reproducible, no RNG state."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in unique_cols]), F.lit(n_salts))


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str],
    unique_cols: Sequence[str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase sum/count aggregation resilient to hot keys.

    Phase 1 groups by (keys, salt) — the hot key spreads over n_salts
    partial groups; phase 2 merges partials by keys. Output columns:
    sum_<c> per sum col + n_rows.
    """
    salted = df.withColumn("__salt", _salt(df, n_salts, unique_cols))
    partial = salted.groupBy(*keys, "__salt").agg(
        F.count(F.lit(1)).alias("__n"),
        *[F.sum(c).alias(f"__s_{c}") for c in sum_cols],
    )
    return partial.groupBy(*keys).agg(
        F.sum("__n").alias("n_rows"),
        *[F.sum(f"__s_{c}").alias(f"sum_{c}") for c in sum_cols],
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    unique_cols: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated.

    For each small-side row, n_salts copies tagged 0..n-1; each big row
    carries one deterministic salt — so the join key (key, salt) splits
    every hot key into n_salts independent hash-join partitions. Use
    when the small side is too big to broadcast but the big side is
    skewed; otherwise prefer plain join + AQE.
    """
    big_s = big.withColumn("__salt", _salt(big, n_salts, unique_cols))
    small_r = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    joined = big_s.join(
        small_r,
        (F.col(big_key) == F.col(small_key)) & (big_s["__salt"] == small_r["__salt"]),
        how,
    )
    return joined.drop("__salt")


def key_skew_report(
    df: DataFrame, key_cols: Sequence[str], top_n: int = 20
) -> DataFrame:
    """Pre-join/agg skew diagnostic: per-key row counts for the top_n
    heaviest keys, each with its share of the table and its skew factor
    (count / mean-count-per-key). A factor ≫ partition count means one
    task will own that key's entire hash bucket — the signal to reach
    for salted_join/salted_agg above or AQE skew handling.

    Two aggregations over one scan (key counts, then global stats
    joined in as a 1-row broadcast); top_n via TakeOrderedAndProject,
    never a full sort. Run it on the JOIN KEY of both sides before
    sizing a big join.
    """
    from pyspark.sql import functions as F

    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n_rows"))
    stats = counts.agg(
        F.sum("n_rows").alias("__total"),
        F.avg("n_rows").alias("__mean"),
        F.count(F.lit(1)).alias("__n_keys"),
    )
    return (
        counts.crossJoin(F.broadcast(stats))
        .select(
            *key_cols,
            "n_rows",
            F.round(F.col("n_rows") / F.col("__total"), 6).alias("share"),
            F.round(F.col("n_rows") / F.col("__mean"), 2).alias("skew_factor"),
            F.col("__n_keys").alias("n_distinct_keys"),
        )
        .orderBy(F.col("n_rows").desc(), *key_cols)
        .limit(top_n)
    )
