"""As-of join and range join — operators Spark lacks natively.

Neither exists in the reference (single-key inner equi-join only,
RPC.cs:248-310); both are table stakes for time-series analytics, so
they are built as compositions of existing distributed primitives —
no driver-side materialization.

Scale design:
- `asof_join` uses union + partition-key window ordering (the
  "union-sort trick"): one shuffle on the partition key, one window
  sort — identical asymptotics to a sort-merge join, with no O(n*m)
  blowup. This beats per-group `pd.merge_asof` (applyInPandas) because
  it stays in JVM whole-stage codegen and tolerates skewed groups.
- `range_join` buckets the range key so the join is an equi-join on
  (keys, bucket) + residual filter: Catalyst gets a hash-partitionable
  condition instead of a broadcast-nested-loop. Bucket width should be
  chosen ~ the typical range width.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str],
    right_cols: Sequence[str],
    suffix: str = "_r",
) -> DataFrame:
    """For each left row, attach the latest right row with
    right.on <= left.on within the same `by` group (backward as-of,
    DuckDB `ASOF JOIN` / pandas `merge_asof` semantics). Left outer:
    left rows with no prior right row keep nulls.

    Implementation: tag both sides, UNION ALL, then per-(by) window
    ordered by (on, is_left) carries the last non-null right attributes
    forward; finally keep only left rows. One shuffle, one sort.
    """
    lcols = left.columns
    tagged_l = left.select(
        *lcols,
        F.lit(1).alias("__is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c + suffix) for c in right_cols],
    )
    tagged_r = right.select(
        *[
            F.col(c) if c in list(by) + [on] else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("__is_left"),
        *[F.col(c).alias(c + suffix) for c in right_cols],
    )
    unioned = tagged_l.unionByName(tagged_r)
    # Right rows sort before left rows at equal timestamps so an exact
    # tie matches (<=): order by (on, __is_left) with right=0 first.
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *lcols,
        F.col("__is_left"),
        *[F.last(F.col(c + suffix), ignorenulls=True).over(w).alias(c + suffix) for c in right_cols],
    )
    return filled.filter(F.col("__is_left") == 1).drop("__is_left")


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_val: str,
    right_lo: str,
    right_hi: str,
    bucket_width: float,
    equi_keys: Sequence[str] = (),
) -> DataFrame:
    """Join left rows to right intervals: right_lo <= left_val < right_hi.

    Each right interval is exploded to the buckets it overlaps; the left
    value maps to exactly one bucket; the join becomes an equi-join on
    (equi_keys, bucket) with the interval predicate as a cheap residual
    filter. With numeric or epoch-cast timestamp columns this is fully
    shuffle-partitionable (no broadcast-nested-loop cliff at scale).
    """
    if bucket_width <= 0:
        # floor(x / w) with w <= 0 flips or collapses buckets — the
        # join would silently return wrong matches, not error.
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")
    lb = left.withColumn("__bucket", F.floor(F.col(left_val) / F.lit(bucket_width)))
    rb = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(right_lo) / F.lit(bucket_width)),
                F.floor((F.col(right_hi) - F.lit(1e-9)) / F.lit(bucket_width)),
            )
        ),
    )
    cond: Column = (F.col(f"l.{left_val}") >= F.col(f"r.{right_lo}")) & (
        F.col(f"l.{left_val}") < F.col(f"r.{right_hi}")
    )
    on = [F.col("l.__bucket") == F.col("r.__bucket")] + [
        F.col(f"l.{k}") == F.col(f"r.{k}") for k in equi_keys
    ]
    joined = lb.alias("l").join(rb.alias("r"), on, "inner").filter(cond)
    keep_r = [c for c in right.columns if c not in set(equi_keys)]
    return joined.select(
        *[F.col(f"l.{c}") for c in left.columns],
        *[F.col(f"r.{c}") for c in keep_r],
    )
