"""Time-series regularization: bucketed resampling with gap filling.

The continuous-aggregate counterpart to q_time_rollup's grouping-sets
rollup: real event streams have holes (no events in a bucket), and
downstream consumers (charts, models, window features) need a REGULAR
grid per key — every bucket present, missing values filled by policy
(NULL, zero, or forward-fill). Timescale calls this time_bucket_gapfill
+ locf; Spark has no built-in, so it composes here from:

1. one hash aggregate to (key, bucket) granularity,
2. a per-key [min_bucket, max_bucket] grid via explode(sequence(...))
   — narrow generation, row count = buckets per key, no join against a
   global calendar table,
3. a left join of observed values onto the grid (same key+bucket
   partitioning as the aggregate — AQE sees matching distributions),
4. forward fill as last(value, ignorenulls=True) over an unbounded
   preceding window per key.

One shuffle on the key for the aggregate/join + one window sort; the
grid never materializes more than max_buckets rows per key (guarded —
a mis-specified interval on a years-long series would otherwise
explode silently).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def resample_fill(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    interval_seconds: int,
    value_aggs: dict[str, Column],
    fill: str = "null",
    max_buckets_per_key: int = 1_000_000,
) -> DataFrame:
    """Regular per-key time grid at `interval_seconds` with
    `value_aggs` (name -> aggregate Column over the bucket's rows) and
    gap policy `fill` in {'null', 'zero', 'ffill'}. Output: key_cols +
    bucket_ts (epoch seconds, long) + one column per agg + `observed`
    (false on filled gap rows).

    'ffill' carries the last observed value forward (gaps before a
    key's first observation stay NULL — there is nothing to carry);
    'zero' fills numeric gaps with 0; 'null' leaves them NULL.
    """
    if fill not in ("null", "zero", "ffill"):
        raise ValueError(f"fill must be null|zero|ffill, got {fill!r}")
    if interval_seconds <= 0:
        raise ValueError(f"interval_seconds must be positive, got {interval_seconds}")
    keys = list(key_cols)
    bucket = (
        F.floor(F.unix_timestamp(F.col(ts_col)) / interval_seconds)
        * interval_seconds
    ).cast("long")
    observed = (
        df.withColumn("__bucket", bucket)
        .groupBy(*keys, "__bucket")
        .agg(*[c.alias(n) for n, c in value_aggs.items()])
        .withColumn("observed", F.lit(True))
    )
    spans = observed.groupBy(*keys).agg(
        F.min("__bucket").alias("__lo"), F.max("__bucket").alias("__hi")
    )
    # grid-size guard: raise rather than silently exploding the grid
    too_big = spans.filter(
        (F.col("__hi") - F.col("__lo")) / interval_seconds >= max_buckets_per_key
    ).limit(1).count()
    if too_big:
        raise ValueError(
            f"a key spans >= {max_buckets_per_key} buckets at "
            f"interval={interval_seconds}s; coarsen the interval or raise "
            "max_buckets_per_key"
        )
    grid = spans.select(
        *keys,
        F.explode(
            F.sequence("__lo", "__hi", F.lit(interval_seconds).cast("long"))
        ).alias("__bucket"),
    )
    joined = grid.join(observed, [*keys, "__bucket"], "left").withColumn(
        "observed", F.coalesce("observed", F.lit(False))
    )
    names = list(value_aggs)
    if fill == "zero":
        joined = joined.na.fill({n: 0 for n in names})
    elif fill == "ffill":
        w = (
            Window.partitionBy(*keys)
            .orderBy("__bucket")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        for n in names:
            joined = joined.withColumn(
                n, F.last(n, ignorenulls=True).over(w)
            )
    return joined.select(
        *keys, F.col("__bucket").alias("bucket_ts"), *names, "observed"
    )
