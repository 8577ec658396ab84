"""Window functions: ranking, offsets, frames, top-k per group.

Not present in the reference (closed operator enum, RPC.cs:20-28).
Implemented over Spark's WindowExec: one shuffle on partitionBy keys,
then a per-partition sort — at scale the partition key choice IS the
cost model, so every helper takes explicit partition keys and the
top-k helper filters on row_number instead of collecting (no driver
materialization, unlike the reference's whole-result pulls
RPC.cs:225-246).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def _spec(partition_by: Sequence[str], order_by: Sequence[Column | str]) -> WindowSpec:
    return Window.partitionBy(*partition_by).orderBy(*order_by)


def top_k_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column | str],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-k rows per group via row_number + filter.

    The canonical scale-safe top-k: the window sort happens inside each
    hash partition and the filter drops everything past k before any
    further stage. order_by must be tie-free (include a unique key) for
    deterministic results.
    """
    w = _spec(partition_by, order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)


def with_rank(df: DataFrame, partition_by: Sequence[str], order_by: Sequence[Column | str], kind: str = "rank", out: str = "rk") -> DataFrame:
    """rank / dense_rank / row_number / ntile / percent_rank over one spec."""
    fns = {
        "rank": F.rank,
        "dense_rank": F.dense_rank,
        "row_number": F.row_number,
        "percent_rank": F.percent_rank,
        "cume_dist": F.cume_dist,
    }
    if kind not in fns:
        raise ValueError(f"rank kind {kind!r} not in {sorted(fns)}")
    return df.withColumn(out, fns[kind]().over(_spec(partition_by, order_by)))


def with_offset(df: DataFrame, partition_by: Sequence[str], order_by: Sequence[Column | str], col: str, offset: int = 1) -> DataFrame:
    """lag/lead in one: negative offset = lag, positive = lead."""
    fn = F.lag(col, -offset) if offset < 0 else F.lead(col, offset)
    name = f"{'lag' if offset < 0 else 'lead'}_{col}"
    return df.withColumn(name, fn.over(_spec(partition_by, order_by)))


def running_agg(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column | str],
    agg_col: str,
    fn: str = "sum",
    preceding: int | None = None,
    out: str | None = None,
) -> DataFrame:
    """Running / moving aggregate with a rowsBetween frame.

    preceding=None → unbounded (running total); preceding=n → moving
    window of the last n+1 rows (moving average etc.).
    """
    fns = {"sum": F.sum, "avg": F.avg, "min": F.min, "max": F.max, "count": F.count}
    lo = Window.unboundedPreceding if preceding is None else -preceding
    w = _spec(partition_by, order_by).rowsBetween(lo, Window.currentRow)
    return df.withColumn(out or f"{fn}_{agg_col}_running", fns[fn](agg_col).over(w))


def groups_frame_agg(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: str,
    agg_exprs: dict[str, Column],
    preceding: int = 1,
    following: int = 1,
) -> DataFrame:
    """SQL-standard GROUPS window frame (…GROUPS BETWEEN n PRECEDING
    AND m FOLLOWING), which Spark's window exec does not implement —
    emulated exactly as a RANGE frame over dense_rank: peer rows (ties
    on the order key) share a dense_rank value, so a range of ±n over
    that rank is precisely a frame of ±n PEER GROUPS.

    Both windows share one (partition, order) spec, so the plan carries
    ONE shuffle and one sort — the dense_rank pass and the range-frame
    pass pipeline inside the same WindowExec chain. `agg_exprs` maps
    output name → aggregate over a column, e.g.
    {"s": F.sum("v"), "n": F.count(F.lit(1))}.

    Differential-tested against DuckDB computing the same semantics in
    tests/test_relational.py (this DuckDB build rejects native GROUPS
    too, so the oracle is its independent dense_rank+RANGE form).
    """
    w_rank = Window.partitionBy(*partition_by).orderBy(order_by)
    ranked = df.withColumn("_dr", F.dense_rank().over(w_rank))
    w_groups = (
        Window.partitionBy(*partition_by)
        .orderBy("_dr")
        .rangeBetween(-preceding, following)
    )
    out = ranked
    for name, expr in agg_exprs.items():
        out = out.withColumn(name, expr.over(w_groups))
    return out.drop("_dr")


def distributed_global_rank(
    df: DataFrame,
    value_col: str,
    id_col: str,
    ascending: bool = True,
    n_buckets: int = 1024,
    out: str = "rnk",
    percentile: str | None = None,
) -> DataFrame:
    """Exact global row_number over (value, id) WITHOUT the
    single-partition window Spark plans for an unpartitioned
    ``row_number().over(Window.orderBy(...))`` — the shape that
    silently serializes a 100 TB rank through one task.

    Two-phase (the packing/_prefix_sum family): rows bucket by
    fixed-width value ranges (monotone in the global order), per-bucket
    counts partial-aggregate to <= n_buckets rows, the driver computes
    the exclusive prefix over bucket counts (bounded work), and each
    bucket ranks its own rows in parallel with the bucket base added.
    Ties on value break by id, so the rank is total and deterministic
    on any cluster layout. Degenerate distributions (all values equal)
    fall back to id-range bucketing, which IS the order there.

    With ``percentile=<name>``, also emits (rank-1)/(n-1) — the exact
    percentile_rank, same semantics as F.percent_rank over the global
    window (0 for the first row, 1 for the last; 0.0 when n == 1).

    NULL values sort first when ascending (last when descending) —
    matching Spark's default NULL ordering — via a driver-checked
    sentinel bucket.
    """
    src = df.withColumn("__v", F.col(value_col).cast("double"))
    stats = src.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("__v").alias("lo"),
        F.max("__v").alias("hi"),
        F.min(id_col).alias("lo_i"),
        F.max(id_col).alias("hi_i"),
        F.sum(F.col("__v").isNull().cast("long")).alias("n_null"),
    ).collect()[0]
    if stats["n"] == 0:
        res = src.withColumn(out, F.lit(0).cast("long")).drop("__v").limit(0)
        if percentile:
            res = res.withColumn(percentile, F.lit(0.0))
        return res
    # NULLs: Spark orders them FIRST ascending / LAST descending.
    null_bkt = F.lit(-1) if ascending else F.lit(n_buckets)
    if stats["hi"] is not None and stats["hi"] > stats["lo"]:
        width = (stats["hi"] - stats["lo"]) / float(n_buckets)
        pos = (
            (F.col("__v") - F.lit(stats["lo"]))
            if ascending
            else (F.lit(stats["hi"]) - F.col("__v"))
        )
        val_bkt = F.least(
            F.floor(pos / F.lit(width)), F.lit(n_buckets - 1)
        ).cast("long")
    else:
        span = (stats["hi_i"] - stats["lo_i"]) + 1 if stats["hi_i"] is not None else 1
        width_i = max(1, -(-span // n_buckets))
        val_bkt = ((F.col(id_col) - F.lit(stats["lo_i"])) / F.lit(width_i)).cast("long")
    b = src.withColumn(
        "__bkt", F.when(F.col("__v").isNull(), null_bkt).otherwise(val_bkt)
    )
    totals = {
        r["__bkt"]: r["c"]
        for r in b.groupBy("__bkt").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    base, acc = {}, 0
    for kb in sorted(totals):
        base[kb] = acc
        acc += totals[kb]
    bases = df.sparkSession.createDataFrame(
        list(base.items()), "__bkt long, __base long"
    )
    order = (
        [F.col("__v").asc_nulls_first(), F.col(id_col).asc()]
        if ascending
        else [F.col("__v").desc_nulls_last(), F.col(id_col).asc()]
    )
    w = Window.partitionBy("__bkt").orderBy(*order)
    res = (
        b.join(F.broadcast(bases), "__bkt")
        .withColumn(out, (F.col("__base") + F.row_number().over(w)).cast("long"))
        .drop("__bkt", "__base", "__v")
    )
    if percentile:
        denom = max(stats["n"] - 1, 1)
        res = res.withColumn(
            percentile, (F.col(out) - 1) / F.lit(float(denom))
        )
    return res
