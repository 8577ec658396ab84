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
