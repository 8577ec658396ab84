"""Relational core: scan/select/project/join/union — the reference's algebra.

The reference's closed operator enum is JOIN/SEL/PROJ/UNION/LEAF
(reference RPC/RPC/RPC.cs:20-28). Each maps to one declarative
DataFrame call here, which Catalyst then optimizes exactly the way the
reference's two heuristic passes intended (selection pushdown
QueryService.asmx.cs:604-640, projection pushdown :534-603) — but
cost-based, through views, and with partition pruning.

Scale notes:
- `select_where` filters/projections reach the parquet scan
  (PushedFilters / ReadSchema in explain); at 100 TB this is the
  difference between reading a column subset of a partition subset and
  reading everything.
- Joins go through Catalyst's strategy choice (broadcast / shuffled
  hash / sort-merge) + AQE; `join_tables` exposes an explicit
  `broadcast_right` for dimension joins so the plan never shuffles the
  fact side on a small-dim join.
- UNION ALL is a no-shuffle concatenation of partition lists, unlike
  the reference's sequential whole-result pulls (RPC.cs:197-208).
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

JOIN_TYPES = (
    "inner",
    "left",
    "right",
    "full",
    "left_semi",
    "left_anti",
    "cross",
)


def select_where(df: DataFrame, columns: Sequence[str] | None = None, predicate: str | Column | None = None) -> DataFrame:
    """LEAF scan + SEL + PROJ in one declarative chain.

    The reference built ``select {cols} from {tab} where {cond}`` strings
    for per-site MySQL (RPC.cs:311-329); here the same pushdown falls out
    of Catalyst: the filter and column list land in the parquet scan.
    Unlike the reference's projection (substring column matching,
    RPC.cs:368) this resolves columns exactly, and unlike its SEL
    (RPC.cs:343-356, filters the wrong table) it is correct.
    """
    out = df
    if predicate is not None:
        out = out.filter(F.expr(predicate) if isinstance(predicate, str) else predicate)
    if columns:
        out = out.select(*columns)
    return out


def join_tables(
    left: DataFrame,
    right: DataFrame,
    on: Column | Sequence[str],
    how: str = "inner",
    broadcast_right: bool = False,
) -> DataFrame:
    """Equi/theta join with the full join-type lattice.

    The reference supports exactly one shape: single-key inner equi-join
    via a LINQ hash join (RPC.cs:248-310). Spark generalizes: any
    boolean condition, all outer/semi/anti types, and automatic
    broadcast/shuffled-hash/sort-merge selection. `broadcast_right=True`
    pins the broadcast-hash strategy for small dimension tables so the
    big side is never shuffled — the scale-critical choice at 100 TB.
    """
    if how not in JOIN_TYPES:
        raise ValueError(f"join type {how!r} not in {JOIN_TYPES}")
    r = F.broadcast(right) if broadcast_right else right
    if how == "cross":
        return left.crossJoin(r)
    return left.join(r, on=on, how=how)


def union_all(dfs: Sequence[DataFrame]) -> DataFrame:
    """N-ary UNION ALL by column name (bag semantics).

    Mirrors the reference's fragment reassembly (DataTable.Merge,
    RPC.cs:330-342) — duplicates preserved. unionByName is positional-
    safe, and in the physical plan it is a zero-shuffle concatenation of
    the children's partitions.
    """
    if not dfs:
        raise ValueError("union_all needs at least one input")
    return reduce(lambda a, b: a.unionByName(b), dfs)


def set_op(left: DataFrame, right: DataFrame, op: str) -> DataFrame:
    """Set operators beyond the reference's UNION ALL.

    `intersect`/`except_` are set semantics (deduplicating), `*_all`
    keep multiplicity; `distinct` is a full-row dedup. All compile to
    hash aggregates / joins with partial (map-side) combining.
    """
    ops = {
        "union": lambda: left.unionByName(right).distinct(),
        "union_all": lambda: left.unionByName(right),
        "intersect": lambda: left.intersect(right),
        "intersect_all": lambda: left.intersectAll(right),
        "except": lambda: left.subtract(right),
        "except_all": lambda: left.exceptAll(right),
    }
    if op not in ops:
        raise ValueError(f"set op {op!r} not in {sorted(ops)}")
    return ops[op]()


def assign_dense_ids(
    df,
    order_col: str,
    tiebreak=(),
    start: int = 0,
    rows_per_bucket: int = 1 << 20,
):
    """Append a gap-free `dense_id` column (`start`, `start`+1, …) in
    ascending (`order_col`, tiebreak...) order — the surrogate-key
    assignment a dimension build needs, where
    monotonically_increasing_id's partition-gapped ids don't do.

    Scale shape: NO global single-partition sort (the naive
    row_number() over a global Window). The numeric `order_col` is cut
    into fixed-width buckets (deterministic, unlike
    repartitionByRange's sampled boundaries), per-bucket counts make a
    driver-side exclusive cumsum (G scalars, never data), and each
    bucket numbers its rows independently with a PARTITIONED window —
    the same two-phase prefix-sum discipline as packing's layout.
    `order_col` must be numeric; rows tie-broken by `tiebreak` (make
    (order, tiebreak) unique for fully deterministic ids)."""
    import math as _math

    from pyspark.sql.window import Window as _W

    dt = dict(df.dtypes)[order_col]
    if dt in ("string", "binary", "boolean"):
        raise ValueError(
            f"order_col must be numeric/temporal for deterministic "
            f"bucketing, got {dt}; derive a numeric sort key first"
        )
    key = F.col(order_col).cast("double")
    stats = df.agg(
        F.count(F.lit(1)).alias("n"), F.min(key).alias("lo"), F.max(key).alias("hi")
    ).collect()[0]
    if not stats["n"]:
        return df.withColumn("dense_id", F.lit(None).cast("long"))
    n_buckets = max(1, _math.ceil(stats["n"] / rows_per_bucket))
    width = max((stats["hi"] - stats["lo"]) / n_buckets, 1e-12)
    bkt = F.least(
        F.floor((key - F.lit(stats["lo"])) / F.lit(width)),
        F.lit(n_buckets - 1),  # hi endpoint closes into the last bucket
    ).cast("long")
    b = df.withColumn("__bkt", bkt)
    totals = {
        r["__bkt"]: r["c"]
        for r in b.groupBy("__bkt").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    base, acc = {}, start
    for k in sorted(totals):
        base[k] = acc
        acc += totals[k]
    bases = df.sparkSession.createDataFrame(
        [(k, v) for k, v in base.items()], "__bkt long, __base long"
    )
    order = [F.col(order_col).asc()] + [F.col(c).asc() for c in tiebreak]
    w = _W.partitionBy("__bkt").orderBy(*order)
    return (
        b.join(F.broadcast(bases), "__bkt")
        .withColumn(
            "dense_id", (F.col("__base") + F.row_number().over(w) - 1).cast("long")
        )
        .drop("__bkt", "__base")
    )
