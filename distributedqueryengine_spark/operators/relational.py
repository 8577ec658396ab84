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


def _split_proxy(df, col: str, offset: int = 1):
    """Order-preserving double proxy of a column, used ONLY to cut
    skew-split sub-bucket boundaries (never for the final within-bucket
    ordering, which uses the real columns): numerics/temporals cast to
    double; strings/binaries map 6 bytes starting at `offset` to a
    right-zero-padded 48-bit integer (binary-collation order, exact in
    a double's 53-bit mantissa; the padding keeps short remainders
    ordered against long ones). Equal proxies merely mean "same
    sub-bucket" — ordering inside a sub-bucket is still exact — so
    prefix collisions cost balance, never correctness. Returns None
    for non-proxyable types (arrays/structs), which simply can't serve
    as split levels."""
    dt = dict(df.dtypes)[col]
    if dt in ("string", "binary"):
        raw = F.col(col) if dt == "binary" else F.col(col).cast("binary")
        return F.conv(
            F.rpad(F.hex(F.substring(raw, offset, 6)), 12, "0"), 16, 10
        ).cast("double")
    if dt == "date":
        return F.col(col).cast("timestamp").cast("double")
    if dt.startswith(("array", "map", "struct")):
        return None
    return F.col(col).cast("double")


def _prefix_int(b: bytes, offset0: int) -> float:
    """Python mirror of the string split proxy at 0-based byte offset."""
    return float(int.from_bytes(b[offset0 : offset0 + 6].ljust(6, b"\x00"), "big"))


def assign_dense_ids(
    df,
    order_col: str,
    tiebreak=(),
    start: int = 0,
    rows_per_bucket: int = 1 << 20,
    on_null: str = "error",
    max_split_rounds: int = 5,
    stats_out: dict | None = None,
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

    Skew defense: a SATURATED bucket (> 2×rows_per_bucket rows — e.g.
    90% of a column holding one value would land in one bucket and
    degrade into exactly the single-task global sort this operator
    exists to avoid) is split iteratively, ≤ `max_split_rounds` rounds
    of one counting aggregate each. Each round re-slices saturated
    buckets equal-width on the first sort level that still
    discriminates inside that bucket (`order_col`, then each
    `tiebreak` column via an order-preserving proxy, strings by binary
    prefix), so cross-bucket ordering stays exact; rows tied on EVERY
    sort column fall through to a whole-row-hash split, which is valid
    because ids among full ties are unspecified by contract. Residual
    saturation (identical duplicate rows beyond the cap) is reported,
    not hidden.

    `order_col` must be numeric/temporal; rows tie-broken by
    `tiebreak` (make (order, tiebreak) unique for fully deterministic
    ids). NULL (and floating-point NaN) `order_col` rows:
    `on_null='error'` (default) raises; `on_null='last'` routes them
    after every non-NULL row (NULLs before NaNs), ordered by
    `tiebreak`. Pass `stats_out={}` to receive
    {n_buckets, max_bucket_rows, split_rounds, residual_saturated}."""
    import math as _math

    from pyspark.sql.window import Window as _W

    dt = dict(df.dtypes)[order_col]
    if dt in ("string", "binary", "boolean"):
        raise ValueError(
            f"order_col must be numeric/temporal for deterministic "
            f"bucketing, got {dt}; derive a numeric sort key first"
        )
    if on_null not in ("error", "last"):
        raise ValueError(f"on_null must be 'error' or 'last', got {on_null!r}")
    key = F.col(order_col).cast("double")
    # NaN is not NULL: floor((NaN-lo)/width) would cast to a NULL bucket
    # key and poison the driver cumsum. Route NaN with the NULL path —
    # Spark's asc sort places NULL first and NaN last, both land in the
    # trailing '~null' bucket under on_null='last' and the NULL/NaN
    # boundary itself is a valid split level inside it.
    missing = key.isNull() | F.isnan(key)
    stats = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(missing.cast("long")).alias("nulls"),
        F.min(F.when(~missing, key)).alias("lo"),
        F.max(F.when(~missing, key)).alias("hi"),
    ).collect()[0]
    if not stats["n"]:
        if stats_out is not None:
            stats_out.update(
                n_buckets=0, max_bucket_rows=0, split_rounds=0,
                residual_saturated=0,
            )
        return df.withColumn("dense_id", F.lit(None).cast("long"))
    n_nulls = int(stats["nulls"] or 0)
    if n_nulls and on_null == "error":
        raise ValueError(
            f"order_col {order_col!r} has {n_nulls} NULL/NaN rows; pass "
            "on_null='last' to place them after all non-NULL rows"
        )
    n_nonnull = int(stats["n"]) - n_nulls

    # Sort levels for skew-splitting: order, tiebreaks, whole-row hash.
    # Each level carries (real column for the varies-decision, proxy for
    # slicing, dtype). The hash level is reached only when every real
    # level is constant inside the bucket — ids among full ties are
    # unspecified by contract, so an arbitrary balanced split is valid.
    level_cols = [order_col, *tiebreak]
    types = dict(df.dtypes)
    levels = []
    for c in level_cols:
        px = _split_proxy(df, c)
        if px is None:
            raise ValueError(
                f"tiebreak column {c!r} has a complex type unusable "
                "as a skew-split level; use a scalar tiebreak"
            )
        levels.append((F.col(c), px, types[c]))
    hashable = [c for c, t in df.dtypes if not t.startswith("map")]
    hash_col = (
        F.hash(*[F.col(c) for c in hashable]).cast("double")
        if hashable
        else F.lit(0.0)
    )
    levels.append((hash_col, hash_col, "double"))

    # Root buckets: fixed-width cut of order_col; NULLs (on_null='last')
    # go to a dedicated '~null' bucket that sorts after every numeric
    # path and starts splitting at the first tiebreak level.
    pad = 12
    if n_nonnull:
        n_buckets = max(1, _math.ceil(n_nonnull / rows_per_bucket))
        width = max((stats["hi"] - stats["lo"]) / n_buckets, 1e-12)
        root_idx = F.least(
            F.floor((key - F.lit(stats["lo"])) / F.lit(width)),
            F.lit(n_buckets - 1),  # hi endpoint closes into the last bucket
        ).cast("long")
        root = F.lpad(root_idx.cast("string"), pad, "0")
    else:
        root = F.lit(None).cast("string")
    if n_nulls:
        root = F.when(missing, F.lit("~null")).otherwise(root)
    b = df.withColumn("__bkt", root)

    saturation = 2 * rows_per_bucket
    totals: dict[str, int] = {}
    rounds_used, residual = 0, 0
    for _round in range(max_split_rounds + 1):
        totals = {
            r["__bkt"]: r["c"]
            for r in b.groupBy("__bkt").agg(F.count(F.lit(1)).alias("c")).collect()
        }
        sat = {p: c for p, c in totals.items() if c > saturation}
        if not sat or _round == max_split_rounds:
            residual = len(sat)
            break
        rounds_used += 1
        # One aggregate over the saturated buckets: per-bucket REAL
        # min/max (varies-decision + string prefix bounds), PROXY
        # min/max (numeric slice bounds), and a has-null flag per level
        # — a handful of scalar exprs, G rows back, never data.
        aggs = []
        for i, (real, px, _t) in enumerate(levels):
            aggs += [
                F.min(real).alias(f"rlo{i}"),
                F.max(real).alias(f"rhi{i}"),
                F.min(px).alias(f"plo{i}"),
                F.max(px).alias(f"phi{i}"),
                F.max(real.isNull().cast("int")).alias(f"nul{i}"),
            ]
        mm = {
            r["__bkt"]: r
            for r in b.filter(F.col("__bkt").isin(*sat))
            .groupBy("__bkt")
            .agg(*aggs)
            .collect()
        }
        expr = F.col("__bkt")
        made_split = False
        for p, cnt in sorted(sat.items()):
            r = mm[p]
            split_col, split_real, plo, phi = None, None, None, None
            for i, (real, px, t) in enumerate(levels):
                rlo, rhi = r[f"rlo{i}"], r[f"rhi{i}"]
                has_null = bool(r[f"nul{i}"])
                if rlo is None:  # all NULL at this level: constant, next
                    continue
                mixed = has_null  # some NULL, some not: level varies
                if isinstance(rlo, (bytes, bytearray)):
                    rlo, rhi = bytes(rlo), bytes(rhi)
                if not mixed and not (rhi > rlo):
                    continue  # constant at this level: next
                # This is the FIRST level that varies inside the bucket
                # — splitting any later level would break ordering.
                split_real = real
                if t in ("string", "binary"):
                    lo_b = rlo if isinstance(rlo, bytes) else str(rlo).encode()
                    hi_b = rhi if isinstance(rhi, bytes) else str(rhi).encode()
                    cpl = 0
                    while cpl < min(len(lo_b), len(hi_b)) and lo_b[cpl] == hi_b[cpl]:
                        cpl += 1
                    split_col = _split_proxy(df, level_cols[i], offset=cpl + 1)
                    plo, phi = _prefix_int(lo_b, cpl), _prefix_int(hi_b, cpl)
                else:
                    split_col = px
                    plo, phi = (
                        (float(r[f"plo{i}"]), float(r[f"phi{i}"]))
                        if r[f"plo{i}"] is not None
                        else (0.0, 0.0)
                    )
                if not mixed and not (phi > plo):
                    # real values differ but the proxy cannot see it
                    # (sub-ULP numeric range): refuse to split — a
                    # wrong split would mis-order; counted as residual.
                    split_col = None
                break
            if split_col is None:
                continue  # complete duplicate ties / unsliceable: residual
            n_sub = max(2, min(_math.ceil(cnt / rows_per_bucket), 100_000))
            if phi > plo:
                # Boundary-ATOM isolation (r10, found by the 90%-skew
                # probe): a heavy atom sitting AT the bucket's min/max
                # value stays in one equal-width slice every round, so
                # rounds get consumed shaving the tail off it and never
                # reach the tiebreak levels (5 rounds, still 90k-row
                # residual on the planted probe). Giving the lo/hi
                # atoms their own sub-buckets makes that sub-bucket
                # CONSTANT at this level next round, which escalates it
                # to the next sort level immediately — guaranteed
                # progress: each round isolates atoms or halves range.
                # Ordering stays exact: lo-atom < interior < hi-atom.
                w_sub = max((phi - plo) / n_sub, 1e-12)
                interior = 2 + F.least(
                    F.floor((split_col - F.lit(plo)) / F.lit(w_sub)),
                    F.lit(n_sub - 1),
                ).cast("long")
                nonnull_sub = (
                    F.when(split_col == F.lit(plo), F.lit(1))
                    .when(split_col == F.lit(phi), F.lit(n_sub + 2))
                    .otherwise(interior)
                )
            else:  # only the NULL/non-NULL boundary discriminates
                nonnull_sub = F.lit(1)
            # NULL real sorts FIRST (Spark asc default) -> sub-index 0
            sub = F.when(split_real.isNull(), F.lit(0)).otherwise(nonnull_sub)
            child = F.concat(
                F.lit(p + "/"), F.lpad(sub.cast("string"), pad, "0")
            )
            expr = F.when(F.col("__bkt") == p, child).otherwise(expr)
            made_split = True
        if not made_split:
            residual = len(sat)
            break
        b = b.withColumn("__bkt", expr)

    if stats_out is not None:
        stats_out.update(
            n_buckets=len(totals),
            max_bucket_rows=max(totals.values()),
            split_rounds=rounds_used,
            residual_saturated=residual,
        )

    base, acc = {}, start
    for k in sorted(totals):
        base[k] = acc
        acc += totals[k]
    bases = df.sparkSession.createDataFrame(
        [(k, v) for k, v in base.items()], "__bkt string, __base long"
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
