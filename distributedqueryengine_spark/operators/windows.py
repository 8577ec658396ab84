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


def _rank_segments(
    b: DataFrame,
    id_col: str,
    n_buckets: int,
    measure: Column | None,
    nulls_first: bool,
    heavy_factor: float = 4.0,
    min_heavy: int = 65536,
    max_rounds: int = 3,
    sub_cap: int = 4096,
) -> tuple[DataFrame, list[tuple[int, int, float]]]:
    """Skew-adaptive monotone segmentation for two-phase global ranks.

    Input: a frame with a ``__k`` double column (the rank key,
    ascending; NULLs allowed) and a unique, non-null ``id_col`` that
    breaks ties. Output: the frame with a ``__seg`` long column plus
    the ordered segment stats [(seg_id, row_count, measure_total)],
    where segment ids ascend in global (``__k`` asc, id asc) order and
    NULL keys occupy a dedicated first (``nulls_first``) or last
    segment. Downstream, a per-``__seg`` window plus a driver-side
    exclusive prefix over the stats yields an exact global rank /
    running total with NO single-partition exchange.

    Skew contract (closes the r13 tie-skew hole): fixed-width value
    buckets alone put every row tied on one dominant value into ONE
    bucket's window — the hot partition this machinery exists to
    avoid. So after the bucket-stats pass, any segment holding more
    than max(heavy_factor · n/n_buckets, min_heavy) rows is refined:

    * multi-valued heavy segments re-bucket by finer value ranges
      within their own [min, max] (monotone by construction);
    * single-valued (tied) and all-NULL heavy segments split by id
      boundaries drawn from a deterministic xxhash-sampled id sample
      (ties order by id, so id-boundary sub-segments stay monotone in
      the global order) — this works for ANY orderable id type, not
      just numerics, and balances even when ids cluster;

    repeated up to ``max_rounds`` times until nothing is heavy. Each
    round is one bounded-size aggregation (≤ #segments rows collected)
    plus, when tied segments exist, one ~2k-id-per-segment sample job;
    the uniform no-skew case stays at the original single stats pass.
    ``min_heavy`` (default 65,536) is an ABSOLUTE floor under which a
    segment is never refined: a one-task window over <64k (value, id)
    pairs is a few MB of sort — refinement jobs would cost more than
    they save at any cluster size, and fixture-scale corpora stay on
    the cheap two-job plan. The relative threshold dominates at scale
    (4·n/n_buckets passes the floor once n > ~16M with the default
    1024 buckets).
    Segment assignment is embedded as literals/broadcast params, so
    the counting pass and the final window see identical assignments,
    and the OUTPUT rank is invariant to where the boundaries land —
    sampling variance can only affect load balance, never values.

    Caller contract: ``id_col`` values must be unique and non-null
    (they are the tie-break), and ``__k`` must not contain NaN/±Inf
    (cast/filter upstream — IEEE specials break width arithmetic).
    """
    spark = b.sparkSession
    from distributedqueryengine_spark.functions.dedup import _scoped_persist

    m = measure if measure is not None else F.count(F.lit(1))
    stats = b.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("__k").alias("lo"),
        F.max("__k").alias("hi"),
    ).collect()[0]
    if stats["n"] == 0:
        return b.withColumn("__seg", F.lit(0).cast("long")), []
    null_seg = -1 if nulls_first else n_buckets
    if stats["hi"] is not None and stats["hi"] > stats["lo"]:
        width = (stats["hi"] - stats["lo"]) / float(n_buckets)
        vb = F.least(
            F.floor((F.col("__k") - F.lit(stats["lo"])) / F.lit(width)),
            F.lit(n_buckets - 1),
        ).cast("long")
    else:
        # all non-null keys equal (or all NULL): one value segment;
        # the refinement loop id-splits it if it is heavy — no id
        # arithmetic here, so non-numeric ids are fine (r13 ADVICE)
        vb = F.lit(0).cast("long")
    b = b.withColumn(
        "__seg", F.when(F.col("__k").isNull(), F.lit(null_seg)).otherwise(vb)
    )

    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    id_type = b.schema[id_col].dataType
    pschema = StructType(
        [
            StructField("__seg", LongType()),
            StructField("__nb", LongType()),
            StructField("__kind", IntegerType()),
            StructField("__lo", DoubleType()),
            StructField("__w", DoubleType()),
            StructField("__nsub", IntegerType()),
            StructField("__bnds", ArrayType(id_type)),
        ]
    )
    persisted = False
    for rnd in range(max_rounds + 1):
        segs = sorted(
            b.groupBy("__seg")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                m.alias("m"),
                F.min("__k").alias("lo"),
                F.max("__k").alias("hi"),
            )
            .collect(),
            key=lambda r: r["__seg"],
        )
        n = sum(r["cnt"] for r in segs)
        threshold = max(heavy_factor * n / float(n_buckets), float(min_heavy))
        heavy = {int(r["__seg"]) for r in segs if r["cnt"] > threshold}
        if not heavy or rnd == max_rounds:
            return b, [(int(r["__seg"]), int(r["cnt"]), r["m"]) for r in segs]
        if not persisted:
            # refinement adds jobs over the same rows — evaluate the
            # upstream lineage once (FIFO-bounded shared registry)
            b = _scoped_persist(b)
            persisted = True
        target = max(int(threshold // 2), 1)
        tied = [
            r
            for r in segs
            if int(r["__seg"]) in heavy
            and (r["lo"] is None or r["lo"] == r["hi"])
        ]
        bnds_by_seg: dict[int, list] = {}
        if tied:
            # deterministic ~2k-id sample per tied segment: boundary
            # choice only moves load, never values, but xxhash-mod
            # keeps even the balance reproducible across layouts
            mod_tbl = spark.createDataFrame(
                [(int(r["__seg"]), max(1, int(r["cnt"]) // 2000)) for r in tied],
                "__seg long, __mod long",
            )
            samp = (
                b.join(F.broadcast(mod_tbl), "__seg")
                .filter(F.pmod(F.xxhash64(F.col(id_col)), F.col("__mod")) == 0)
                .groupBy("__seg")
                .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
                .collect()
            )
            samp_ids = {int(r["__seg"]): list(r["ids"]) for r in samp}
            for r in tied:
                ids = samp_ids.get(int(r["__seg"]), [])
                k = min(-(-int(r["cnt"]) // target), sub_cap, len(ids) + 1)
                bnds: list = []
                for j in range(1, k):
                    cand = ids[(j * len(ids)) // k]
                    if not bnds or cand > bnds[-1]:
                        bnds.append(cand)
                bnds_by_seg[int(r["__seg"])] = bnds
        params, nxt = [], 0
        for r in segs:
            s = int(r["__seg"])
            if s not in heavy:
                params.append((s, nxt, 0, None, None, 1, None))
                nxt += 1
            elif r["lo"] is None or r["lo"] == r["hi"]:
                bnds = bnds_by_seg.get(s, [])
                params.append((s, nxt, 2, None, None, len(bnds) + 1, bnds))
                nxt += len(bnds) + 1
            else:
                k = min(-(-int(r["cnt"]) // target), sub_cap)
                wdt = (r["hi"] - r["lo"]) / float(k)
                params.append((s, nxt, 1, float(r["lo"]), wdt, k, None))
                nxt += k
        ptbl = spark.createDataFrame(params, pschema)
        sub = (
            F.when(
                F.col("__kind") == 1,
                F.least(
                    F.floor((F.col("__k") - F.col("__lo")) / F.col("__w")),
                    (F.col("__nsub") - 1).cast("long"),
                ),
            )
            .when(
                F.col("__kind") == 2,
                F.aggregate(
                    F.col("__bnds"),
                    F.lit(0),
                    lambda acc, x: acc
                    + F.when(F.col(id_col) > x, 1).otherwise(0),
                ).cast("long"),
            )
            .otherwise(F.lit(0))
            .cast("long")
        )
        b = (
            b.join(F.broadcast(ptbl), "__seg")
            .withColumn("__seg2", F.col("__nb") + sub)
            .drop("__seg", "__nb", "__kind", "__lo", "__w", "__nsub", "__bnds")
            .withColumnRenamed("__seg2", "__seg")
        )
    raise AssertionError("unreachable")  # pragma: no cover


def distributed_global_rank(
    df: DataFrame,
    value_col: str,
    id_col: str,
    ascending: bool = True,
    n_buckets: int = 1024,
    out: str = "rnk",
    percentile: str | None = None,
    nulls_first: bool | None = None,
    min_heavy: int = 65536,
) -> DataFrame:
    """Exact global row_number over (value, id) WITHOUT the
    single-partition window Spark plans for an unpartitioned
    ``row_number().over(Window.orderBy(...))`` — the shape that
    silently serializes a 100 TB rank through one task.

    Two-phase (the packing/_prefix_sum family), skew-adaptive: rows
    segment monotonically in the global order via
    :func:`_rank_segments` (fixed-width value ranges, with heavy
    segments refined by finer value ranges and tied/all-NULL heavy
    segments split at sampled id boundaries — so a corpus where one
    value holds 90% of the rows still ranks through balanced
    parallel windows, not one hot partition). Per-segment counts
    partial-aggregate to a driver-bounded table, the driver computes
    the exclusive prefix, and each segment ranks its own rows in
    parallel with the segment base added. Ties on value break by id
    asc (both directions), so the rank is total and deterministic on
    any cluster layout AND invariant to where segment boundaries land.

    With ``percentile=<name>``, also emits (rank-1)/(n-1) — the exact
    percentile_rank, same semantics as F.percent_rank over the global
    window (0 for the first row, 1 for the last; 0.0 when n == 1).

    NULL ordering: by default NULLs sort first when ascending / last
    when descending (Spark's default); pass ``nulls_first=True/False``
    to force either placement (e.g. Spark's ``asc_nulls_last``).
    ``n_buckets`` (default 1024) is the TARGET parallelism of the
    rank stage — segments stay within ~max(4·n/n_buckets, min_heavy)
    rows after refinement; raise it for wider clusters. ``min_heavy``
    is the absolute never-refine floor (see :func:`_rank_segments`).

    Caller contract: ``id_col`` unique + non-null; ``value_col`` must
    not contain NaN/±Inf (filter or remap upstream — IEEE specials
    poison range arithmetic in ANY bucketing scheme).
    """
    if nulls_first is None:
        nulls_first = ascending
    src = df.withColumn("__v", F.col(value_col).cast("double"))
    ksrc = src.withColumn(
        "__k", F.col("__v") if ascending else -F.col("__v")
    )
    b, segs = _rank_segments(
        ksrc, id_col, n_buckets, None, nulls_first, min_heavy=min_heavy
    )
    if not segs:
        res = src.withColumn(out, F.lit(0).cast("long")).drop("__v").limit(0)
        if percentile:
            res = res.withColumn(percentile, F.lit(0.0))
        return res
    n = sum(c for _, c, _ in segs)
    base_rows, acc = [], 0
    for seg_id, cnt, _ in segs:
        base_rows.append((seg_id, acc))
        acc += cnt
    bases = df.sparkSession.createDataFrame(
        base_rows, "__seg long, __base long"
    )
    w = Window.partitionBy("__seg").orderBy(
        F.col("__k").asc_nulls_first(), F.col(id_col).asc()
    )
    res = (
        b.join(F.broadcast(bases), "__seg")
        .withColumn(out, (F.col("__base") + F.row_number().over(w)).cast("long"))
        .drop("__seg", "__base", "__v", "__k")
    )
    if percentile:
        denom = max(n - 1, 1)
        res = res.withColumn(
            percentile, (F.col(out) - 1) / F.lit(float(denom))
        )
    return res
