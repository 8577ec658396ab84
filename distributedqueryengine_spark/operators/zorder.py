"""Z-order (Morton) clustering for multi-column data skipping.

A sorted write gives parquet min/max file statistics that prune reads
on the SORT column only; filtering on any other column still scans
every file. Interleaving the bits of several columns into one Morton
key and range-partitioning the write on it bounds EVERY participating
column's span per file — the layout trick behind Delta/Iceberg
OPTIMIZE ZORDER BY, reproduced here with plain DataFrame expressions
so it works on vanilla parquet.

Shape: one tiny global min/max aggregate (broadcast as a 1-row cross
join), per-row normalization to `bits`-wide integers, a pure-JVM
bit-interleave expression (bits x n_cols shift/or terms inside
whole-stage codegen), then repartitionByRange + sortWithinPartitions
on the key — exactly one range shuffle, the same cost as any sorted
write. No UDFs, no collects beyond the 1-row stats frame Spark
broadcasts itself.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _normalized(col: str, bits: int) -> Column:
    """Min/max-scale `col` to an integer in [0, 2^bits): rank-free
    normalization using the broadcast global stats columns
    __min_<col>/__max_<col> attached by zorder_key."""
    lo = F.col(f"__min_{col}").cast("double")
    hi = F.col(f"__max_{col}").cast("double")
    x = F.col(col).cast("double")
    span = F.when(hi > lo, hi - lo).otherwise(F.lit(1.0))
    scaled = ((x - lo) / span) * F.lit(float((1 << bits) - 1))
    return F.coalesce(
        F.least(F.greatest(F.round(scaled, 0).cast("long"), F.lit(0)),
                F.lit((1 << bits) - 1)),
        F.lit(0),  # NULLs sort to the origin cell
    )


def zorder_key(df: DataFrame, cols: Sequence[str], bits: int = 8) -> DataFrame:
    """Attach `__zorder` — the Morton interleave of `cols` (numeric),
    `bits` bits each. bits * len(cols) must fit a signed long."""
    if not cols or len(cols) < 2:
        raise ValueError("z-ordering needs >= 2 columns (sort handles 1)")
    if bits <= 0 or bits * len(cols) > 62:
        raise ValueError(
            f"bits={bits} x {len(cols)} cols must be in (0, 62] total"
        )
    stats = df.agg(
        *[F.min(c).alias(f"__min_{c}") for c in cols],
        *[F.max(c).alias(f"__max_{c}") for c in cols],
    )
    with_stats = df.crossJoin(F.broadcast(stats))
    norms = {c: _normalized(c, bits) for c in cols}
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(norms[c], b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * len(cols) + i))
    return with_stats.withColumn("__zorder", z).drop(
        *[f"__min_{c}" for c in cols], *[f"__max_{c}" for c in cols]
    )


def zorder_repartition(
    df: DataFrame, cols: Sequence[str], num_partitions: int, bits: int = 8
) -> DataFrame:
    """Range-partition + sort the frame by its Morton key — the layout
    to `.write.parquet()` for multi-column skipping. Each output file's
    min/max stats then bound every z-ordered column, so a filter on ANY
    of them prunes files; a plain sort gives that for the first column
    only (test_zorder pins the span ratio)."""
    keyed = zorder_key(df, cols, bits)
    return keyed.repartitionByRange(num_partitions, "__zorder").sortWithinPartitions(
        "__zorder"
    ).drop("__zorder")
