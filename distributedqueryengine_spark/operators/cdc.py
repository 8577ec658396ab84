"""Change-data-capture shapes: SCD2 dimension builds and change
compaction.

The reference engine has no temporal-dimension support (closed operator
enum RPC.cs:20-28); these are the standard warehouse patterns a user of
any analytics engine reaches for when change streams land in a lake:

- `compact_changes`: drop change rows whose tracked attributes are
  unchanged vs the key's previous row (no-op updates — the bulk of many
  CDC feeds).
- `scd2_from_changes`: turn a change log into a type-2
  slowly-changing dimension: one row per (key, version) with
  [valid_from, valid_to) and is_current.

Scale design: both are ONE window shuffle on the natural key — the
partition column a dimension's change log is already distributed by.
No self-joins, no collects; ties on the change timestamp are broken by
an explicit tiebreaker column so results are deterministic under
at-least-once CDC delivery.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _ordered(ts_col: str, tiebreak: Sequence[str]) -> list[Column]:
    return [F.col(ts_col).asc()] + [F.col(c).asc() for c in tiebreak]


def compact_changes(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Keep only rows that CHANGE at least one tracked attribute vs the
    key's chronologically previous row (the first row per key always
    survives). NULL-safe: NULL→value and value→NULL both count as
    changes; NULL→NULL does not (eqNullSafe per attribute)."""
    w = Window.partitionBy(*key_cols).orderBy(*_ordered(ts_col, tiebreak))
    same = F.lit(True)
    for a in attr_cols:
        same = same & F.col(a).eqNullSafe(F.lag(a).over(w))
    is_first = F.row_number().over(w) == 1
    return (
        df.withColumn("__keep", is_first | ~same)
        .filter(F.col("__keep"))
        .drop("__keep")
    )


def scd2_from_changes(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
    tiebreak: Sequence[str] = (),
    compact: bool = True,
) -> DataFrame:
    """Type-2 dimension from a change log: per (key, change) emit
    key_cols + attr_cols + valid_from / valid_to / is_current /
    version, where valid_to is the NEXT change's timestamp (NULL on
    the open current row) — half-open [valid_from, valid_to)
    intervals, the convention that makes point-in-time lookups a
    simple `valid_from <= t AND (valid_to IS NULL OR t < valid_to)`
    range predicate (and pairs with operators/asof.py for as-of
    joins against the built dimension).

    `compact=True` first drops no-op updates so consecutive versions
    always differ in at least one tracked attribute."""
    src = (
        compact_changes(df, key_cols, ts_col, attr_cols, tiebreak)
        if compact
        else df
    )
    w = Window.partitionBy(*key_cols).orderBy(*_ordered(ts_col, tiebreak))
    return src.select(
        *key_cols,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w).alias("valid_to"),
        F.lead(ts_col).over(w).isNull().alias("is_current"),
        F.row_number().over(w).cast("int").alias("version"),
    )


def snapshot_at(
    dim: DataFrame, at: Column | str, ts_type: str = "timestamp"
) -> DataFrame:
    """Point-in-time slice of an SCD2 dimension built above: the rows
    whose validity interval contains `at`. A literal string is cast to
    `ts_type`; partition-prune-friendly (two range predicates, no
    window)."""
    t = F.lit(at).cast(ts_type) if isinstance(at, str) else at
    return dim.filter(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (t < F.col("valid_to")))
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Change feed between two snapshots of the same table: one row per
    differing key with op ∈ {insert, delete, update} — the reverse of
    scd2_from_changes (which consumes a change feed), and the tool for
    regression-diffing pipeline outputs ('what changed between
    yesterday's build and today's?').

    Full outer join on the keys; `compare_cols` (default: every
    non-key column present in BOTH frames) decide update-ness with
    NULL-safe equality. Unchanged keys are dropped — the diff is
    |changes|-sized, not table-sized. Output: key_cols + op + two
    structs (before, after; NULL on insert/delete respectively)."""
    keys = list(key_cols)
    if not keys:
        raise ValueError("key_cols must name the diff key")
    if compare_cols is None:
        compare_cols = [
            c for c in old.columns if c in set(new.columns) and c not in keys
        ]
    cmp_cols = list(compare_cols)
    o = old.select(*keys, F.struct(*cmp_cols).alias("before")).alias("o")
    n = new.select(*keys, F.struct(*cmp_cols).alias("after")).alias("n")
    cond = None
    for k in keys:
        e = F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}"))
        cond = e if cond is None else (cond & e)
    joined = o.join(n, cond, "full")
    in_old = F.col("o.before").isNotNull() | F.col(f"o.{keys[0]}").isNotNull()
    in_new = F.col("n.after").isNotNull() | F.col(f"n.{keys[0]}").isNotNull()
    op = (
        F.when(~in_old, F.lit("insert"))
        .when(~in_new, F.lit("delete"))
        .when(~F.col("o.before").eqNullSafe(F.col("n.after")), F.lit("update"))
    )
    return (
        joined.withColumn("op", op)
        .filter(F.col("op").isNotNull())
        .select(
            *[F.coalesce(F.col(f"o.{k}"), F.col(f"n.{k}")).alias(k) for k in keys],
            "op",
            F.when(in_old, F.col("o.before")).alias("before"),
            F.when(in_new, F.col("n.after")).alias("after"),
        )
    )
