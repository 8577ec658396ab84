"""Data-quality expectations: declarative checks, one scan, one report.

The dbt-test / Great-Expectations pattern sized for 100 TB: every
row-level check compiles to a boolean Column, ALL of them evaluate in
ONE aggregate pass over the table (a failing-row count per check), and
only the handful of table-level checks that need their own shape
(uniqueness, referential integrity) run as separate small plans.
Nothing collects rows to the driver; the report is one row per check.

Checks:
- not_null(col)
- accepted_values(col, values)         NULLs don't fail it (compose
                                       with not_null to forbid them)
- in_range(col, lo, hi)                inclusive bounds, NULLs pass
- matches(col, regex)                  NULLs pass
- expression(name, bool_column)        escape hatch, any row predicate
- unique(cols...)                      table-level: duplicate KEY count
- references(cols, other_df, other_cols)  table-level: orphan rows
                                       (NULL keys skip, SQL FK style)

`run_expectations` returns a DataFrame:
(check, kind, n_failed, n_checked, passed).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    name: str
    kind: str
    # row-level: a Column that is TRUE when the row VIOLATES the check
    violation: Column | None = None
    # table-level payload
    cols: tuple = ()
    other: object = None
    other_cols: tuple = ()


def not_null(col: str) -> Check:
    return Check(f"not_null({col})", "row", F.col(col).isNull())


def accepted_values(col: str, values: Sequence) -> Check:
    return Check(
        f"accepted_values({col})",
        "row",
        F.col(col).isNotNull() & ~F.col(col).isin(*values),
    )


def in_range(col: str, lo, hi) -> Check:
    return Check(
        f"in_range({col},{lo},{hi})",
        "row",
        F.col(col).isNotNull() & ~F.col(col).between(lo, hi),
    )


def matches(col: str, pattern: str) -> Check:
    return Check(
        f"matches({col})",
        "row",
        F.col(col).isNotNull() & ~F.col(col).rlike(pattern),
    )


def expression(name: str, predicate: Column) -> Check:
    """predicate TRUE = row passes (the natural authoring direction)."""
    return Check(f"expression({name})", "row", ~F.coalesce(predicate, F.lit(False)))


def unique(*cols: str) -> Check:
    return Check(f"unique({','.join(cols)})", "unique", None, tuple(cols))


def references(
    cols: Sequence[str], other: DataFrame, other_cols: Sequence[str]
) -> Check:
    return Check(
        f"references({','.join(cols)})",
        "references",
        None,
        tuple(cols),
        other,
        tuple(other_cols),
    )


def run_expectations(df: DataFrame, checks: Sequence[Check]) -> DataFrame:
    """Evaluate all checks; see module docstring for the report schema.
    Row-level checks share ONE aggregate scan regardless of count."""
    spark = df.sparkSession
    results: list[tuple] = []

    row_checks = [c for c in checks if c.kind == "row"]
    if row_checks:
        aggs = [F.count(F.lit(1)).alias("__n")]
        for i, c in enumerate(row_checks):
            aggs.append(F.sum(c.violation.cast("long")).alias(f"__f{i}"))
        row = df.agg(*aggs).first()
        n = row["__n"]
        for i, c in enumerate(row_checks):
            failed = row[f"__f{i}"] or 0
            results.append((c.name, c.kind, failed, n, failed == 0))

    for c in checks:
        if c.kind == "unique":
            dupes = (
                df.groupBy(*c.cols)
                .agg(F.count(F.lit(1)).alias("__n"))
                .filter(F.col("__n") > 1)
            )
            agg = dupes.agg(
                F.count(F.lit(1)).alias("k"), F.sum("__n").alias("r")
            ).first()
            n_dup_keys = agg["k"] or 0
            results.append(
                (c.name, c.kind, n_dup_keys, df.count(), n_dup_keys == 0)
            )
        elif c.kind == "references":
            keyed = df.select(*c.cols).na.drop()
            parents = c.other.select(
                *[F.col(oc).alias(cc) for oc, cc in zip(c.other_cols, c.cols)]
            ).distinct()
            orphans = keyed.join(parents, list(c.cols), "left_anti").count()
            results.append((c.name, c.kind, orphans, keyed.count(), orphans == 0))

    return spark.createDataFrame(
        results,
        "check string, kind string, n_failed long, n_checked long, passed boolean",
    )
