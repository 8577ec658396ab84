"""Table profiling: per-column statistics in ONE scan.

The ANALYZE-style summary an engine needs before planning work on an
unfamiliar dataset: row count, null rate, approximate NDV, min/max,
and for string columns length stats. Everything is computed as one
wide aggregate over a single pass — profiling a 100 TB table costs one
scan, not one scan per column — then the driver-side pivot to
one-row-per-column output happens on the already-tiny 1-row result.

approx_count_distinct (HLL++, rsd 2%) keeps NDV partial-aggregatable;
exact NDV per column would be one expensive expand per column. min/max
are rendered to strings so heterogeneous column types fit one output
schema (the profile is for humans and planners, not arithmetic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, rsd: float = 0.02) -> DataFrame:
    """One row per column: (column, dtype, n_rows, n_nulls, null_rate,
    approx_ndv, min, max, avg_len — strings only)."""
    cols = df.dtypes
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c, t in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls_{c}"))
        aggs.append(F.approx_count_distinct(c, rsd=rsd).alias(f"__ndv_{c}"))
        if not t.startswith(("array", "map", "struct", "binary", "variant")):
            aggs.append(F.min(c).cast("string").alias(f"__min_{c}"))
            aggs.append(F.max(c).cast("string").alias(f"__max_{c}"))
        if t == "string":
            aggs.append(F.avg(F.length(c)).alias(f"__len_{c}"))
    row = df.agg(*aggs).first()
    n = row["__n"]
    out = []
    for c, t in cols:
        nulls = row[f"__nulls_{c}"]
        out.append(
            (
                c,
                t,
                n,
                nulls,
                round(nulls / n, 6) if n else 0.0,
                row[f"__ndv_{c}"],
                row.asDict().get(f"__min_{c}"),
                row.asDict().get(f"__max_{c}"),
                round(row[f"__len_{c}"], 2)
                if f"__len_{c}" in row.asDict() and row[f"__len_{c}"] is not None
                else None,
            )
        )
    return df.sparkSession.createDataFrame(
        out,
        "column string, dtype string, n_rows long, n_nulls long, "
        "null_rate double, approx_ndv long, min string, max string, "
        "avg_len double",
    )
