"""distributed_global_rank: exact global row_number without the
single-partition window — must equal Spark's own global window on
fixtures (ties, NULLs, ascending/descending, degenerate constants),
and its plan must contain no single-partition global sort window."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from distributedqueryengine_spark.operators.windows import (
    distributed_global_rank,
)


def _reference(df, value_col, id_col, ascending):
    order = (
        [F.col(value_col).asc_nulls_first(), F.col(id_col).asc()]
        if ascending
        else [F.col(value_col).desc_nulls_last(), F.col(id_col).asc()]
    )
    return df.withColumn("ref", F.row_number().over(Window.orderBy(*order)))


@pytest.mark.parametrize("ascending", [True, False])
def test_matches_global_window_with_ties_and_nulls(spark, ascending):
    import random

    rng = random.Random(3)
    rows = []
    for i in range(500):
        v = rng.choice([None, 0.0, 1.5, 1.5, 2.25, rng.random() * 10])
        rows.append((i, v))
    df = spark.createDataFrame(rows, "id long, v double")
    got = {
        r["id"]: r["rnk"]
        for r in distributed_global_rank(
            df, "v", "id", ascending=ascending, n_buckets=16
        ).collect()
    }
    ref = {r["id"]: r["ref"]
           for r in _reference(df, "v", "id", ascending).collect()}
    assert got == ref


def test_constant_values_degenerate_to_id_order(spark):
    df = spark.createDataFrame([(i, 7.0) for i in range(100)], "id long, v double")
    got = {r["id"]: r["rnk"]
           for r in distributed_global_rank(df, "v", "id", n_buckets=8).collect()}
    assert got == {i: i + 1 for i in range(100)}


def test_percentile_matches_percent_rank(spark):
    df = spark.createDataFrame(
        [(i, float(i % 7)) for i in range(50)], "id long, v double"
    )
    got = {
        r["id"]: round(r["pct"], 9)
        for r in distributed_global_rank(
            df, "v", "id", percentile="pct", n_buckets=4
        ).collect()
    }
    # percent_rank has tie-flat semantics; our percentile is over the
    # TOTAL order (ties broken by id), so compare against the explicit
    # (row_number-1)/(n-1) definition rather than F.percent_rank.
    ref_rows = _reference(df, "v", "id", True).collect()
    n = len(ref_rows)
    ref = {r["id"]: round((r["ref"] - 1) / (n - 1), 9) for r in ref_rows}
    assert got == ref


def test_no_single_partition_global_sort(spark):
    df = spark.createDataFrame([(i, float(i)) for i in range(100)], "id long, v double")
    plan = distributed_global_rank(df, "v", "id")._jdf.queryExecution().executedPlan().toString()
    # the rank window partitions by bucket — a global-window plan would
    # show an empty PARTITION BY (windowspecdefinition without our
    # bucket column feeding a SinglePartition exchange)
    assert "SinglePartition" not in plan, plan


def test_empty_input(spark):
    df = spark.createDataFrame([], "id long, v double")
    out = distributed_global_rank(df, "v", "id", percentile="pct")
    assert out.count() == 0
    assert set(out.columns) == {"id", "v", "rnk", "pct"}
