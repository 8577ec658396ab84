"""Expectations framework tests: exact failure counts against
hand-computed truth on real fixture tables + planted violations, and
the one-scan property for row-level checks."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributedqueryengine_spark.operators import expectations as E


def test_expectations_on_orders(spark, tables):
    orders = tables["orders"]
    customer = tables["customer"]
    # plant violations: a NULL status, an out-of-range price, an orphan key
    bad = spark.createDataFrame(
        [
            (9_000_001, 424242, None, -5.0, "1992-01-01", "1-URGENT"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string",
    ).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        F.col("o_orderdate").cast("date").alias("o_orderdate"),
        "o_orderpriority",
    )
    df = orders.unionByName(bad).persist()
    dup = df.unionByName(df.limit(3))  # planted duplicate keys

    statuses = [r.o_orderstatus for r in orders.select("o_orderstatus").distinct().collect()]
    report = {
        r.check: r
        for r in E.run_expectations(
            df,
            [
                E.not_null("o_orderstatus"),
                E.accepted_values("o_orderstatus", statuses),
                E.in_range("o_totalprice", 0, 10_000_000),
                E.matches("o_orderpriority", r"^\d-"),
                E.expression("price_positive", F.col("o_totalprice") > 0),
                E.unique("o_orderkey"),
                E.references(["o_custkey"], customer, ["c_custkey"]),
            ],
        ).collect()
    }
    n = df.count()
    r = report["not_null(o_orderstatus)"]
    assert (r.n_failed, r.n_checked, r.passed) == (1, n, False)
    # NULL status doesn't ALSO fail accepted_values (NULLs pass it)
    assert report["accepted_values(o_orderstatus)"].n_failed == 0
    assert report["in_range(o_totalprice,0,10000000)"].n_failed == 1
    assert report["matches(o_orderpriority)"].n_failed == 0
    assert report["expression(price_positive)"].n_failed == 1
    assert report["unique(o_orderkey)"].passed
    assert report["references(o_custkey)"].n_failed == 1  # the orphan
    assert not report["references(o_custkey)"].passed

    dup_rep = {r.check: r for r in E.run_expectations(dup, [E.unique("o_orderkey")]).collect()}
    assert dup_rep["unique(o_orderkey)"].n_failed == 3  # 3 duplicated keys
    df.unpersist()


def test_row_checks_share_one_scan(spark, tables):
    """However many row-level checks run, the plan reads the table
    once: a single aggregate over one FileScan."""
    import re

    from distributedqueryengine_spark.operators.expectations import (
        accepted_values,
        in_range,
        not_null,
    )

    li = tables["lineitem"]
    checks = (
        [not_null(c) for c in li.columns[:5]]
        + [in_range("l_quantity", 0, 100), in_range("l_discount", 0, 1)]
        + [accepted_values("l_returnflag", ["A", "N", "R"])]
    )
    aggs = [F.count(F.lit(1)).alias("__n")] + [
        F.sum(c.violation.cast("long")).alias(f"__f{i}")
        for i, c in enumerate(checks)
    ]
    plan = li.agg(*aggs)._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"FileScan parquet", plan)) == 1
