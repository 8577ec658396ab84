"""Salted aggregation/join equivalence tests (operators/skew.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributedqueryengine_spark.operators import skew


def test_salted_agg_equals_plain(tables):
    li = tables["lineitem"]
    plain = {
        (r.l_returnflag,): (r.n, round(r.s, 2))
        for r in li.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("s"))
        .collect()
    }
    salted = {
        (r.l_returnflag,): (r.n_rows, round(r.sum_l_quantity, 2))
        for r in skew.salted_agg(
            li,
            keys=["l_returnflag"],
            sum_cols=["l_quantity"],
            unique_cols=["l_orderkey", "l_linenumber"],
        ).collect()
    }
    assert salted == plain


def test_salted_join_equals_plain(tables):
    orders, customer = tables["orders"], tables["customer"]
    plain = (
        orders.join(customer, orders["o_custkey"] == customer["c_custkey"])
        .select("o_orderkey", "c_name")
    )
    salted = skew.salted_join(
        orders,
        customer,
        "o_custkey",
        "c_custkey",
        unique_cols=["o_orderkey"],
    ).select("o_orderkey", "c_name")
    assert salted.count() == plain.count()
    assert salted.subtract(plain).count() == 0
    assert plain.subtract(salted).count() == 0


def test_salt_distributes_hot_key(spark):
    """A degenerate all-one-key table must spread across salt shards."""
    from pyspark.sql import Row

    df = spark.createDataFrame([Row(k="hot", uid=i) for i in range(1000)])
    shards = (
        df.withColumn("__salt", skew._salt(df, 16, ["uid"]))
        .groupBy("__salt")
        .count()
        .collect()
    )
    assert len(shards) == 16
    assert max(r["count"] for r in shards) < 1000 * 0.25  # no shard dominates
