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


def test_aqe_splits_skewed_join_partition(spark):
    """The documented answer for skewed keys WITHOUT manual salting is
    AQE's skew-join split — prove it actually engages: a join where one
    key carries ~100k rows against lowered skew thresholds must show
    skew=true sort-merge join in the final adaptive plan, and results
    must be identical to the non-adaptive run."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # key 0 is hot (~100k rows); keys 1..32 carry 100 rows each
        left = spark.range(0, 100_000).select(
            F.when(F.col("id") < 96_800, F.lit(0))
            .otherwise((F.col("id") % 32) + 1)
            .alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(0, 33).select(F.col("id").alias("k"),
                                          (F.col("id") * 10).alias("w"))
        # bare join: a downstream groupBy on the join key would REQUIRE
        # the hash partitioning the split breaks, and AQE (rightly)
        # refuses to split rather than add a shuffle — which is itself
        # part of the documented behavior
        j = left.join(right, "k").select("k", "v", "w")
        rows = len(j.collect())  # collect finalizes THIS DataFrame's
        # adaptive plan (a write/count wraps a fresh execution whose
        # final plan the DataFrame handle never sees)
        plan = j._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        assert "skew=true" in final, f"AQE skew split did not engage:\n{final[:3000]}"
        # equivalence against the non-skew-split run
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        assert left.join(right, "k").count() == rows
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_key_skew_report_finds_planted_hot_key(spark, tables):
    from pyspark.sql import functions as F

    from distributedqueryengine_spark.operators.skew import key_skew_report

    li = tables["lineitem"].select("l_orderkey", "l_quantity")
    hot = li.limit(4000).withColumn("l_orderkey", F.lit(999_999_999))
    df = li.unionByName(hot)
    rep = key_skew_report(df, ["l_orderkey"], top_n=5).collect()
    assert rep[0].l_orderkey == 999_999_999
    assert rep[0].n_rows == 4000
    total = df.count()
    assert abs(rep[0].share - 4000 / total) < 1e-6
    # skew factor = count / mean rows-per-key, cross-checked exactly
    n_keys = df.select("l_orderkey").distinct().count()
    assert rep[0].n_distinct_keys == n_keys
    assert abs(rep[0].skew_factor - round(4000 / (total / n_keys), 2)) < 0.011
    # descending and top_n-limited
    assert len(rep) == 5
    assert all(rep[i].n_rows >= rep[i + 1].n_rows for i in range(4))
