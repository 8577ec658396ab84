"""Association rules: hand-computed fixture, DuckDB differential on
the events table, set semantics, and the basket-size guard."""
from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from distributedqueryengine_spark.operators.association import association_rules

SF_DIR = "/root/testdata/sf0.001"


def test_hand_computed(spark):
    # baskets: {a,b,c}, {a,b}, {a,d}, {b,c}  → n=4
    rows = [(1, "a"), (1, "b"), (1, "c"), (2, "a"), (2, "b"),
            (3, "a"), (3, "d"), (4, "b"), (4, "c")]
    df = spark.createDataFrame(rows, "bk int, item string")
    out = {(r.antecedent, r.consequent): r for r in
           association_rules(df, "bk", "item").collect()}
    ab = out[("a", "b")]
    assert (ab.n_antecedent, ab.n_consequent, ab.n_both) == (3, 3, 2)
    assert ab.support == round(2 / 4, 6)
    assert ab.confidence == round(2 / 3, 6)
    assert ab.lift == round((2 / 3) / (3 / 4), 6)
    ba = out[("b", "a")]
    assert ba.confidence == round(2 / 3, 6)  # symmetric here (counts equal)
    bc = out[("b", "c")]
    assert bc.confidence == round(2 / 3, 6)
    assert bc.lift == round((2 / 3) / (2 / 4), 6)  # lift > 1
    assert ("a", "a") not in out and ("d", "a") in out


def test_set_semantics_and_nulls(spark):
    rows = [(1, "x"), (1, "x"), (1, "y"), (None, "z"), (2, None),
            (2, "x"), (2, "y")]
    df = spark.createDataFrame(rows, "bk int, item string")
    out = {(r.antecedent, r.consequent): r.n_both for r in
           association_rules(df, "bk", "item").collect()}
    assert out[("x", "y")] == 2  # duplicate (1, x) collapses


def test_duckdb_differential_events(spark, tables):
    got = sorted(
        tuple(r)
        for r in association_rules(
            tables["events"].select("user_id", "event_type"),
            "user_id", "event_type", min_pair_count=2,
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/events.parquet')"
    )
    want = sorted(tuple(r) for r in con.execute("""
        WITH pres AS (SELECT DISTINCT user_id AS b, event_type AS i
                      FROM events
                      WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
        nb AS (SELECT count(DISTINCT b) AS n FROM pres),
        ic AS (SELECT i, count(*) AS n_item FROM pres GROUP BY i),
        up AS (SELECT a.i AS ia, c.i AS ib, count(*) AS n_both
               FROM pres a JOIN pres c ON a.b = c.b AND a.i < c.i
               GROUP BY 1, 2 HAVING count(*) >= 2),
        dirp AS (SELECT ia AS antecedent, ib AS consequent, n_both FROM up
                 UNION ALL
                 SELECT ib, ia, n_both FROM up)
        SELECT antecedent, consequent,
               CAST(na.n_item AS BIGINT) AS n_antecedent,
               CAST(nc.n_item AS BIGINT) AS n_consequent,
               CAST(n_both AS BIGINT) AS n_both,
               round(n_both / (SELECT n FROM nb), 6) AS support,
               round(n_both / na.n_item, 6) AS confidence,
               round((n_both / na.n_item) / (nc.n_item / (SELECT n FROM nb)), 6) AS lift
        FROM dirp
        JOIN ic na ON na.i = antecedent
        JOIN ic nc ON nc.i = consequent
    """).fetchall())
    assert len(got) > 0
    assert got == want


def test_basket_guard_raises(spark):
    df = spark.range(200).select(
        F.lit(1).alias("bk"), F.col("id").cast("string").alias("item")
    )
    with pytest.raises(Exception, match="max_basket_items"):
        association_rules(df, "bk", "item", max_basket_items=50).collect()


def test_empty_raises(spark):
    df = spark.createDataFrame([], "bk int, item string")
    with pytest.raises(ValueError, match="no non-NULL"):
        association_rules(df, "bk", "item")
