"""Property-based subquery differential vs DuckDB (SURVEY §5.5) —
one ANSI SQL text, two engines.

Subquery decorrelation is where optimizers earn (or lose) their keep:
EXISTS/NOT EXISTS rewrite to semi/anti joins, IN/NOT IN carry
three-valued logic (a NULL in the IN-list makes NOT IN filter
EVERYTHING — pinned here by minting NULLs with NULLIF), and scalar
subqueries must evaluate once. Hypothesis randomizes the thresholds
and shapes; Spark (which decorrelates via RewritePredicateSubquery)
and DuckDB must agree row-for-row.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("lineitem", "orders", "part"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _both(spark, duck, sql: str):
    got = sorted(tuple(r) for r in spark.sql(sql).collect())
    expect = sorted(tuple(r) for r in duck.execute(sql).fetchall())
    assert got == expect, f"engines disagree on:\n{sql}"


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    neg=st.booleans(),
    qty=st.integers(min_value=1, max_value=50),
    othresh=st.integers(min_value=1000, max_value=300000),
)
def test_exists_decorrelation_matches_duckdb(spark, tables, duck, neg, qty, othresh):
    """Correlated EXISTS/NOT EXISTS (the TPC-H Q4/Q21 shape) with random
    inner and outer predicates — Spark's semi/anti-join rewrite must
    agree with DuckDB's."""
    word = "NOT EXISTS" if neg else "EXISTS"
    sql = (
        f"SELECT o_orderpriority, count(*) AS n FROM orders "
        f"WHERE o_totalprice > {othresh} AND {word} ("
        f"SELECT 1 FROM lineitem "
        f"WHERE l_orderkey = o_orderkey AND l_quantity >= {qty}) "
        f"GROUP BY o_orderpriority"
    )
    _both(spark, duck, sql)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    neg=st.booleans(),
    null_key=st.integers(min_value=1, max_value=200),
    size=st.integers(min_value=1, max_value=50),
)
def test_in_subquery_null_semantics_match_duckdb(
    spark, tables, duck, neg, null_key, size
):
    """IN / NOT IN against a subquery whose list CONTAINS a minted NULL
    (nullif(p_partkey, k)): three-valued logic makes NOT IN drop every
    row once a NULL is present — the classic trap both engines must
    implement identically."""
    word = "NOT IN" if neg else "IN"
    sql = (
        f"SELECT count(*) AS n FROM lineitem "
        f"WHERE l_partkey {word} ("
        f"SELECT nullif(p_partkey, {null_key}) FROM part WHERE p_size >= {size})"
    )
    _both(spark, duck, sql)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    mult=st.floats(min_value=0.5, max_value=2.0, allow_nan=False).map(
        lambda x: round(x, 2)
    ),
    agg=st.sampled_from(["avg", "min", "max"]),
)
def test_scalar_subquery_matches_duckdb(spark, tables, duck, mult, agg):
    """Uncorrelated scalar subquery in a comparison (the TPC-H Q22
    shape): one global aggregate drives the outer filter."""
    sql = (
        f"SELECT o_orderstatus, count(*) AS n FROM orders "
        f"WHERE o_totalprice > {mult} * ("
        f"SELECT {agg}(o_totalprice) FROM orders) "
        f"GROUP BY o_orderstatus"
    )
    _both(spark, duck, sql)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    frac=st.floats(min_value=0.3, max_value=3.0, allow_nan=False).map(
        lambda x: round(x, 2)
    ),
)
def test_correlated_scalar_subquery_matches_duckdb(spark, tables, duck, frac):
    """Correlated scalar aggregate subquery (the TPC-H Q17 shape):
    per-partkey average computed in the inner query gates the outer
    row — decorrelates to an aggregate + join on both engines."""
    sql = (
        f"SELECT count(*) AS n, round(sum(l_extendedprice), 2) AS s "
        f"FROM lineitem l1 "
        f"WHERE l_quantity < {frac} * ("
        f"SELECT avg(l_quantity) FROM lineitem l2 "
        f"WHERE l2.l_partkey = l1.l_partkey)"
    )
    _both(spark, duck, sql)


as_of_pairs = st.sampled_from(
    [("click", "purchase"), ("view", "click"), ("purchase", "view"),
     ("error", "signup")]
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pair=as_of_pairs, k=st.sampled_from([2, 3, 5]), r=st.integers(min_value=0, max_value=4))
def test_random_asof_join_matches_duckdb_asof(spark, tables, duck, pair, k, r):
    """The custom union-sort-window as-of join vs DuckDB's native ASOF
    LEFT JOIN over random event-type pairs and random user subsets —
    the operator-level differential the fixed oracle row samples once.
    (user_id, ts) is unique in the fixture, so backward-asof has no tie
    ambiguity."""
    from pyspark.sql import functions as F

    from distributedqueryengine_spark.operators.asof import asof_join
    from distributedqueryengine_spark.session import load_table

    lt, rt = pair
    r = r % k
    ev = load_table(spark, SF_DIR, "events").filter(F.col("user_id") % k == r)
    left = ev.filter(F.col("event_type") == lt).select("event_id", "user_id", "ts")
    right = ev.filter(F.col("event_type") == rt).select("user_id", "ts", "value")
    out = asof_join(left, right, on="ts", by=["user_id"], right_cols=["ts", "value"])
    got = {
        (x.event_id, x.user_id, x.le, x.re, x.v)
        for x in out.select(
            "event_id",
            "user_id",
            F.unix_timestamp("ts").alias("le"),
            F.unix_timestamp("ts_r").alias("re"),
            F.round("value_r", 4).alias("v"),
        ).collect()
    }
    try:
        duck.execute("SELECT 1 FROM events LIMIT 1")
    except duckdb.CatalogException:
        duck.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF_DIR}/events.parquet')"
        )
    sql = f"""
        SELECT l.event_id, l.user_id,
               CAST(floor(epoch(l.ts)) AS BIGINT) AS le,
               CAST(floor(epoch(r.ts)) AS BIGINT) AS re,
               round(r.value, 4) AS v
        FROM (SELECT * FROM events WHERE event_type = '{lt}' AND user_id % {k} = {r}) l
        ASOF LEFT JOIN
             (SELECT * FROM events WHERE event_type = '{rt}' AND user_id % {k} = {r}) r
          ON l.user_id = r.user_id AND l.ts >= r.ts
    """
    expect = {tuple(x) for x in duck.execute(sql).fetchall()}
    assert got == expect, f"asof mismatch for pair={pair} k={k} r={r}"


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    width=st.sampled_from([50.0, 137.0, 250.0, 500.0, 1000.0]),
    ival=st.integers(min_value=100, max_value=2000),
)
def test_random_range_join_matches_duckdb(spark, tables, duck, width, ival):
    """The bucketed range join vs DuckDB's direct inequality join, over
    random interval sizes AND random bucket widths — bucket-boundary
    handling (floor arithmetic, the -1e-9 upper-edge nudge) is the part
    a fixed-width test cannot falsify. Every (width, interval)
    combination must produce the identical match multiset."""
    from pyspark.sql import functions as F

    from distributedqueryengine_spark.operators.asof import range_join
    from distributedqueryengine_spark.session import load_table

    sup = load_table(spark, SF_DIR, "supplier").select("s_suppkey", "s_acctbal")
    cust = load_table(spark, SF_DIR, "customer").select("c_custkey", "c_acctbal")
    right = sup.select(
        "s_suppkey",
        F.col("s_acctbal").alias("lo"),
        (F.col("s_acctbal") + ival).alias("hi"),
    )
    out = range_join(cust, right, "c_acctbal", "lo", "hi", bucket_width=width)
    got = sorted((r.c_custkey, r.s_suppkey) for r in out.collect())
    for t in ("supplier", "customer"):
        try:
            duck.execute(f"SELECT 1 FROM {t} LIMIT 1")
        except duckdb.CatalogException:
            duck.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
            )
    expect = sorted(
        tuple(r)
        for r in duck.execute(
            f"SELECT c_custkey, s_suppkey FROM customer JOIN supplier "
            f"ON c_acctbal >= s_acctbal AND c_acctbal < s_acctbal + {ival}"
        ).fetchall()
    )
    assert got == expect, f"range mismatch at width={width} interval={ival}"
