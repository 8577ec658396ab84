"""TPC-H Q2/Q5/Q7/Q8/Q9/Q11/Q18/Q20/Q21/Q22 differential tests vs DuckDB.

The driver inventory is at its 50-row cap, so these extra TPC-H shapes
are value-checked here with the same discipline as the driver gate:
row count, column names, and order-insensitive values against DuckDB
running the equivalent SQL on the same parquet.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from distributedqueryengine_spark import queries as Q
from distributedqueryengine_spark.session import TABLES

SF_DIR = "/root/testdata/sf0.01"

Q5_SQL = r"""
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= DATE '1996-01-01'
      AND o_orderdate < DATE '1998-01-01'
    GROUP BY n_name
"""

Q18_SQL = r"""
    WITH big AS (
        SELECT l_orderkey, sum(l_quantity) AS sum_qty
        FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           round(sum_qty, 2) AS total_qty
    FROM orders
    JOIN big ON o_orderkey = l_orderkey
    JOIN customer ON o_custkey = c_custkey
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 100
"""


Q7_SQL = r"""
    SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               extract(year FROM l_shipdate) AS l_year,
               l_extendedprice * (1 - l_discount) AS volume
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
            OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
          AND l_shipdate BETWEEN DATE '1996-01-01' AND DATE '1999-12-31'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
"""

Q8_SQL = r"""
    SELECT o_year,
           round(sum(CASE WHEN nation = 'NATION_5' THEN volume ELSE 0 END)
                 / sum(volume), 6) AS mkt_share
    FROM (
        SELECT extract(year FROM o_orderdate) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               n2.n_name AS nation
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region   ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'AMERICA' AND p_type = 'PROMO'
          AND o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1998-12-31'
    ) all_nations
    GROUP BY o_year
"""

# Adapted: no l_commitdate/l_receiptdate in the fixture, so "late" is
# l_shipdate > o_orderdate + 60 days (see q_tpch_q21_waiting_supplier).
Q21_SQL = r"""
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name ASC
    LIMIT 100
"""

# Adapted: no c_phone in the fixture, so cntrycode := c_nationkey over a
# 7-nation list; "dormant" = no order since 2000-01-01.
Q22_SQL = r"""
    SELECT c_nationkey AS cntrycode, count(*) AS numcust,
           round(sum(c_acctbal), 2) AS totacctbal
    FROM customer c
    WHERE c_nationkey IN (1, 3, 5, 7, 11, 13, 17)
      AND c_acctbal > (SELECT avg(c_acctbal) FROM customer
                       WHERE c_acctbal > 0
                         AND c_nationkey IN (1, 3, 5, 7, 11, 13, 17))
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= DATE '2000-01-01')
    GROUP BY c_nationkey
"""


Q6_SQL = r"""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""

Q13_SQL = r"""
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
"""

Q15_SQL = r"""
    WITH rev AS (
        SELECT l_suppkey, sum(l_extendedprice * (1 - l_discount)) AS total
        FROM lineitem
        WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
        GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, round(total, 2) AS total_revenue
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total = (SELECT max(total) FROM rev)
    ORDER BY s_suppkey
"""

Q17_SQL = r"""
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#4' AND p_size < 25
      AND l_quantity < (SELECT 0.7 * avg(l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey)
"""


# Deterministic partsupp stand-in (queries._partsupp_proxy runs the
# IDENTICAL key arithmetic Spark-side, so the differential stays exact).
PARTSUPP_CTE = r"""
    partsupp AS (
        SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
               CAST((l_partkey * 7 + l_suppkey * 11) % 9999 + 1 AS BIGINT)
                   AS ps_availqty,
               CAST((l_partkey * 13 + l_suppkey * 17) % 100000 AS DOUBLE)
                   / 100.0 + 1.0 AS ps_supplycost
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem))
"""

Q2_SQL = rf"""
    WITH {PARTSUPP_CTE},
    eu AS (
        SELECT ps_partkey, ps_supplycost, s_acctbal, s_name, n_name
        FROM partsupp
        JOIN supplier ON s_suppkey = ps_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE')
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand
    FROM part JOIN eu ON p_partkey = ps_partkey
    WHERE p_type = 'LARGE' AND p_size < 25
      AND ps_supplycost = (SELECT min(ps_supplycost) FROM eu e2
                           WHERE e2.ps_partkey = p_partkey)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
"""

Q9_SQL = rf"""
    WITH {PARTSUPP_CTE}
    SELECT nation, o_year, round(sum(amount), 2) AS sum_profit
    FROM (SELECT n_name AS nation,
                 CAST(year(o_orderdate) AS INTEGER) AS o_year,
                 l_extendedprice * (1 - l_discount)
                     - ps_supplycost * l_quantity AS amount
          FROM lineitem
          JOIN part ON p_partkey = l_partkey
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN partsupp ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
          JOIN orders ON o_orderkey = l_orderkey
          JOIN nation ON s_nationkey = n_nationkey
          WHERE p_name LIKE '%red%')
    GROUP BY nation, o_year
"""

Q11_SQL = rf"""
    WITH {PARTSUPP_CTE},
    nat AS (
        SELECT ps_partkey, ps_supplycost * ps_availqty AS v
        FROM partsupp
        JOIN supplier ON ps_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_7')
    SELECT ps_partkey, round(sum(v), 2) AS value
    FROM nat GROUP BY ps_partkey
    HAVING sum(v) > (SELECT sum(v) * 0.001 FROM nat)
    ORDER BY value DESC
"""

Q20_SQL = rf"""
    WITH {PARTSUPP_CTE}
    SELECT s_name, s_acctbal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name IN ('NATION_3', 'NATION_5', 'NATION_11')
      AND s_suppkey IN (
        SELECT ps_suppkey FROM partsupp
        WHERE ps_partkey IN (SELECT p_partkey FROM part
                             WHERE p_name LIKE 'small%')
          AND ps_availqty > (SELECT 0.5 * sum(l_quantity) FROM lineitem
                             WHERE l_partkey = ps_partkey
                               AND l_suppkey = ps_suppkey
                               AND l_shipdate >= DATE '1996-01-01'
                               AND l_shipdate < DATE '1997-01-01'))
    ORDER BY s_name
"""


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _assert_match(spark_df, duck_rows, duck_cols):
    got_cols = spark_df.columns
    assert sorted(c.lower() for c in got_cols) == sorted(c.lower() for c in duck_cols)
    got = sorted(
        tuple(str(v) if not isinstance(v, float) else round(v, 6) for v in r)
        for r in ([row[c] for c in got_cols] for row in spark_df.collect())
    )
    idx = {c.lower(): i for i, c in enumerate(duck_cols)}
    order = [idx[c.lower()] for c in got_cols]
    expect = sorted(
        tuple(
            str(r[i]) if not isinstance(r[i], float) else round(r[i], 6)
            for i in order
        )
        for r in duck_rows
    )
    assert len(got) == len(expect)
    for g, e in zip(got, expect):
        for gv, ev in zip(g, e):
            if isinstance(gv, float) and isinstance(ev, float):
                assert math.isclose(gv, ev, rel_tol=1e-6), (g, e)
            else:
                assert gv == ev, (g, e)


def test_tpch_q5_matches_duckdb(spark, duck):
    res = duck.execute(Q5_SQL)
    cols = [d[0] for d in res.description]
    _assert_match(Q.q_tpch_q5_local_supplier_volume(spark, SF_DIR), res.fetchall(), cols)


def test_tpch_q18_matches_duckdb(spark, duck):
    res = duck.execute(Q18_SQL)
    cols = [d[0] for d in res.description]
    rows = res.fetchall()
    assert rows, "threshold produced no qualifying orders — lower it"
    _assert_match(Q.q_tpch_q18_large_volume_customer(spark, SF_DIR), rows, cols)


def test_tpch_q7_matches_duckdb(spark, duck):
    res = duck.execute(Q7_SQL)
    cols = [d[0] for d in res.description]
    rows = res.fetchall()
    assert rows, "nation pair produced no trade — pick different nations"
    _assert_match(Q.q_tpch_q7_volume_shipping(spark, SF_DIR), rows, cols)


def test_tpch_q8_matches_duckdb(spark, duck):
    res = duck.execute(Q8_SQL)
    cols = [d[0] for d in res.description]
    rows = res.fetchall()
    assert rows, "market-share predicate produced no rows"
    _assert_match(Q.q_tpch_q8_market_share(spark, SF_DIR), rows, cols)


def test_tpch_q21_matches_duckdb(spark, duck):
    res = duck.execute(Q21_SQL)
    cols = [d[0] for d in res.description]
    rows = res.fetchall()
    assert rows, "lateness predicate produced no waiting suppliers"
    _assert_match(Q.q_tpch_q21_waiting_supplier(spark, SF_DIR), rows, cols)


def test_tpch_q22_matches_duckdb(spark, duck):
    res = duck.execute(Q22_SQL)
    cols = [d[0] for d in res.description]
    rows = res.fetchall()
    assert rows, "dormancy predicate produced no customers"
    _assert_match(Q.q_tpch_q22_global_sales_opportunity(spark, SF_DIR), rows, cols)


def test_tpch_q6_matches_duckdb(spark, duck):
    res = duck.execute(Q6_SQL)
    cols = [d[0] for d in res.description]
    rows = res.fetchall()
    assert rows[0][0] is not None, "Q6 predicate selected no rows"
    _assert_match(Q.q_tpch_q6_forecast_revenue(spark, SF_DIR), rows, cols)


def test_tpch_q13_matches_duckdb(spark, duck):
    res = duck.execute(Q13_SQL)
    cols = [d[0] for d in res.description]
    rows = res.fetchall()
    assert len(rows) > 3
    _assert_match(Q.q_tpch_q13_customer_distribution(spark, SF_DIR), rows, cols)


def test_tpch_q15_matches_duckdb(spark, duck):
    res = duck.execute(Q15_SQL)
    cols = [d[0] for d in res.description]
    rows = res.fetchall()
    assert rows, "no supplier had quarterly revenue"
    _assert_match(Q.q_tpch_q15_top_supplier(spark, SF_DIR), rows, cols)


def test_tpch_q17_matches_duckdb(spark, duck):
    res = duck.execute(Q17_SQL)
    cols = [d[0] for d in res.description]
    rows = res.fetchall()
    assert rows[0][0] is not None, "Q17 predicate selected no rows"
    _assert_match(Q.q_tpch_q17_small_quantity_revenue(spark, SF_DIR), rows, cols)


def test_tpch_q2_matches_duckdb(spark, duck):
    res = duck.execute(Q2_SQL)
    cols = [d[0] for d in res.description]
    rows = res.fetchall()
    assert len(rows) > 10, "min-cost predicate too thin — loosen it"
    _assert_match(Q.q_tpch_q2_min_cost_supplier(spark, SF_DIR), rows, cols)


def test_tpch_q9_matches_duckdb(spark, duck):
    res = duck.execute(Q9_SQL)
    cols = [d[0] for d in res.description]
    rows = res.fetchall()
    assert len(rows) > 10, "part-name family selected no trade"
    _assert_match(Q.q_tpch_q9_product_type_profit(spark, SF_DIR), rows, cols)


def test_tpch_q11_matches_duckdb(spark, duck):
    res = duck.execute(Q11_SQL)
    cols = [d[0] for d in res.description]
    rows = res.fetchall()
    assert len(rows) > 10, "stock-value threshold filtered everything"
    _assert_match(Q.q_tpch_q11_important_stock(spark, SF_DIR), rows, cols)


def test_tpch_q20_matches_duckdb(spark, duck):
    res = duck.execute(Q20_SQL)
    cols = [d[0] for d in res.description]
    rows = res.fetchall()
    assert rows, "excess-stock predicate produced no suppliers"
    _assert_match(Q.q_tpch_q20_part_promotion(spark, SF_DIR), rows, cols)
