"""TPC-H Q5/Q18 differential tests vs DuckDB.

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
