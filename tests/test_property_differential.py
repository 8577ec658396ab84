"""Property-based differential testing vs DuckDB (SURVEY §5.5).

Hypothesis generates random conjunctive filter+aggregate queries over
lineitem (generalizing the reference's only query shape: conjunctive
comparisons — QueryService.asmx.cs:658-674, including the OR→AND bug
we deliberately do NOT replicate); Spark and DuckDB must agree on
every one.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"

NUM_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
STR_COLS = {"l_returnflag": ["A", "N", "R"], "l_linestatus": ["O", "F"]}


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF_DIR}/lineitem.parquet')"
    )
    return con


num_pred = st.tuples(
    st.sampled_from(NUM_COLS),
    st.sampled_from([">", "<", ">=", "<=", "="]),
    st.floats(min_value=0.0, max_value=10.0, allow_nan=False).map(lambda x: round(x, 3)),
)
str_pred = st.sampled_from(
    [(c, "=", v) for c, vs in STR_COLS.items() for v in vs]
    + [(c, "!=", v) for c, vs in STR_COLS.items() for v in vs]
)
predicates = st.lists(st.one_of(num_pred, str_pred), min_size=1, max_size=4)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(preds=predicates, group_col=st.sampled_from(["l_returnflag", "l_linestatus"]))
def test_random_conjunctive_agg_matches_duckdb(spark, duck, preds, group_col):
    conds = [f"{c} {op if op != '!=' else '<>'} " + (f"'{v}'" if isinstance(v, str) else str(v)) for c, op, v in preds]
    where = " AND ".join(conds)
    sql = (
        f"SELECT {group_col}, count(*) AS n, round(sum(l_quantity), 2) AS sq "
        f"FROM lineitem WHERE {where} GROUP BY {group_col}"
    )
    got = {
        tuple(r)
        for r in spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .filter(F.expr(where))
        .groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("sq"))
        .collect()
    }
    expect = {tuple(r) for r in duck.execute(sql).fetchall()}
    assert got == expect


topk_cols = st.lists(
    st.sampled_from(["l_quantity", "l_extendedprice", "l_shipdate", "l_returnflag"]),
    min_size=1,
    max_size=2,
    unique=True,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(cols=topk_cols, desc=st.booleans(), limit=st.integers(min_value=1, max_value=50))
def test_random_order_limit_matches_duckdb(spark, duck, cols, desc, limit):
    """Deterministic ORDER BY (unique tie-break) + LIMIT must agree."""
    direction = "DESC" if desc else "ASC"
    order_sql = ", ".join(f"{c} {direction}" for c in cols) + ", l_orderkey ASC, l_linenumber ASC"
    sql = (
        f"SELECT l_orderkey, l_linenumber FROM lineitem "
        f"ORDER BY {order_sql} LIMIT {limit}"
    )
    sdf = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    ordering = [
        (F.col(c).desc() if desc else F.col(c).asc()) for c in cols
    ] + [F.col("l_orderkey").asc(), F.col("l_linenumber").asc()]
    got = [tuple(r) for r in sdf.orderBy(*ordering).limit(limit).select("l_orderkey", "l_linenumber").collect()]
    expect = [tuple(r) for r in duck.execute(sql).fetchall()]
    assert got == expect


AGG_FUNCS = ["sum", "min", "max", "avg"]


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lpred=num_pred,
    othresh=st.integers(min_value=1000, max_value=400000),
    agg_fn=st.sampled_from(AGG_FUNCS),
    agg_col=st.sampled_from(NUM_COLS),
)
def test_random_join_agg_matches_duckdb(spark, duck, lpred, othresh, agg_fn, agg_col):
    """Random filtered fact⋈fact join + random aggregate must agree:
    generalizes the reference's canonical SELECT-PROJECT-JOIN shape
    with arbitrary predicates on both inputs."""
    c, op, v = lpred
    lwhere = f"{c} {op} {v}"
    try:
        duck.execute("SELECT 1 FROM orders LIMIT 1")
    except duckdb.CatalogException:
        duck.execute(
            f"CREATE VIEW orders AS SELECT * FROM read_parquet('{SF_DIR}/orders.parquet')"
        )
    sql = (
        f"SELECT o_orderpriority, count(*) AS n, round({agg_fn}({agg_col}), 2) AS a "
        f"FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        f"WHERE {lwhere} AND o_totalprice > {othresh} "
        f"GROUP BY o_orderpriority"
    )
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").filter(F.expr(lwhere))
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").filter(
        F.col("o_totalprice") > othresh
    )
    agg_expr = {
        "sum": F.sum, "min": F.min, "max": F.max, "avg": F.avg,
    }[agg_fn](agg_col)
    got = {
        tuple(r)
        for r in li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.round(agg_expr, 2).alias("a"))
        .collect()
    }
    expect = {tuple(r) for r in duck.execute(sql).fetchall()}
    assert got == expect


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    order_col=st.sampled_from(NUM_COLS + ["l_shipdate"]),
    k=st.integers(min_value=1, max_value=10),
    desc=st.booleans(),
)
def test_random_window_topk_matches_duckdb(spark, duck, order_col, k, desc):
    """Random per-group top-k via row_number window (deterministic
    unique tie-break) must agree row-for-row."""
    direction = "DESC" if desc else "ASC"
    sql = (
        f"SELECT l_returnflag, l_orderkey, l_linenumber FROM ("
        f"  SELECT l_returnflag, l_orderkey, l_linenumber,"
        f"         row_number() OVER (PARTITION BY l_returnflag"
        f"             ORDER BY {order_col} {direction}, l_orderkey, l_linenumber) AS rn"
        f"  FROM lineitem) WHERE rn <= {k}"
    )
    from pyspark.sql.window import Window

    oc = F.col(order_col).desc() if desc else F.col(order_col).asc()
    w = Window.partitionBy("l_returnflag").orderBy(
        oc, F.col("l_orderkey").asc(), F.col("l_linenumber").asc()
    )
    got = {
        tuple(r)
        for r in spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("l_returnflag", "l_orderkey", "l_linenumber")
        .collect()
    }
    expect = {tuple(r) for r in duck.execute(sql).fetchall()}
    assert got == expect
