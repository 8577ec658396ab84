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
    max_examples=15,
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


def _ensure_view(duck, table):
    try:
        duck.execute(f"SELECT 1 FROM {table} LIMIT 1")
    except duckdb.CatalogException:
        duck.execute(
            f"CREATE VIEW {table} AS SELECT * FROM read_parquet('{SF_DIR}/{table}.parquet')"
        )


GROUP_KEYS = {
    "l_returnflag": "l_returnflag",
    "l_linestatus": "l_linestatus",
    "ship_year": "extract(year FROM l_shipdate)",
    # floor before cast: DuckDB CAST(double AS int) rounds-to-nearest,
    # Spark truncates — floor makes both sides agree
    "qty_bucket": "cast(floor(l_quantity / 10) AS int)",
}
# lambdas: Column construction needs an active SparkContext, which does
# not exist at module import time
GROUP_KEYS_SPARK = {
    "l_returnflag": lambda: F.col("l_returnflag"),
    "l_linestatus": lambda: F.col("l_linestatus"),
    "ship_year": lambda: F.year("l_shipdate"),
    "qty_bucket": lambda: F.floor(F.col("l_quantity") / 10).cast("int"),
}


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    keys=st.lists(st.sampled_from(sorted(GROUP_KEYS)), min_size=1, max_size=3, unique=True),
    agg_fn=st.sampled_from(AGG_FUNCS),
    agg_col=st.sampled_from(NUM_COLS),
)
def test_random_groupby_keys_matches_duckdb(spark, duck, keys, agg_fn, agg_col):
    """Random grouping-key SETS (including computed keys) must agree —
    exercises partial+final agg under arbitrary key combinations.
    Aggregate values compare UNROUNDED within 1e-9 relative tolerance:
    float sums are order-dependent across engines (~1e-15 relative),
    and a round(2) equality flips a whole cent when a group's avg lands
    exactly on a .xx5 boundary (seen in the wild: avg=0.025 over 4
    rows → 0.02 vs 0.03). Keys and counts still compare exactly."""
    key_sql = ", ".join(f"{GROUP_KEYS[k]} AS {k}" for k in keys)
    sql = (
        f"SELECT {key_sql}, count(*) AS n, {agg_fn}({agg_col}) AS a "
        f"FROM lineitem GROUP BY {', '.join(GROUP_KEYS[k] for k in keys)}"
    )
    agg_expr = {"sum": F.sum, "min": F.min, "max": F.max, "avg": F.avg}[agg_fn](agg_col)
    got = {
        tuple(r)[:-1]: r[-1]
        for r in spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .groupBy(*[GROUP_KEYS_SPARK[k]().alias(k) for k in keys])
        .agg(F.count(F.lit(1)).alias("n"), agg_expr.alias("a"))
        .collect()
    }
    expect = {tuple(r)[:-1]: r[-1] for r in duck.execute(sql).fetchall()}
    assert got.keys() == expect.keys()
    for k, g in got.items():
        e = expect[k]
        assert abs(g - e) <= 1e-9 * max(abs(g), abs(e), 1.0), (k, g, e)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    cthresh=st.integers(min_value=-500, max_value=5000),
    othresh=st.integers(min_value=1000, max_value=400000),
    jtype=st.sampled_from(["inner", "left", "left_semi", "left_anti"]),
)
def test_random_two_table_join_types_match_duckdb(spark, duck, cthresh, othresh, jtype):
    """Random conjuncts on BOTH join inputs × random join TYPE
    (inner/left/semi/anti) must agree row-for-row, NULLs included."""
    _ensure_view(duck, "customer")
    _ensure_view(duck, "orders")
    if jtype == "inner":
        sql = (
            f"SELECT c_custkey, o_orderkey FROM customer JOIN orders "
            f"ON c_custkey = o_custkey AND o_totalprice > {othresh} "
            f"WHERE c_acctbal > {cthresh}"
        )
    elif jtype == "left":
        sql = (
            f"SELECT c_custkey, o_orderkey FROM customer LEFT JOIN orders "
            f"ON c_custkey = o_custkey AND o_totalprice > {othresh} "
            f"WHERE c_acctbal > {cthresh}"
        )
    elif jtype == "left_semi":
        sql = (
            f"SELECT c_custkey, NULL AS o_orderkey FROM customer c "
            f"WHERE c_acctbal > {cthresh} AND EXISTS (SELECT 1 FROM orders o "
            f"WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > {othresh})"
        )
    else:
        sql = (
            f"SELECT c_custkey, NULL AS o_orderkey FROM customer c "
            f"WHERE c_acctbal > {cthresh} AND NOT EXISTS (SELECT 1 FROM orders o "
            f"WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > {othresh})"
        )
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").filter(
        F.col("c_acctbal") > cthresh
    )
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").filter(
        F.col("o_totalprice") > othresh
    )
    j = cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), jtype)
    if jtype in ("left_semi", "left_anti"):
        j = j.select("c_custkey", F.lit(None).cast("long").alias("o_orderkey"))
    else:
        j = j.select("c_custkey", "o_orderkey")
    got = sorted((r[0], r[1]) for r in j.collect())
    expect = sorted((r[0], r[1]) for r in duck.execute(sql).fetchall())
    assert got == expect


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    agg_fn=st.sampled_from(AGG_FUNCS),
    agg_col=st.sampled_from(NUM_COLS),
    hthresh=st.floats(min_value=0.0, max_value=50.0, allow_nan=False).map(
        lambda x: round(x, 2)
    ),
)
def test_random_having_matches_duckdb(spark, duck, agg_fn, agg_col, hthresh):
    """Random HAVING on a random aggregate must agree (post-agg filter
    placement)."""
    sql = (
        f"SELECT l_returnflag, l_linestatus, round({agg_fn}({agg_col}), 2) AS a "
        f"FROM lineitem GROUP BY l_returnflag, l_linestatus "
        f"HAVING avg(l_quantity) > {hthresh}"
    )
    agg_expr = {"sum": F.sum, "min": F.min, "max": F.max, "avg": F.avg}[agg_fn](agg_col)
    got = {
        tuple(r)
        for r in spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(agg_expr, 2).alias("a"),
            F.avg("l_quantity").alias("_avgq"),
        )
        .filter(F.col("_avgq") > hthresh)
        .drop("_avgq")
        .collect()
    }
    expect = {tuple(r) for r in duck.execute(sql).fetchall()}
    assert got == expect


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    setop=st.sampled_from(["UNION", "INTERSECT", "EXCEPT"]),
    t1=st.floats(min_value=0.0, max_value=0.1, allow_nan=False).map(lambda x: round(x, 3)),
    t2=st.floats(min_value=0.0, max_value=0.1, allow_nan=False).map(lambda x: round(x, 3)),
)
def test_random_set_op_matches_duckdb(spark, duck, setop, t1, t2):
    """Random set op between two randomly-filtered projections of the
    same table must agree (DISTINCT semantics on all three ops)."""
    sql = (
        f"SELECT l_returnflag, l_linestatus FROM lineitem WHERE l_discount > {t1} "
        f"{setop} "
        f"SELECT l_returnflag, l_linestatus FROM lineitem WHERE l_tax > {t2}"
    )
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    a = li.filter(F.col("l_discount") > t1).select("l_returnflag", "l_linestatus")
    b = li.filter(F.col("l_tax") > t2).select("l_returnflag", "l_linestatus")
    if setop == "UNION":
        res = a.union(b).distinct()
    elif setop == "INTERSECT":
        res = a.intersect(b)
    else:
        res = a.subtract(b)  # EXCEPT DISTINCT semantics, same as SQL
    got = {tuple(r) for r in res.collect()}
    expect = {tuple(r) for r in duck.execute(sql).fetchall()}
    assert got == expect


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    m=st.integers(min_value=2, max_value=97),
    a_=st.integers(min_value=1, max_value=9),
    b_=st.integers(min_value=0, max_value=100),
)
def test_random_integer_expression_matches_duckdb(spark, duck, m, a_, b_):
    """Random integer expression tree (exact arithmetic — no float
    drift) evaluated per-row and aggregated must agree bit-for-bit."""
    expr_sql = f"(l_orderkey * {a_} + l_linenumber + {b_}) % {m}"
    sql = (
        f"SELECT {expr_sql} AS e, count(*) AS n, sum(l_orderkey) AS s "
        f"FROM lineitem GROUP BY {expr_sql}"
    )
    e = ((F.col("l_orderkey") * a_ + F.col("l_linenumber") + b_) % m).alias("e")
    got = {
        tuple(r)
        for r in spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .groupBy(e)
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_orderkey").alias("s"))
        .collect()
    }
    expect = {tuple(r) for r in duck.execute(sql).fetchall()}
    assert got == expect


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lo=st.floats(min_value=5.0, max_value=20.0, allow_nan=False).map(lambda x: round(x, 1)),
    hi=st.floats(min_value=25.0, max_value=45.0, allow_nan=False).map(lambda x: round(x, 1)),
)
def test_random_case_bucketing_matches_duckdb(spark, duck, lo, hi):
    """Random CASE WHEN thresholds bucketing a measure, then grouped,
    must agree (conditional expression evaluation order)."""
    sql = (
        f"SELECT CASE WHEN l_quantity < {lo} THEN 'low' "
        f"WHEN l_quantity < {hi} THEN 'mid' ELSE 'high' END AS bucket, "
        f"count(*) AS n FROM lineitem GROUP BY 1"
    )
    bucket = (
        F.when(F.col("l_quantity") < lo, "low")
        .when(F.col("l_quantity") < hi, "mid")
        .otherwise("high")
        .alias("bucket")
    )
    got = {
        tuple(r)
        for r in spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .groupBy(bucket)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    expect = {tuple(r) for r in duck.execute(sql).fetchall()}
    assert got == expect


STR_FNS = {
    "upper": ("upper(o_orderpriority)", lambda c: F.upper(c)),
    "lower": ("lower(o_orderpriority)", lambda c: F.lower(c)),
    "substr2": ("substring(o_orderpriority, 1, 2)", lambda c: F.substring(c, 1, 2)),
    "reverse": ("reverse(o_orderpriority)", lambda c: F.reverse(c)),
    "length": ("cast(length(o_orderpriority) AS varchar)", lambda c: F.length(c).cast("string")),
}


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(fn=st.sampled_from(sorted(STR_FNS)), status=st.sampled_from(["O", "F", "P"]))
def test_random_string_fn_matches_duckdb(spark, duck, fn, status):
    """Random string function applied as a grouping key must agree."""
    _ensure_view(duck, "orders")
    fsql, fspark = STR_FNS[fn]
    sql = (
        f"SELECT {fsql} AS k, count(*) AS n FROM orders "
        f"WHERE o_orderstatus = '{status}' GROUP BY 1"
    )
    got = {
        tuple(r)
        for r in spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .filter(F.col("o_orderstatus") == status)
        .groupBy(fspark(F.col("o_orderpriority")).alias("k"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    expect = {tuple(r) for r in duck.execute(sql).fetchall()}
    assert got == expect


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    unit=st.sampled_from(["year", "month", "day"]),
    flag=st.sampled_from(["A", "N", "R"]),
)
def test_random_date_trunc_matches_duckdb(spark, duck, unit, flag):
    """Random date_trunc granularity as a grouping key must agree
    (timestamp bucketing semantics)."""
    # cast: DuckDB date_trunc('year'/'month'/'day') returns DATE,
    # Spark returns TIMESTAMP
    sql = (
        f"SELECT cast(date_trunc('{unit}', l_shipdate) AS timestamp) AS b, "
        f"count(*) AS n FROM lineitem WHERE l_returnflag = '{flag}' GROUP BY 1"
    )
    got = {
        tuple(r)
        for r in spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .filter(F.col("l_returnflag") == flag)
        .groupBy(F.date_trunc(unit, "l_shipdate").alias("b"))
        .agg(F.count(F.lit(1)).alias("n"))
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
