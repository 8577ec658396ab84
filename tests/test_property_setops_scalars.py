"""Property-based set-operation and scalar-function differential vs
DuckDB (SURVEY §5.5) — same discipline as test_property_windows.py:
one ANSI SQL text, two engines, no translation layer.

Set operations randomize the branch predicates and the op
(UNION/INTERSECT/EXCEPT × ALL/DISTINCT) — the multiset semantics of
the ALL variants are exactly where ad-hoc implementations diverge.
Scalar shapes randomize LIKE patterns, substring windows (1-based,
positive — the cross-dialect common ground), and date + INTERVAL
arithmetic over l_shipdate.
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
    for t in ("lineitem", "part"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _key(t):
    return tuple((v is not None, v) for v in t)


def _both(spark, duck, sql: str):
    got = sorted((tuple(r) for r in spark.sql(sql).collect()), key=_key)
    expect = sorted((tuple(r) for r in duck.execute(sql).fetchall()), key=_key)
    assert got == expect, f"engines disagree on:\n{sql}"


pred = st.tuples(
    st.sampled_from(["l_quantity", "l_extendedprice", "l_discount"]),
    st.sampled_from([">", "<", ">=", "<="]),
    st.floats(min_value=0.0, max_value=60000.0, allow_nan=False).map(
        lambda x: round(x, 2)
    ),
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    p1=pred,
    p2=pred,
    op=st.sampled_from(["UNION", "INTERSECT", "EXCEPT"]),
    all_=st.booleans(),
)
def test_random_set_op_matches_duckdb(spark, tables, duck, p1, p2, op, all_):
    """Random predicates feed both branches of a random set operation.
    The projected key (l_returnflag, l_linestatus) collides heavily, so
    ALL-variant multiset counting is genuinely exercised."""
    q = "ALL" if all_ else "DISTINCT"
    c1 = f"{p1[0]} {p1[1]} {p1[2]}"
    c2 = f"{p2[0]} {p2[1]} {p2[2]}"
    sql = (
        f"SELECT l_returnflag, l_linestatus FROM lineitem WHERE {c1} "
        f"{op} {q} "
        f"SELECT l_returnflag, l_linestatus FROM lineitem WHERE {c2}"
    )
    _both(spark, duck, sql)


like_pattern = st.tuples(
    st.sampled_from(["%", ""]),
    st.sampled_from(["STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY",
                     "PROMO", "BRUSHED", "PLATED", "ANODIZED", "POLISHED"]),
    st.sampled_from(["%", "_%", ""]),
).map(lambda t: t[0] + t[1] + t[2])


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pat=like_pattern,
    start=st.integers(min_value=1, max_value=8),
    ln=st.integers(min_value=1, max_value=12),
    neg=st.booleans(),
)
def test_random_string_shape_matches_duckdb(spark, tables, duck, pat, start, ln, neg):
    """Random LIKE filter + 1-based positive substring window + the
    length/upper/trim composition — the cross-dialect common ground
    where both engines must agree exactly."""
    maybe_not = "NOT " if neg else ""
    sql = (
        f"SELECT p_partkey, upper(substring(p_type, {start}, {ln})) AS s, "
        f"length(p_name) AS n "
        f"FROM part WHERE p_type {maybe_not}LIKE '{pat}'"
    )
    _both(spark, duck, sql)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    days=st.integers(min_value=1, max_value=365),
    unit=st.sampled_from(["DAY", "MONTH"]),
    cmp_year=st.integers(min_value=1993, max_value=1998),
)
def test_random_date_interval_matches_duckdb(spark, tables, duck, days, unit, cmp_year):
    """date + INTERVAL arithmetic and a year-boundary comparison: both
    engines implement ANSI interval addition over DATE; month addition
    clamps end-of-month the same way."""
    n = days if unit == "DAY" else 1 + days % 24
    sql = (
        f"SELECT l_orderkey, l_linenumber, "
        f"CAST(l_shipdate + INTERVAL '{n}' {unit} AS DATE) AS d "
        f"FROM lineitem WHERE l_shipdate >= DATE '{cmp_year}-06-01' "
        f"AND l_shipdate < DATE '{cmp_year}-07-01'"
    )
    _both(spark, duck, sql)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    jt=st.sampled_from(["LEFT", "INNER"]),
    placement=st.sampled_from(["ON", "WHERE"]),
    othresh=st.integers(min_value=1000, max_value=400000),
)
def test_outer_join_predicate_placement_matches_duckdb(
    spark, tables, duck, jt, placement, othresh
):
    """LEFT JOIN with the filter in the ON clause keeps unmatched left
    rows (null-extended); in the WHERE clause it post-filters them away
    — the classic outer-join semantics trap. Both engines must agree
    for every placement × join type × threshold."""
    try:
        duck.execute("SELECT 1 FROM orders LIMIT 1")
    except duckdb.CatalogException:
        duck.execute(
            f"CREATE VIEW orders AS SELECT * FROM read_parquet('{SF_DIR}/orders.parquet')"
        )
    pred = f"o_totalprice > {othresh}"
    if placement == "ON":
        sql = (
            f"SELECT l_returnflag, count(*) AS n, count(o_orderkey) AS nm "
            f"FROM lineitem {jt} JOIN orders "
            f"ON l_orderkey = o_orderkey AND {pred} "
            f"GROUP BY l_returnflag"
        )
    else:
        sql = (
            f"SELECT l_returnflag, count(*) AS n, count(o_orderkey) AS nm "
            f"FROM lineitem {jt} JOIN orders ON l_orderkey = o_orderkey "
            f"WHERE {pred} GROUP BY l_returnflag"
        )
    _both(spark, duck, sql)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    nulls=st.sampled_from(["NULLS FIRST", "NULLS LAST"]),
    desc=st.booleans(),
    zero=st.sampled_from(["0.0", "0.04", "0.1"]),
    limit=st.integers(min_value=5, max_value=60),
)
def test_null_ordering_matches_duckdb(spark, tables, duck, nulls, desc, zero, limit):
    """Explicit NULLS FIRST/LAST with nulls minted via NULLIF: the
    engines' DEFAULT null ordering differs (Spark: nulls first on ASC;
    DuckDB: nulls last), so agreement here proves the explicit
    qualifier is honored, not the default."""
    d = "DESC" if desc else "ASC"
    sql = (
        f"SELECT l_orderkey, l_linenumber, nullif(l_discount, {zero}) AS k "
        f"FROM lineitem "
        f"ORDER BY nullif(l_discount, {zero}) {d} {nulls}, "
        f"l_orderkey, l_linenumber LIMIT {limit}"
    )
    got = [tuple(r) for r in spark.sql(sql).collect()]
    expect = [tuple(r) for r in duck.execute(sql).fetchall()]
    assert got == expect, f"engines disagree on:\n{sql}"


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    sets=st.lists(
        st.sampled_from(
            ["(l_returnflag)", "(l_linestatus)",
             "(l_returnflag, l_linestatus)", "()"]
        ),
        min_size=1,
        max_size=3,
        unique=True,
    ),
    agg_col=st.sampled_from(["l_quantity", "l_extendedprice"]),
)
def test_random_grouping_sets_match_duckdb(spark, tables, duck, sets, agg_col):
    """Random GROUPING SETS combinations: super-aggregate rows are
    null-marked, and GROUPING() disambiguates a real NULL from a
    rollup NULL — both engines must produce identical set unions,
    including duplicate-set semantics when () appears twice via
    overlapping sets."""
    gs = ", ".join(sets)
    # A column may only be referenced bare (or inside GROUPING()) if it
    # appears in some grouping set — ANSI, enforced by Spark. Columns
    # absent from every chosen set become NULL placeholders; their
    # GROUPING() flag is omitted.
    joined = " ".join(sets)
    cols, flags = [], []
    for c in ("l_returnflag", "l_linestatus"):
        if c in joined:
            cols.append(c)
            flags.append(f"GROUPING({c}) AS g_{c}")
        else:
            cols.append(f"CAST(NULL AS STRING) AS {c}")
    flag_sql = (", ".join(flags) + ", ") if flags else ""
    sql = (
        f"SELECT {', '.join(cols)}, {flag_sql}"
        f"count(*) AS n, round(sum({agg_col}), 2) AS s "
        f"FROM lineitem GROUP BY GROUPING SETS ({gs})"
    )
    _both(spark, duck, sql)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    col=st.sampled_from(["l_extendedprice", "l_quantity", "l_tax"]),
    scale=st.sampled_from([2, 3]),
    p1=pred,
)
def test_decimal_sum_exactness_matches_duckdb(spark, tables, duck, col, scale, p1):
    """Double → DECIMAL cast + exact decimal SUM: decimal aggregation
    must be exact (no float accumulation drift) and the cast must round
    identically. Scales ≥ 2 keep the source's ≤2-decimal values away
    from rounding ties, so the engines see the same decimal inputs."""
    c1 = f"{p1[0]} {p1[1]} {p1[2]}"
    sql = (
        f"SELECT l_returnflag, "
        f"sum(CAST({col} AS DECIMAL(14,{scale}))) AS s, count(*) AS n "
        f"FROM lineitem WHERE {c1} GROUP BY l_returnflag"
    )
    got = sorted(
        (r.l_returnflag, None if r.s is None else str(r.s), r.n)
        for r in spark.sql(sql).collect()
    )
    expect = sorted(
        (rf, None if s is None else str(s), n)
        for rf, s, n in duck.execute(sql).fetchall()
    )
    # compare as normalized decimal strings: engines may report
    # different result SCALES for the same exact value
    def norm(t):
        rf, s, n = t
        if s is not None:
            s = s.rstrip("0").rstrip(".") if "." in s else s
        return rf, s, n

    assert [norm(t) for t in got] == [norm(t) for t in expect], sql


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    dcol=st.sampled_from(["l_suppkey", "l_partkey", "l_quantity"]),
    having=st.integers(min_value=1, max_value=3000),
    p1=pred,
)
def test_distinct_agg_having_matches_duckdb(spark, tables, duck, dcol, having, p1):
    """COUNT(DISTINCT) beside plain aggregates under a HAVING filter:
    Spark's expand-based distinct rewrite must agree with DuckDB's
    hash-distinct, including groups dropped by HAVING."""
    c1 = f"{p1[0]} {p1[1]} {p1[2]}"
    sql = (
        f"SELECT l_returnflag, count(DISTINCT {dcol}) AS d, "
        f"count(*) AS n, round(sum(l_quantity), 2) AS s "
        f"FROM lineitem WHERE {c1} "
        f"GROUP BY l_returnflag HAVING count(*) > {having}"
    )
    _both(spark, duck, sql)
