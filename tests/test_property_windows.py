"""Property-based window-function differential vs DuckDB (SURVEY §5.5).

Window semantics are where engines drift (frame defaults, ties, range
vs rows, null ordering). Hypothesis generates random window specs —
aggregate-over-ROWS-frame, aggregate-over-RANGE-frame, and ranking
functions — and the SAME ANSI SQL text runs on Spark and DuckDB, so
there is no per-engine translation layer to hide a bug in. Every
ordering carries a unique (l_orderkey, l_linenumber) tie-break, which
makes row_number/lag/lead/first_value deterministic on both engines.
Complements the fixed 13-function sweep in `window_suite`
(operators/windows.py) with randomized frames and partitions.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SF_DIR = "/root/testdata/sf0.001"

PARTS = ["l_returnflag", "l_linestatus"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF_DIR}/lineitem.parquet')"
    )
    return con


def _key(t):
    # lag/lead emit None at partition edges; sort None below any value
    return tuple((v is not None, v) for v in t)


def _both(spark, duck, sql: str):
    got = sorted((tuple(r) for r in spark.sql(sql).collect()), key=_key)
    expect = sorted((tuple(r) for r in duck.execute(sql).fetchall()), key=_key)
    assert got == expect, f"engines disagree on:\n{sql}"


rows_bound_lo = st.one_of(
    st.just("UNBOUNDED PRECEDING"),
    st.integers(min_value=0, max_value=5).map(lambda k: f"{k} PRECEDING"),
)
rows_bound_hi = st.one_of(
    st.just("CURRENT ROW"),
    st.just("UNBOUNDED FOLLOWING"),
    st.integers(min_value=0, max_value=5).map(lambda k: f"{k} FOLLOWING"),
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    fn=st.sampled_from(["sum", "min", "max", "count", "avg"]),
    part=st.sampled_from(PARTS),
    lo=rows_bound_lo,
    hi=rows_bound_hi,
)
def test_random_rows_frame_agg_matches_duckdb(spark, tables, duck, fn, part, lo, hi):
    """Aggregate over a random ROWS frame: the frame is positional, so
    the unique tie-break makes every cell deterministic. l_quantity sums
    stay integral in double precision — no float-order sensitivity."""
    sql = (
        f"SELECT l_orderkey, l_linenumber, "
        f"round({fn}(l_quantity) OVER ("
        f"PARTITION BY {part} "
        f"ORDER BY l_extendedprice, l_orderkey, l_linenumber "
        f"ROWS BETWEEN {lo} AND {hi}), 3) AS w "
        f"FROM lineitem"
    )
    _both(spark, duck, sql)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    fn=st.sampled_from(["sum", "min", "max", "count"]),
    part=st.sampled_from(PARTS),
    prec=st.integers(min_value=0, max_value=10),
    foll=st.integers(min_value=0, max_value=10),
)
def test_random_range_frame_agg_matches_duckdb(spark, tables, duck, fn, part, prec, foll):
    """Aggregate over a random RANGE frame on a single numeric ordering
    column (l_quantity 1..50): value-based frames include ALL ties of a
    boundary value, so the result is deterministic without a tie-break
    — exactly the semantics ROWS frames don't have."""
    sql = (
        f"SELECT l_orderkey, l_linenumber, "
        f"{fn}(l_quantity) OVER ("
        f"PARTITION BY {part} ORDER BY l_quantity "
        f"RANGE BETWEEN {prec} PRECEDING AND {foll} FOLLOWING) AS w "
        f"FROM lineitem"
    )
    _both(spark, duck, sql)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    spec=st.one_of(
        st.just("row_number()"),
        st.just("rank()"),
        st.just("dense_rank()"),
        st.integers(min_value=2, max_value=7).map(lambda k: f"ntile({k})"),
        st.integers(min_value=1, max_value=3).map(lambda k: f"lag(l_quantity, {k})"),
        st.integers(min_value=1, max_value=3).map(lambda k: f"lead(l_quantity, {k})"),
        st.just("first_value(l_quantity)"),
    ),
    part=st.sampled_from(PARTS),
    desc=st.booleans(),
)
def test_random_ranking_fn_matches_duckdb(spark, tables, duck, spec, part, desc):
    """Ranking/navigation functions over a random partition and
    direction; rank/dense_rank see ties (ordered by l_extendedprice
    alone would tie), so the unique tie-break is part of the spec."""
    d = "DESC" if desc else "ASC"
    sql = (
        f"SELECT l_orderkey, l_linenumber, "
        f"{spec} OVER (PARTITION BY {part} "
        f"ORDER BY l_extendedprice {d}, l_orderkey, l_linenumber) AS w "
        f"FROM lineitem"
    )
    _both(spark, duck, sql)
