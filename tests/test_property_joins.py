"""Property-based multi-way join differential vs DuckDB (SURVEY §5.5;
judge r6 item 6) — one ANSI SQL text, two engines.

Outer-join NULL semantics are the highest-value remaining surface for
silent drift: NULL join keys never match under `=` but survive outer
sides, ON-clause predicates on a LEFT join filter the RIGHT side only
(unlike WHERE), and three-way chains with mixed outer-ness must
associate identically. Hypothesis randomizes key minting, join types,
thresholds, and ON-vs-WHERE predicate placement; Spark and DuckDB must
agree row-for-row. Money sums go through DECIMAL(18,2) so the compare
is exact, not float-rounded.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SF_DIR = "/root/testdata/sf0.001"

JOIN_TYPES = ("INNER", "LEFT", "RIGHT", "FULL")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem", "nation"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _key(row):
    # NULL-safe sort: outer joins legitimately emit NULL group keys
    return tuple((v is None, v if v is not None else 0) for v in row)


def _both(spark, duck, sql: str):
    got = sorted((tuple(r) for r in spark.sql(sql).collect()), key=_key)
    expect = sorted((tuple(r) for r in duck.execute(sql).fetchall()), key=_key)
    assert got == expect, f"engines disagree on:\n{sql}"


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    jt=st.sampled_from(JOIN_TYPES),
    null_key=st.integers(min_value=1, max_value=500),
    threshold=st.integers(min_value=50_000, max_value=400_000),
)
def test_two_table_outer_join_null_keys(
    spark, tables, duck, jt, null_key, threshold
):
    """customer ⟗ orders with a minted NULL key on the customer side:
    NULL keys must never equi-match, yet must survive the preserved
    side(s) of LEFT/RIGHT/FULL — count(*) vs count(o_orderkey) per
    group pins exactly which rows were padded with NULLs."""
    sql = (
        f"WITH c AS (SELECT NULLIF(c_custkey, {null_key}) AS ck, c_mktsegment "
        f"           FROM customer), "
        f"     o AS (SELECT o_custkey, o_orderkey, "
        f"                  CAST(o_totalprice AS DECIMAL(18,2)) AS price "
        f"           FROM orders WHERE o_totalprice > {threshold}) "
        f"SELECT c_mktsegment, count(*) AS n, count(o_orderkey) AS n_matched, "
        f"       sum(price) AS total "
        f"FROM c {jt} JOIN o ON ck = o_custkey "
        f"GROUP BY c_mktsegment"
    )
    _both(spark, duck, sql)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    jt1=st.sampled_from(JOIN_TYPES),
    jt2=st.sampled_from(JOIN_TYPES),
    qty=st.integers(min_value=1, max_value=50),
)
def test_three_table_chain_mixed_outerness(spark, tables, duck, jt1, jt2, qty):
    """customer → orders → lineitem with independently random join
    types: left-to-right association over mixed outer-ness, where an
    inner second join can un-pad the first join's NULL rows. Counts of
    each table's key pin which padding survived."""
    sql = (
        f"SELECT c_mktsegment, count(*) AS n, "
        f"       count(o_orderkey) AS n_orders, count(l_orderkey) AS n_lines "
        f"FROM customer {jt1} JOIN orders ON c_custkey = o_custkey "
        f"{jt2} JOIN (SELECT l_orderkey, l_linenumber FROM lineitem "
        f"            WHERE l_quantity >= {qty}) l "
        f"  ON o_orderkey = l.l_orderkey "
        f"GROUP BY c_mktsegment"
    )
    _both(spark, duck, sql)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    in_on=st.booleans(),
    threshold=st.integers(min_value=50_000, max_value=400_000),
    jt=st.sampled_from(("LEFT", "INNER")),
)
def test_on_clause_vs_where_clause_predicate(
    spark, tables, duck, in_on, threshold, jt
):
    """The classic outer-join trap: a right-side predicate in the ON
    clause of a LEFT join filters only which rows MATCH (preserved rows
    stay, padded), while the same predicate in WHERE filters the result
    (turning the LEFT join into an INNER one). Both engines must draw
    the line in the same place for every (placement, join type)."""
    pred = f"o_totalprice > {threshold}"
    if in_on:
        sql = (
            f"SELECT c_mktsegment, count(*) AS n, count(o_orderkey) AS n_m "
            f"FROM customer {jt} JOIN orders "
            f"  ON c_custkey = o_custkey AND {pred} "
            f"GROUP BY c_mktsegment"
        )
    else:
        sql = (
            f"SELECT c_mktsegment, count(*) AS n, count(o_orderkey) AS n_m "
            f"FROM customer {jt} JOIN orders ON c_custkey = o_custkey "
            f"WHERE {pred} "
            f"GROUP BY c_mktsegment"
        )
    _both(spark, duck, sql)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    jt=st.sampled_from(JOIN_TYPES),
    nk=st.integers(min_value=0, max_value=24),
)
def test_composite_key_join_with_partial_nulls(spark, tables, duck, jt, nk):
    """Composite-key equi-join (nationkey, mktsegment-ish bucket) where
    ONE of the two key columns is minted NULL: a NULL in ANY key column
    must fail the conjunctive match on both engines, and outer padding
    must apply per-row, not per-key-column."""
    sql = (
        f"WITH a AS (SELECT NULLIF(c_nationkey, {nk}) AS k1, "
        f"                  c_mktsegment AS k2, c_custkey FROM customer), "
        f"     b AS (SELECT c_nationkey AS k1, c_mktsegment AS k2, "
        f"                  count(*) AS grp_n "
        f"           FROM customer GROUP BY c_nationkey, c_mktsegment) "
        f"SELECT a.k2 AS seg, count(*) AS n, count(b.grp_n) AS n_matched, "
        f"       CAST(sum(b.grp_n) AS BIGINT) AS weight "
        f"FROM a {jt} JOIN b ON a.k1 = b.k1 AND a.k2 = b.k2 "
        f"GROUP BY a.k2"
    )
    _both(spark, duck, sql)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    jt=st.sampled_from(("INNER", "LEFT")),
    k=st.integers(min_value=1, max_value=5),
    threshold=st.integers(min_value=100_000, max_value=400_000),
)
def test_window_over_outer_join_composition(spark, tables, duck, jt, k, threshold):
    """Ranking window OVER an outer-join result: padded NULL rows
    participate in the partition and must rank identically (NULLS LAST
    pinned explicitly — the portable spelling). Catches composition
    drift that single-operator differentials can't."""
    sql = (
        f"SELECT c_mktsegment, o_orderkey, rn FROM ("
        f"  SELECT c_mktsegment, o_orderkey,"
        f"         row_number() OVER ("
        f"           PARTITION BY c_mktsegment"
        f"           ORDER BY o_totalprice DESC NULLS LAST, o_orderkey NULLS LAST,"
        f"                    c_custkey) AS rn"
        f"  FROM customer {jt} JOIN orders"
        f"    ON c_custkey = o_custkey AND o_totalprice > {threshold}"
        f") t WHERE rn <= {k}"
    )
    _both(spark, duck, sql)
