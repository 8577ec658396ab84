"""KMV distinct sketch: exact-below-k, estimator accuracy, merge ≡
direct (bit-identical), DuckDB state equality in portable mode, and
Jaccard/intersection overlap estimates."""
from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from distributedqueryengine_spark.operators.aggregates import (
    kmv_build,
    kmv_estimate,
    kmv_merge,
    kmv_overlap,
)

SF_DIR = "/root/testdata/sf0.001"


def test_exact_below_k(spark):
    df = spark.createDataFrame([(i % 37,) for i in range(500)], "v int")
    st = kmv_build(df, [], "v", k=256)
    est = kmv_estimate(st, []).collect()[0]
    assert est.n_distinct_est == 37.0


def test_estimator_accuracy(spark):
    n = 20_000
    df = spark.range(n).select(F.col("id").alias("v"))
    st = kmv_build(df, [], "v", k=512)
    est = kmv_estimate(st, []).collect()[0].n_distinct_est
    assert abs(est - n) / n < 0.15  # ~4.5σ at 1/sqrt(510)


def test_grouped_and_merge_equals_direct(spark, tables):
    orders = tables["orders"]
    st_direct = kmv_build(orders, ["o_orderstatus"], "o_custkey", k=64)
    # fine grain: per (status, priority) states, merged up to status
    st_fine = kmv_build(
        orders, ["o_orderstatus", "o_orderpriority"], "o_custkey", k=64
    )
    st_merged = kmv_merge([st_fine.drop("o_orderpriority")], ["o_orderstatus"])
    a = {r.o_orderstatus: (r.kmin, r.k) for r in st_direct.collect()}
    b = {r.o_orderstatus: (r.kmin, r.k) for r in st_merged.collect()}
    assert a == b  # bit-identical


def test_duckdb_state_equality_portable(spark, tables):
    st = kmv_build(tables["orders"], [], "o_custkey", k=128, portable=True)
    got = st.collect()[0].kmin
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/orders.parquet')"
    )
    want = [r[0] for r in con.execute("""
        SELECT DISTINCT CAST('0x' || substr(md5(CAST(o_custkey AS VARCHAR)),
                             1, 15) AS BIGINT) AS h
        FROM orders WHERE o_custkey IS NOT NULL
        ORDER BY h LIMIT 128
    """).fetchall()]
    assert got == want


def test_overlap_estimates(spark):
    # A = [0, 10000), B = [5000, 15000): J = 1/3, union 15000, inter 5000
    a = kmv_build(
        spark.range(10_000).select(F.col("id").alias("v")), [], "v", k=512
    )
    b = kmv_build(
        spark.range(5_000, 15_000).select(F.col("id").alias("v")), [], "v",
        k=512,
    )
    r = kmv_overlap(a, b).collect()[0]
    assert abs(r.jaccard - 1 / 3) < 0.08
    assert abs(r.n_union_est - 15_000) / 15_000 < 0.15
    assert abs(r.n_intersect_est - 5_000) / 5_000 < 0.25


def test_overlap_mismatched_k_raises(spark):
    a = kmv_build(spark.range(100).select(F.col("id").alias("v")), [], "v", k=64)
    b = kmv_build(spark.range(100).select(F.col("id").alias("v")), [], "v", k=32)
    with pytest.raises(Exception, match="different k"):
        kmv_overlap(a, b).collect()


def test_bad_k_raises(spark):
    df = spark.range(10).select(F.col("id").alias("v"))
    with pytest.raises(ValueError, match="k must be"):
        kmv_build(df, [], "v", k=1)


def test_prefilter_engaged_exact_vs_duckdb(spark):
    """20k distinct values with k=64 engages the rank-threshold
    pre-filter (8k=512 << 20k); the state must still equal the
    unfiltered DuckDB bottom-k exactly."""
    df = spark.range(20_000).select(F.col("id").alias("v"))
    got = kmv_build(df, [], "v", k=64, portable=True).collect()[0].kmin
    want = [r[0] for r in duckdb.connect().execute("""
        SELECT DISTINCT CAST('0x' || substr(md5(CAST(v AS VARCHAR)), 1, 15)
                        AS BIGINT) AS h
        FROM range(20000) t(v) ORDER BY h LIMIT 64
    """).fetchall()]
    assert got == want


def test_overlap_matrix_vs_exact(spark, tables):
    """Pairwise event-type user overlap from KMV states tracks the
    exact pairwise Jaccard within the sketch error envelope."""
    from distributedqueryengine_spark.operators.aggregates import (
        kmv_overlap_matrix,
    )

    ev = tables["events"].select("event_type", "user_id")
    st = kmv_build(ev, ["event_type"], "user_id", k=256)
    got = {
        (r.a_event_type, r.b_event_type): r.jaccard
        for r in kmv_overlap_matrix(st, ["event_type"]).collect()
    }
    assert len(got) >= 3  # at least 3 type pairs in the fixture
    pres = ev.distinct()
    sets = {
        r.event_type: set()
        for r in pres.select("event_type").distinct().collect()
    }
    for r in pres.collect():
        sets[r.event_type].add(r.user_id)
    for (ta, tb), j in got.items():
        exact = len(sets[ta] & sets[tb]) / len(sets[ta] | sets[tb])
        assert abs(j - exact) < 0.2, (ta, tb, j, exact)


def test_overlap_matrix_needs_keys(spark):
    from distributedqueryengine_spark.operators.aggregates import (
        kmv_overlap_matrix,
    )
    df = spark.range(10).select(F.col("id").alias("v"))
    st = kmv_build(df, [], "v", k=16)
    with pytest.raises(ValueError, match="grouped"):
        kmv_overlap_matrix(st, [])


def test_overlap_matrix_multicol_boundary_keys(spark):
    """Multi-column keys with concat-boundary collisions — ('ab','c')
    vs ('a','bc') — must still emit one row per distinct unordered
    pair (the guard compares a struct, not a delimiterless concat)."""
    from distributedqueryengine_spark.operators.aggregates import (
        kmv_overlap_matrix,
    )

    rows = []
    for g1, g2 in [("ab", "c"), ("a", "bc"), ("x", "y")]:
        rows += [{"g1": g1, "g2": g2, "v": i} for i in range(40)]
    df = spark.createDataFrame(rows)
    st = kmv_build(df, ["g1", "g2"], "v", k=32)
    assert st.count() == 3
    out = kmv_overlap_matrix(st, ["g1", "g2"]).collect()
    pairs = {
        frozenset([(r.a_g1, r.a_g2), (r.b_g1, r.b_g2)]) for r in out
    }
    # 3 groups -> C(3,2) = 3 unordered pairs, including the colliding one
    assert len(out) == 3 and len(pairs) == 3
    assert frozenset([("ab", "c"), ("a", "bc")]) in pairs
