"""Randomized cross-engine differentials for the round-10 additions:
Bloom word tables / probe verdicts, KMV states, and association rules
on hypothesis-generated inputs — the same discipline as
test_property_stats.py (fixed fixtures prove the happy path; random
shapes prove the implementation, not the example)."""
from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from distributedqueryengine_spark.functions.bloom import (
    bloom_build,
    bloom_probe,
)
from distributedqueryengine_spark.operators.aggregates import kmv_build

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**_SETTINGS)
@given(
    vals=st.sets(st.integers(min_value=-10_000, max_value=10_000),
                 min_size=1, max_size=40),
    n_bits=st.sampled_from([512, 1024, 4096]),
    k=st.integers(min_value=1, max_value=6),
)
def test_bloom_words_and_verdicts_match_duckdb(spark, vals, n_bits, k):
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got_words = sorted(
        (r.word_idx, r.word)
        for r in bloom_build(df, "v", n_bits, k, portable=True).collect()
    )
    vlist = ",".join(f"({v})" for v in vals)
    con = duckdb.connect()
    want_words = con.execute(f"""
        SELECT p // 32 AS wi, bit_or(1::BIGINT << CAST(p % 32 AS INT)) AS w
        FROM (SELECT CAST('0x' || substr(md5(CAST(v AS VARCHAR) || '#'
                          || CAST(i AS VARCHAR)), 1, 15) AS BIGINT)
                     % {n_bits} AS p
              FROM (VALUES {vlist}) t(v) CROSS JOIN range({k}) r(i))
        GROUP BY 1 ORDER BY 1
    """).fetchall()
    assert got_words == [tuple(r) for r in want_words]

    # probe verdicts over a fixed surrounding range match the SQL bloom
    probe = spark.createDataFrame(
        [(v,) for v in range(-50, 51)], "v long"
    )
    st_df = bloom_build(df, "v", n_bits, k, portable=True)
    got_pass = sorted(
        r.v for r in bloom_probe(
            st_df, probe, "v", n_bits, k, portable=True
        ).where("bloom_pass").collect()
    )
    want_pass = [r[0] for r in con.execute(f"""
        WITH words AS (
          SELECT p // 32 AS wi, bit_or(1::BIGINT << CAST(p % 32 AS INT)) AS w
          FROM (SELECT CAST('0x' || substr(md5(CAST(v AS VARCHAR) || '#'
                            || CAST(i AS VARCHAR)), 1, 15) AS BIGINT)
                       % {n_bits} AS p
                FROM (VALUES {vlist}) t(v) CROSS JOIN range({k}) r(i))
          GROUP BY 1)
        SELECT pv FROM (
          SELECT pp.pv,
                 min(CASE WHEN (COALESCE(w.w, 0)
                            & (1::BIGINT << CAST(pp.p % 32 AS INT))) <> 0
                          THEN 1 ELSE 0 END) AS pass
          FROM (SELECT t.pv,
                       CAST('0x' || substr(md5(CAST(t.pv AS VARCHAR) || '#'
                            || CAST(i AS VARCHAR)), 1, 15) AS BIGINT)
                       % {n_bits} AS p
                FROM range(-50, 51) t(pv) CROSS JOIN range({k}) r(i)) pp
          LEFT JOIN words w ON w.wi = pp.p // 32
          GROUP BY 1) WHERE pass = 1 ORDER BY 1
    """).fetchall()]
    assert got_pass == want_pass
    assert set(vals) & set(range(-50, 51)) <= set(got_pass)  # no false neg


@settings(**_SETTINGS)
@given(
    vals=st.lists(st.integers(min_value=0, max_value=5_000),
                  min_size=1, max_size=300),
    k=st.sampled_from([4, 16, 64]),
)
def test_kmv_state_matches_duckdb(spark, vals, k):
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = kmv_build(df, [], "v", k=k, portable=True).collect()[0].kmin
    vlist = ",".join(f"({v})" for v in vals)
    want = [r[0] for r in duckdb.connect().execute(f"""
        SELECT DISTINCT CAST('0x' || substr(md5(CAST(v AS VARCHAR)), 1, 15)
                        AS BIGINT) AS h
        FROM (VALUES {vlist}) t(v) ORDER BY h LIMIT {k}
    """).fetchall()]
    assert got == want


@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(st.integers(min_value=1, max_value=12),
                  st.sampled_from(list("abcdefg"))),
        min_size=2, max_size=120,
    ),
    min_pair=st.integers(min_value=1, max_value=3),
)
def test_association_rules_match_duckdb(spark, rows, min_pair):
    from distributedqueryengine_spark.operators.association import (
        association_rules,
    )

    df = spark.createDataFrame(rows, "bk int, item string")
    got = sorted(
        tuple(r)
        for r in association_rules(
            df, "bk", "item", min_pair_count=min_pair
        ).collect()
    )
    vlist = ",".join(f"({b},'{i}')" for b, i in rows)
    want = sorted(tuple(r) for r in duckdb.connect().execute(f"""
        WITH pres AS (SELECT DISTINCT bk AS b, item AS i
                      FROM (VALUES {vlist}) t(bk, item)),
        nb AS (SELECT count(DISTINCT b) AS n FROM pres),
        ic AS (SELECT i, count(*) AS n_item FROM pres GROUP BY i),
        up AS (SELECT a.i AS ia, c.i AS ib, count(*) AS n_both
               FROM pres a JOIN pres c ON a.b = c.b AND a.i < c.i
               GROUP BY 1, 2 HAVING count(*) >= {min_pair}),
        dirp AS (SELECT ia AS antecedent, ib AS consequent, n_both FROM up
                 UNION ALL SELECT ib, ia, n_both FROM up)
        SELECT antecedent, consequent,
               CAST(na.n_item AS BIGINT), CAST(nc.n_item AS BIGINT),
               CAST(n_both AS BIGINT),
               round(n_both / (SELECT n FROM nb), 6),
               round(n_both / na.n_item, 6),
               round((n_both / na.n_item) / (nc.n_item / (SELECT n FROM nb)), 6)
        FROM dirp
        JOIN ic na ON na.i = antecedent
        JOIN ic nc ON nc.i = consequent
    """).fetchall())
    assert got == want
