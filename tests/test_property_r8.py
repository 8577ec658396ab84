"""Round-8 differentials: TF-IDF top terms, Markov event transitions,
and RFM segmentation, each mirrored by the identical SQL in DuckDB
over the real fixture tables (documents / events / orders)."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("documents", "events", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    k=st.integers(min_value=1, max_value=8),
    min_df=st.integers(min_value=1, max_value=5),
)
def test_tfidf_top_terms_matches_duckdb(spark, tables, duck, k, min_df):
    """Random (k, min_df) through tfidf_top_terms over the documents
    table vs the identical smoothed-idf SQL in DuckDB — full value
    check including the deterministic tie-broken ranking."""
    from distributedqueryengine_spark.functions.text import tfidf_top_terms

    docs = tables["documents"].select("doc_id", "text")
    got = sorted(
        (r.doc_id, r.term, r.tf, r.df, r.tfidf, r.rnk)
        for r in tfidf_top_terms(docs, "text", "doc_id", k=k, min_df=min_df).collect()
    )
    expect = sorted(
        tuple(r)
        for r in duck.execute(
            f"""
            WITH tok AS (
              SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
              FROM documents
            ), per_doc AS (
              SELECT doc_id AS id, term, count(*) AS tf
              FROM tok WHERE length(term) > 0 GROUP BY 1, 2
            ), docfreq AS (
              SELECT term, count(*) AS df FROM per_doc GROUP BY 1
            ), n AS (
              SELECT count(DISTINCT doc_id) AS nd FROM documents
            ), scored AS (
              SELECT p.id, p.term, p.tf, d.df,
                     round(p.tf * (ln((1 + n.nd) / (1 + d.df)) + 1.0), 6) AS tfidf
              FROM per_doc p JOIN docfreq d USING (term), n
              WHERE d.df >= {min_df}
            ), ranked AS (
              SELECT *, CAST(row_number() OVER (
                  PARTITION BY id ORDER BY tfidf DESC, term ASC
              ) AS INTEGER) AS rnk
              FROM scored
            )
            SELECT id AS doc_id, term, tf, df, tfidf, rnk
            FROM ranked WHERE rnk <= {k}
            """
        ).fetchall()
    )
    assert [g[:4] + g[5:] for g in got] == [e[:4] + e[5:] for e in expect]
    assert all(abs(g[4] - e[4]) <= 1e-6 for g, e in zip(got, expect))


def test_event_transitions_matches_duckdb(spark, tables, duck):
    """First-order transition matrix over real event sequences vs the
    DuckDB lead-window mirror, with and without terminal rows; each
    from_event's outgoing p sums to 1."""
    from distributedqueryengine_spark.operators.timeseries import event_transitions

    ev = tables["events"].select("user_id", "event_id", "ts", "event_type")
    for terminal in (False, True):
        got = list(
            (r.from_event, r.to_event, r.n, r.p)
            for r in event_transitions(
                ev, ["user_id"], "ts", "event_type",
                tiebreak=["event_id"], include_terminal=terminal,
            ).collect()
        )
        where = "" if terminal else "WHERE to_event IS NOT NULL"
        expect = list(
            tuple(r)
            for r in duck.execute(
                f"""
                WITH paired AS (
                  SELECT event_type AS from_event,
                         lead(event_type) OVER (
                             PARTITION BY user_id ORDER BY ts, event_id
                         ) AS to_event
                  FROM events
                ), counts AS (
                  SELECT from_event, to_event, count(*) AS n
                  FROM paired {where} GROUP BY 1, 2
                )
                SELECT from_event, to_event, n,
                       round(n / CAST(sum(n) OVER (PARTITION BY from_event) AS DOUBLE), 6) AS p
                FROM counts
                """
            ).fetchall()
        )

        def nkey(t):
            return tuple((v is None, v) for v in t[:2])

        got = sorted(got, key=nkey)
        expect = sorted(expect, key=nkey)
        assert [g[:3] for g in got] == [e[:3] for e in expect], terminal
        assert all(abs(g[3] - e[3]) <= 1e-6 for g, e in zip(got, expect))
        # outgoing probabilities sum to 1 per from_event
        sums: dict = {}
        for f_ev, _t, _n, p in got:
            sums[f_ev] = sums.get(f_ev, 0.0) + p
        assert all(abs(s - 1.0) < 1e-4 for s in sums.values()), sums


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(n_bins=st.integers(min_value=2, max_value=10))
def test_rfm_segments_matches_duckdb(spark, tables, duck, n_bins):
    """Random bin counts through rfm_segments over orders vs the DuckDB
    ntile mirror — identical metrics, scores, and segment labels under
    the deterministic (metric, key) ordering."""
    from distributedqueryengine_spark.operators.aggregates import rfm_segments

    orders = tables["orders"].select("o_custkey", "o_orderdate", "o_totalprice")
    got = sorted(
        (r.o_custkey, r.recency_seconds, r.frequency,
         round(r.monetary, 2), r.r_score, r.f_score, r.m_score, r.segment)
        for r in rfm_segments(
            orders, "o_custkey", "o_orderdate", "o_totalprice", n_bins=n_bins
        ).collect()
    )
    expect = sorted(
        tuple(r)
        for r in duck.execute(
            f"""
            WITH per_key AS (
              SELECT o_custkey AS key,
                     max(epoch(CAST(o_orderdate AS TIMESTAMP))) AS last_ts,
                     count(*) AS frequency,
                     sum(o_totalprice) AS monetary
              FROM orders GROUP BY 1
            ), anchored AS (
              SELECT *, (SELECT max(last_ts) FROM per_key) - last_ts AS recency_seconds
              FROM per_key
            ), scored AS (
              SELECT key, recency_seconds, frequency, monetary,
                     CAST(ntile({n_bins}) OVER (ORDER BY recency_seconds DESC, key ASC) AS INTEGER) AS r_score,
                     CAST(ntile({n_bins}) OVER (ORDER BY frequency ASC, key ASC) AS INTEGER) AS f_score,
                     CAST(ntile({n_bins}) OVER (ORDER BY monetary ASC, key ASC) AS INTEGER) AS m_score
              FROM anchored
            )
            SELECT key, recency_seconds, frequency, round(monetary, 2),
                   r_score, f_score, m_score,
                   r_score || '-' || f_score || '-' || m_score AS segment
            FROM scored
            """
        ).fetchall()
    )
    assert got == expect
