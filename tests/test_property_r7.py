"""Property differentials for the round-7 window operators: random
sessionization gaps and random rolling-zscore windows, each mirrored
by the identical window SQL in DuckDB over the real events table."""

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
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF_DIR}/events.parquet')"
    )
    return con


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(gap=st.integers(min_value=30, max_value=48 * 3600))
def test_sessionize_any_gap_matches_duckdb(spark, tables, duck, gap):
    from distributedqueryengine_spark.operators.timeseries import sessionize

    ev = tables["events"].select("user_id", "event_id", "ts")
    got = sorted(
        (r.user_id, r.event_id, r.session_start, r.event_seq)
        for r in sessionize(
            ev, ["user_id"], "ts", gap, tiebreak=["event_id"]
        ).collect()
    )
    expect = sorted(
        tuple(r)
        for r in duck.execute(
            f"""
            WITH e AS (
              SELECT user_id, event_id, epoch_us(ts)//1000000 AS sec
              FROM events
            ), m AS (
              SELECT *, CASE WHEN lag(sec) OVER w IS NULL
                              OR sec - lag(sec) OVER w > {gap}
                         THEN 1 ELSE 0 END AS ns
              FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)
            ), r AS (
              SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY sec, event_id
                                      ROWS UNBOUNDED PRECEDING) AS sn
              FROM m
            )
            SELECT user_id, event_id,
                   min(sec) OVER (PARTITION BY user_id, sn) AS session_start,
                   CAST(row_number() OVER (PARTITION BY user_id, sn
                                           ORDER BY sec, event_id) AS INTEGER) AS event_seq
            FROM r
            """
        ).fetchall()
    )
    assert got == expect


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    window_rows=st.integers(min_value=2, max_value=50),
    min_points=st.integers(min_value=2, max_value=10),
)
def test_rolling_zscore_any_window_matches_duckdb(
    spark, tables, duck, window_rows, min_points
):
    from distributedqueryengine_spark.operators.timeseries import rolling_zscore

    mp = min(min_points, window_rows)
    ev = tables["events"].select("user_id", "event_id", "ts", "value")
    got = {
        (r.user_id, r.event_id): r.zscore
        for r in rolling_zscore(
            ev, ["user_id"], "ts", "value", window_rows, mp, tiebreak=["event_id"]
        ).collect()
    }
    expect = {
        (r[0], r[1]): r[2]
        for r in duck.execute(
            f"""
            SELECT user_id, event_id,
                   CASE WHEN count(value) OVER w >= {mp}
                         AND stddev_samp(value) OVER w > 0
                        THEN round((value - avg(value) OVER w)
                                   / stddev_samp(value) OVER w, 6)
                   END AS z
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN {window_rows} PRECEDING AND 1 PRECEDING)
            """
        ).fetchall()
    }
    assert got.keys() == expect.keys()
    for k, g in got.items():
        e = expect[k]
        if g is None or e is None:
            assert g == e, (k, g, e)
        else:
            assert abs(g - e) < 1e-6, (k, g, e)
