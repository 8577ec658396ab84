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


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    k=st.integers(min_value=2, max_value=4),
    within=st.one_of(st.none(), st.integers(min_value=600, max_value=86400)),
    seed=st.integers(min_value=0, max_value=10_000),
)
def test_funnel_random_configs_match_reference(spark, tables, k, within, seed):
    """Random step subsets/orders and windows vs the driver-side greedy
    reference over real events."""
    import random

    from distributedqueryengine_spark.operators.timeseries import funnel

    ev = tables["events"].select("user_id", "ts", "event_type")
    present = sorted(
        r.event_type for r in ev.select("event_type").distinct().collect()
    )
    def nsort(ts):
        return sorted(ts, key=lambda t: tuple((v is None, v) for v in t))

    rng = random.Random(seed)
    steps = rng.sample(present, min(k, len(present)))

    def ref(events):
        times = [None] * len(steps)
        for t, s in sorted(events):
            for i, name in enumerate(steps):
                if times[i] is None and s == name:
                    prev_ok = i == 0 or (
                        times[i - 1] is not None and t >= times[i - 1]
                    )
                    win_ok = (
                        within is None
                        or i == 0
                        or (times[0] is not None and t - times[0] <= within)
                    )
                    if prev_ok and win_ok:
                        times[i] = t
                    break
        return times

    raw = ev.filter(F.col("event_type").isin(steps)).collect()
    by_user: dict = {}
    for r in raw:
        by_user.setdefault(r.user_id, []).append(
            (int(r.ts.timestamp()), r.event_type)
        )
    got = {
        r.user_id: list(r.step_times)
        for r in funnel(
            ev, "user_id", "ts", "event_type", steps, within_seconds=within
        ).collect()
    }
    assert set(got) == set(by_user)
    for u, evs in by_user.items():
        assert got[u] == ref(evs), (u, steps, within)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lo=st.floats(min_value=0.0, max_value=0.4),
    hi=st.floats(min_value=0.6, max_value=1.0),
)
def test_winsorize_random_bounds_match_duckdb(spark, tables, duck, lo, hi):
    from distributedqueryengine_spark.operators.aggregates import winsorize

    duck.execute(
        f"CREATE VIEW IF NOT EXISTS lineitem AS "
        f"SELECT * FROM read_parquet('{SF_DIR}/lineitem.parquet')"
    )
    li = tables["lineitem"].select("l_returnflag", "l_extendedprice")
    got = {
        r.l_returnflag: round(r.s, 2)
        for r in winsorize(li, ["l_extendedprice"], lo, hi, by=["l_returnflag"])
        .groupBy("l_returnflag")
        .agg(F.sum("l_extendedprice").alias("s"))
        .collect()
    }
    expect = {
        r[0]: round(r[1], 2)
        for r in duck.execute(
            f"""
            WITH b AS (
              SELECT l_returnflag,
                     quantile_cont(l_extendedprice, {lo}) AS plo,
                     quantile_cont(l_extendedprice, {hi}) AS phi
              FROM lineitem GROUP BY l_returnflag)
            SELECT l.l_returnflag,
                   sum(least(greatest(l_extendedprice, plo), phi)) AS s
            FROM lineitem l JOIN b USING (l_returnflag)
            GROUP BY l.l_returnflag
            """
        ).fetchall()
    }
    assert got == expect, (lo, hi)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    n_keys=st.integers(min_value=1, max_value=12),
    rows_per_key=st.integers(min_value=1, max_value=20),
    ts_range=st.integers(min_value=1, max_value=15),  # small → tie collisions
    attr_alphabet=st.integers(min_value=1, max_value=3),  # small → no-op density
    null_pct=st.integers(min_value=0, max_value=40),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_scd2_random_changelog_matches_duckdb(
    spark, duck, n_keys, rows_per_key, ts_range, attr_alphabet, null_pct, seed
):
    """Random change-log shapes (key cardinality, timestamp-tie
    collisions, no-op density, NULL attributes) through
    scd2_from_changes vs the identical DuckDB window SQL — compaction
    (NULL-safe attr comparison) + [valid_from, valid_to) + version."""
    import random

    from distributedqueryengine_spark.operators.cdc import scd2_from_changes

    def nsort(ts):
        return sorted(ts, key=lambda t: tuple((v is None, v) for v in t))

    rng = random.Random(seed)
    rows = []
    rid = 0
    for k in range(n_keys):
        for _ in range(rows_per_key):
            rid += 1
            a = (
                None
                if rng.randrange(100) < null_pct
                else f"v{rng.randrange(attr_alphabet)}"
            )
            b = rng.randrange(attr_alphabet)
            rows.append((k, rng.randrange(ts_range), rid, a, b))
    df = spark.createDataFrame(
        rows, "k long, ts long, rid long, a string, b long"
    )
    got = nsort(
        (r.k, r.a, r.b, r.valid_from, r.valid_to, r.is_current, r.version)
        for r in scd2_from_changes(
            df, ["k"], "ts", ["a", "b"], tiebreak=["rid"]
        ).collect()
    )
    duck.register("chg_prop", df.toPandas())
    try:
        expect = nsort(
            tuple(r)
            for r in duck.execute(
                """
                WITH o AS (
                  SELECT *, row_number() OVER w AS rn,
                         lag(a) OVER w AS pa, lag(b) OVER w AS pb
                  FROM chg_prop WINDOW w AS (PARTITION BY k ORDER BY ts, rid)
                ), kept AS (
                  SELECT k, ts, rid, a, b FROM o
                  WHERE rn = 1 OR (a IS DISTINCT FROM pa) OR (b IS DISTINCT FROM pb)
                )
                SELECT k, a, b, ts AS valid_from,
                       lead(ts) OVER w AS valid_to,
                       lead(ts) OVER w IS NULL AS is_current,
                       CAST(row_number() OVER w AS INTEGER) AS version
                FROM kept WINDOW w AS (PARTITION BY k ORDER BY ts, rid)
                """
            ).fetchall()
        )
    finally:
        duck.unregister("chg_prop")
    assert got == expect


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(period=st.integers(min_value=600, max_value=30 * 86400))
def test_cohort_retention_random_period_matches_duckdb(spark, tables, duck, period):
    """Random cohort period sizes through cohort_retention over the real
    events table vs the DuckDB mirror (distinct activity → min-period
    cohort → offset matrix → retention ratio)."""
    from distributedqueryengine_spark.operators.timeseries import cohort_retention

    ev = tables["events"].select("user_id", "ts")
    got = sorted(
        (r.cohort_period, r.periods_since, r.n_active, r.n_cohort, r.retention)
        for r in cohort_retention(ev, "user_id", "ts", period).collect()
    )
    expect = sorted(
        tuple(r)
        for r in duck.execute(
            f"""
            WITH activity AS (
              SELECT DISTINCT user_id AS u,
                     (epoch_us(ts)//1000000) // {period} AS p
              FROM events
            ), cohorts AS (
              SELECT u, min(p) AS cp FROM activity GROUP BY u
            ), sizes AS (
              SELECT cp, count(*) AS n_cohort FROM cohorts GROUP BY cp
            ), m AS (
              SELECT c.cp, a.p - c.cp AS ps, count(*) AS n_active
              FROM activity a JOIN cohorts c ON a.u = c.u
              GROUP BY 1, 2
            )
            SELECT m.cp * {period} AS cohort_period,
                   CAST(m.ps AS INTEGER) AS periods_since,
                   m.n_active, s.n_cohort,
                   round(m.n_active / CAST(s.n_cohort AS DOUBLE), 6) AS retention
            FROM m JOIN sizes s ON m.cp = s.cp
            """
        ).fetchall()
    )
    assert [g[:4] for g in got] == [e[:4] for e in expect]
    assert all(abs(g[4] - e[4]) <= 1e-6 for g, e in zip(got, expect))
