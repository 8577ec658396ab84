"""Gap-filled resampling tests (operators/timeseries.py): driver-side
reference over synthetic sparse series + real events, all three fill
policies, and the grid-size guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributedqueryengine_spark.operators.timeseries import resample_fill


def _mk(spark):
    rows = [
        # key A: observations at +0, +120, +360 from an aligned base
        ("A", 1_700_000_040, 10.0),
        ("A", 1_700_000_045, 20.0),      # same bucket as first (60s)
        ("A", 1_700_000_160, 7.0),
        ("A", 1_700_000_400, 1.0),
        # key B: single observation
        ("B", 1_700_000_100, 5.0),
    ]
    return spark.createDataFrame(rows, "k string, epoch long, v double").select(
        "k", F.timestamp_seconds("epoch").alias("ts"), "v"
    )


def test_resample_fill_policies_match_reference(spark):
    df = _mk(spark)
    base = 1_700_000_040
    expect_buckets_a = [base + i * 60 for i in range(7)]  # 0..360

    for fill in ("null", "zero", "ffill"):
        out = resample_fill(
            df, ["k"], "ts", 60, {"s": F.sum("v"), "n": F.count(F.lit(1))}, fill=fill
        ).collect()
        a = {r.bucket_ts: r for r in out if r.k == "A"}
        assert sorted(a) == expect_buckets_a  # complete, regular grid
        # observed buckets keep their aggregates under every policy
        assert a[base].s == 30.0 and a[base].n == 2 and a[base].observed
        assert a[base + 120].s == 7.0 and a[base + 120].observed
        assert a[base + 360].s == 1.0
        gap = a[base + 60]
        assert not gap.observed
        if fill == "null":
            assert gap.s is None and gap.n is None
        elif fill == "zero":
            assert gap.s == 0.0 and gap.n == 0
        else:  # ffill carries bucket-0 values forward
            assert gap.s == 30.0 and gap.n == 2
            assert a[base + 180].s == 7.0  # last observed before the gap
        # key B: single bucket, no gaps fabricated beyond its span
        b = [r for r in out if r.k == "B"]
        assert len(b) == 1 and b[0].s == 5.0 and b[0].observed


def test_resample_fill_on_real_events(spark, tables):
    """Hourly resample of events per event_type: observed buckets must
    equal a direct groupBy, the grid must be hole-free and monotone."""
    ev = tables["events"].select("event_type", "ts", "value")
    out = resample_fill(
        ev, ["event_type"], "ts", 3600, {"total": F.sum("value")}, fill="ffill"
    ).persist()
    direct = {
        (r.event_type, r.b): round(r.t, 6)
        for r in ev.groupBy(
            "event_type",
            (F.floor(F.unix_timestamp("ts") / 3600) * 3600).cast("long").alias("b"),
        )
        .agg(F.sum("value").alias("t"))
        .collect()
    }
    rows = out.collect()
    got_observed = {
        (r.event_type, r.bucket_ts): round(r.total, 6)
        for r in rows
        if r.observed
    }
    assert got_observed == direct
    # hole-free per key
    by_key: dict = {}
    for r in rows:
        by_key.setdefault(r.event_type, []).append(r.bucket_ts)
    for k, ts in by_key.items():
        ts = sorted(ts)
        assert ts == list(range(ts[0], ts[-1] + 3600, 3600)), k
        # ffill: no NULLs after the first observed bucket
    out.unpersist()


def test_resample_guards(spark):
    df = _mk(spark)
    with pytest.raises(ValueError, match="fill must be"):
        resample_fill(df, ["k"], "ts", 60, {"s": F.sum("v")}, fill="bogus")
    with pytest.raises(ValueError, match="positive"):
        resample_fill(df, ["k"], "ts", 0, {"s": F.sum("v")})
    # the grid-size guard is IN-PLAN (raise_error): construction is lazy
    # and runs ZERO jobs; the error fires on materialization.
    sc = spark.sparkContext
    sc.setJobGroup("resample_guard_probe", "probe construction laziness")
    lazy = resample_fill(
        df, ["k"], "ts", 1, {"s": F.sum("v")}, max_buckets_per_key=100
    )
    assert list(sc.statusTracker().getJobIdsForGroup("resample_guard_probe")) == []
    sc.setJobGroup("resample_guard_fire", "materialize")
    with pytest.raises(Exception, match="buckets"):
        lazy.collect()


def test_sessionize_matches_duckdb(spark, tables):
    """Row-level sessionization over real events vs the equivalent
    DuckDB window SQL (lag + conditional cumsum), 30-min gap."""
    import duckdb

    from distributedqueryengine_spark.operators.timeseries import sessionize

    ev = tables["events"].select("user_id", "event_id", "ts")
    got = sorted(
        (r.user_id, r.event_id, r.session_start, r.event_seq)
        for r in sessionize(
            ev, ["user_id"], "ts", 1800, tiebreak=["event_id"]
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/events.parquet')"
    )
    expect = sorted(
        tuple(r)
        for r in con.execute(
            """
            WITH e AS (
              SELECT user_id, event_id,
                     epoch_us(ts)//1000000 AS sec
              FROM events
            ), m AS (
              SELECT *, CASE WHEN lag(sec) OVER w IS NULL
                              OR sec - lag(sec) OVER w > 1800
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


def test_sessionize_invariants(spark):
    from distributedqueryengine_spark.operators.timeseries import sessionize

    base = 1_700_000_000
    rows = [
        ("u", base), ("u", base + 100), ("u", base + 100),  # dup ts
        ("u", base + 2000),                                  # > gap → new
        ("u", base + 2100), ("u", base + 5000),              # > gap → new
        ("v", base + 50),
    ]
    df = spark.createDataFrame(
        [(k, i, t) for i, (k, t) in enumerate(rows)], "k string, i long, ep long"
    ).select("k", "i", F.timestamp_seconds("ep").alias("ts"))
    out = sessionize(df, ["k"], "ts", 1000, tiebreak=["i"]).collect()
    sessions = {}
    for r in out:
        sessions.setdefault(r.session_id, []).append(r)
    # u splits into 3 sessions; v has 1
    assert len([s for s in sessions if s.startswith("u|")]) == 3
    assert len([s for s in sessions if s.startswith("v|")]) == 1
    for sid, members in sessions.items():
        eps = sorted(F and m.session_start for m in members)
        secs = sorted(
            int(m.ts.timestamp()) for m in members
        )
        assert min(secs) == members[0].session_start
        # intra-session gaps <= gap
        assert all(b - a <= 1000 for a, b in zip(secs, secs[1:]))
        # event_seq is 1..n
        assert sorted(m.event_seq for m in members) == list(
            range(1, len(members) + 1)
        )


def test_cohort_retention_matches_duckdb(spark, tables):
    """Weekly cohort retention over real events vs the same logic in
    DuckDB SQL; offset-0 retention is 1.0 for every cohort."""
    import duckdb

    from distributedqueryengine_spark.operators.timeseries import (
        cohort_retention,
    )

    ev = tables["events"].select("user_id", "ts")
    week = 7 * 86400
    got = sorted(
        (r.cohort_period, r.periods_since, r.n_active, r.n_cohort, r.retention)
        for r in cohort_retention(ev, "user_id", "ts", week).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/events.parquet')"
    )
    expect = sorted(
        tuple(r)
        for r in con.execute(
            f"""
            WITH act AS (
              SELECT DISTINCT user_id AS u,
                     epoch_us(ts)//1000000//{week} AS p
              FROM events),
            coh AS (SELECT u, min(p) AS cp FROM act GROUP BY u),
            sizes AS (SELECT cp, count(*) AS n_cohort FROM coh GROUP BY cp),
            m AS (
              SELECT cp, p - cp AS ps, count(*) AS n_active
              FROM act JOIN coh USING (u) GROUP BY cp, p - cp)
            SELECT cp * {week} AS cohort_period,
                   CAST(ps AS INTEGER) AS periods_since,
                   n_active, n_cohort,
                   round(CAST(n_active AS DOUBLE) / n_cohort, 6) AS retention
            FROM m JOIN sizes USING (cp)
            """
        ).fetchall()
    )
    assert got == expect
    zero = [r for r in got if r[1] == 0]
    assert zero and all(r[4] == 1.0 for r in zero)
    assert {r[0] for r in got}  # at least one cohort


def _ref_funnel(events, steps, within=None):
    """Driver-side greedy earliest-match reference. events: sorted
    [(t, s)]; returns step-time list (None from first miss)."""
    times = [None] * len(steps)
    for t, s in sorted(events):
        for i, name in enumerate(steps):
            if times[i] is None and s == name:
                prev_ok = i == 0 or (times[i - 1] is not None and t >= times[i - 1])
                win_ok = (
                    within is None
                    or i == 0
                    or (times[0] is not None and t - times[0] <= within)
                )
                if prev_ok and win_ok:
                    times[i] = t
                break  # each event fills at most its own first-empty slot? no: matches its step only
    return times


def test_funnel_matches_reference_on_events(spark, tables):
    """Funnel view→click→purchase-style over the real events table
    (using its actual event_type values) vs the driver-side greedy
    reference, with and without a time window."""
    from distributedqueryengine_spark.operators.timeseries import (
        funnel,
        funnel_counts,
    )

    ev = tables["events"].select("user_id", "ts", "event_type")
    present = [r.event_type for r in ev.select("event_type").distinct().collect()]
    assert len(present) >= 3
    steps = sorted(present)[:3]

    raw = ev.filter(F.col("event_type").isin(steps)).collect()
    by_user: dict = {}
    for r in raw:
        by_user.setdefault(r.user_id, []).append(
            (int(r.ts.timestamp()), r.event_type)
        )

    for within in (None, 6 * 3600):
        out = funnel(
            ev, "user_id", "ts", "event_type", steps, within_seconds=within
        ).collect()
        got = {r.user_id: list(r.step_times) for r in out}
        assert set(got) == set(by_user)
        for u, evs in by_user.items():
            assert got[u] == _ref_funnel(evs, steps, within), (u, within)
        # max_step == non-null prefix length
        for r in out:
            ts = list(r.step_times)
            n = 0
            for t in ts:
                if t is None:
                    break
                n += 1
            assert r.max_step == n == sum(1 for t in ts if t is not None)

        fc = funnel_counts(
            funnel(ev, "user_id", "ts", "event_type", steps, within_seconds=within),
            len(steps),
        ).collect()
        ns = [r.n_keys for r in sorted(fc, key=lambda r: r.step)]
        assert ns[0] >= ns[1] >= ns[2]  # monotone funnel
        assert sorted(fc, key=lambda r: r.step)[0].conversion == 1.0


def test_rolling_zscore_matches_duckdb(spark, tables):
    """Rolling z-score over real events vs the identical window SQL in
    DuckDB (preceding-rows frame, self-excluded, min_points gate)."""
    import duckdb

    from distributedqueryengine_spark.operators.timeseries import rolling_zscore

    ev = tables["events"].select("user_id", "event_id", "ts", "value")
    got = sorted(
        (r.user_id, r.event_id, r.zscore)
        for r in rolling_zscore(
            ev, ["user_id"], "ts", "value", window_rows=10, min_points=5,
            tiebreak=["event_id"],
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/events.parquet')"
    )
    expect = sorted(
        tuple(r)
        for r in con.execute(
            """
            SELECT user_id, event_id,
                   CASE WHEN count(value) OVER w >= 5
                         AND stddev_samp(value) OVER w > 0
                        THEN round((value - avg(value) OVER w)
                                   / stddev_samp(value) OVER w, 6)
                   END AS z
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)
            """
        ).fetchall()
    )
    assert len(got) == len(expect)
    for (gu, ge, gz), (eu, ee, ez) in zip(got, expect):
        assert (gu, ge) == (eu, ee)
        if gz is None or ez is None:
            assert gz == ez, (gu, ge, gz, ez)
        else:
            assert abs(gz - ez) < 1e-6, (gu, ge, gz, ez)
    # a planted spike scores extremely
    base = [("s", i, 1_700_000_000 + i * 60, 10.0 + (i % 3) * 0.1) for i in range(20)]
    spike = [("s", 99, 1_700_000_000 + 20 * 60, 1000.0)]
    df = spark.createDataFrame(
        base + spike, "k string, i long, ep long, v double"
    ).select("k", "i", F.timestamp_seconds("ep").alias("ts"), "v")
    out = {
        r.i: r.zscore
        for r in rolling_zscore(df, ["k"], "ts", "v", 10, 5, tiebreak=["i"]).collect()
    }
    assert out[99] is not None and out[99] > 100


def test_resample_interp_policy(spark):
    from distributedqueryengine_spark.operators.timeseries import resample_fill

    df = _mk(spark)
    base = 1_700_000_040
    out = resample_fill(df, ["k"], "ts", 60, {"s": F.sum("v")}, fill="interp")
    a = {r.bucket_ts: r.s for r in out.collect() if r.k == "A"}
    # observed anchors unchanged
    assert a[base] == 30.0 and a[base + 120] == 7.0 and a[base + 360] == 1.0
    # linear between anchors: 30→7 over 120s, 7→1 over 240s
    assert abs(a[base + 60] - 18.5) < 1e-9
    assert abs(a[base + 180] - 5.5) < 1e-9
    assert abs(a[base + 240] - 4.0) < 1e-9
    assert abs(a[base + 300] - 2.5) < 1e-9


def test_resample_interp_null_valued_observed_bucket(spark):
    """An OBSERVED bucket whose aggregate is NULL (sum over all-NULL
    rows) must not serve as a time anchor: the slope is drawn between
    the surrounding non-NULL values, and the NULL-valued bucket itself
    interpolates on that same line."""
    from distributedqueryengine_spark.operators.timeseries import resample_fill

    base = 1_700_000_040
    rows = [
        ("A", base, 10.0),
        ("A", base + 60, None),  # observed, but sum(v) IS NULL
        ("A", base + 180, 40.0),
    ]
    df = spark.createDataFrame(rows, "k string, ep long, v double").select(
        "k", F.timestamp_seconds("ep").alias("ts"), "v"
    )
    out = resample_fill(df, ["k"], "ts", 60, {"s": F.sum("v")}, fill="interp")
    a = {r.bucket_ts: r.s for r in out.collect()}
    # anchors: 10.0 @ base, 40.0 @ base+180 → slope 10 per bucket
    assert a[base] == 10.0 and a[base + 180] == 40.0
    assert abs(a[base + 60] - 20.0) < 1e-9   # NULL-valued observed bucket
    assert abs(a[base + 120] - 30.0) < 1e-9  # the gap next to it: correct slope


def test_funnel_hot_key_cap(spark):
    """Hot-key guard: a planted 10^6-event bot key completes under the
    cap with its overflow flagged, folding only the earliest
    max_events_per_key events; normal keys match the uncapped result."""
    from pyspark.sql import functions as F

    from distributedqueryengine_spark.operators.timeseries import funnel

    steps = ["view", "cart", "buy"]
    bot = spark.range(1_000_000).select(
        F.lit(999).alias("u"),
        F.timestamp_seconds(F.col("id") + 10).alias("ts"),
        F.lit("view").alias("step"),
    )
    # bot's cart/buy land AFTER the capped prefix → unreachable under cap
    tail = spark.createDataFrame(
        [(999, 2_000_000, "cart"), (999, 2_000_100, "buy"),
         (7, 100, "view"), (7, 200, "cart"), (7, 300, "buy")],
        "u long, ep long, step string",
    ).select("u", F.timestamp_seconds("ep").alias("ts"), "step")
    ev = bot.unionByName(tail)

    out = {
        r.u: r
        for r in funnel(
            ev, "u", "ts", "step", steps, max_events_per_key=1000
        ).collect()
    }
    assert out[999].n_events == 1_000_002
    assert out[999].truncated is True
    assert out[999].max_step == 1  # cart/buy beyond the capped prefix
    assert out[7].truncated is False and out[7].n_events == 3
    assert out[7].max_step == 3 and list(out[7].step_times) == [100, 200, 300]

    # uncapped ground truth for the normal key is unchanged by the cap
    base = {
        r.u: (r.max_step, list(r.step_times))
        for r in funnel(ev, "u", "ts", "step", steps).collect()
    }
    assert base[7] == (out[7].max_step, list(out[7].step_times))
    assert base[999] == (3, [10, 2_000_000, 2_000_100])  # bot completes uncapped


def test_cusum_changepoints_matches_reference_and_detects_shift(spark):
    """The scan-form CUSUM equals the textbook per-row recurrence
    (driver loop) on real-ish noisy data, flags a planted level shift,
    and stays quiet on pure noise."""
    import random

    from distributedqueryengine_spark.operators.timeseries import cusum_changepoints

    rng = random.Random(11)
    rows = []
    # key 'shift': mean 0 for 60 points, then mean +2 for 40
    for i in range(100):
        mu = 0.0 if i < 60 else 2.0
        rows.append(("shift", i, rng.gauss(mu, 1.0)))
    # key 'flat': pure noise
    for i in range(100):
        rows.append(("flat", i, rng.gauss(0.0, 1.0)))
    df = spark.createDataFrame(rows, "k string, ep long, v double").select(
        "k", F.timestamp_seconds("ep").alias("ts"), "v"
    )
    out = cusum_changepoints(df, ["k"], "ts", "v", threshold_sigmas=5.0)
    got = {
        (r.k, int(r.ts.timestamp())): (r.cusum_pos, r.cusum_neg, r.changepoint)
        for r in out.collect()
    }

    # driver reference: textbook recurrence on the same standardization
    import statistics

    for key in ("shift", "flat"):
        vals = [(ep, v) for kk, ep, v in rows if kk == key]
        mu = statistics.mean(v for _, v in vals)
        sd = statistics.stdev(v for _, v in vals)
        sp = sn = 0.0
        for ep, v in sorted(vals):
            z = (v - mu) / sd
            sp = max(0.0, sp + z - 0.5)
            sn = max(0.0, sn - z - 0.5)
            gp, gn, flag = got[(key, ep)]
            assert abs(gp - sp) < 1e-6 and abs(gn - sn) < 1e-6, (key, ep)
            assert flag == (sp > 5.0 or sn > 5.0)

    # a changepoint fires on the shifted key, never on pure noise; the
    # POSITIVE side (upward shift) fires only after the break (the
    # negative side may fire earlier: pre-shift data sits below the
    # pooled baseline — correct CUSUM-with-global-mean behavior)
    assert any(f for (k, _), (_, _, f) in got.items() if k == "shift")
    pos_hits = [
        ep for (k, ep), (cp, _, _) in got.items() if k == "shift" and cp > 5.0
    ]
    assert pos_hits and min(pos_hits) >= 60
    assert not any(f for (k, _), (_, _, f) in got.items() if k == "flat")
