"""Kaplan-Meier: the textbook worked example, a python reference over
random censored data, the everyone-dies zero tail, per-group curves,
and the DuckDB mirror."""

from __future__ import annotations

import random

import duckdb
from pyspark.sql import functions as F

from distributedqueryengine_spark.operators.survival import (
    kaplan_meier,
    median_survival,
)


def _km_ref(pairs):
    """{t: (n_risk, d, c, S)} textbook product-limit fold."""
    times = sorted({t for t, _ in pairs})
    n = len(pairs)
    out, s, consumed = {}, 1.0, 0
    for t in times:
        d = sum(1 for u, e in pairs if u == t and e)
        c = sum(1 for u, e in pairs if u == t and not e)
        n_risk = n - consumed
        if d:
            s *= 1 - d / n_risk
        out[t] = (n_risk, d, c, s)
        consumed += d + c
    return out


def test_km_textbook_example(spark):
    # classic small cohort: events at 6,7,10,15; censored at 9,11
    pairs = [(6, 1), (7, 1), (9, 0), (10, 1), (11, 0), (15, 1)]
    df = spark.createDataFrame(pairs, "dur int, ev int")
    got = {
        r.t: (r.n_risk, r.n_events, r.n_censored, r.survival)
        for r in kaplan_meier(df, "dur", "ev").collect()
    }
    ref = _km_ref(pairs)
    for t, (n_risk, d, c, s) in ref.items():
        gr = got[float(t)]
        assert gr[:3] == (n_risk, d, c), t
        assert abs(gr[3] - s) < 1e-6, t
    # hand value: S(10) = (5/6)(4/5)(2/3) = 4/9
    assert abs(got[10.0][3] - 4 / 9) < 1e-6
    # everyone-dies tail reaches exactly 0
    assert got[15.0][3] == 0.0

    med = median_survival(kaplan_meier(df, "dur", "ev")).first()
    assert med.median_t == 10.0  # first time S <= 0.5


def test_km_random_and_groups_match_reference(spark):
    rng = random.Random(6)
    rows = []
    for g in ("a", "b"):
        scale = 10 if g == "a" else 25
        for _ in range(300):
            t = round(rng.expovariate(1 / scale), 1) + 0.1
            censored = rng.random() < 0.3
            rows.append((g, t, 0 if censored else 1))
    df = spark.createDataFrame(rows, "g string, dur double, ev int")
    km = kaplan_meier(df, "dur", "ev", by=["g"])
    got = {
        (r.g, r.t): (r.n_risk, r.n_events, r.n_censored, r.survival)
        for r in km.collect()
    }
    for g in ("a", "b"):
        ref = _km_ref([(t, e) for gg, t, e in rows if gg == g])
        for t, (n_risk, d, c, s) in ref.items():
            gr = got[(g, t)]
            assert gr[:3] == (n_risk, d, c), (g, t)
            assert abs(gr[3] - s) < 1e-6, (g, t)  # 6-dp rounding
    # the longer-lived group's median is larger
    med = {r.g: r.median_t for r in median_survival(km, by=["g"]).collect()}
    assert med["b"] > med["a"]

    # survival is monotone non-increasing per group
    for g in ("a", "b"):
        curve = sorted((t, s[3]) for (gg, t), s in got.items() if gg == g)
        vals = [s for _, s in curve]
        assert all(x >= y - 1e-9 for x, y in zip(vals, vals[1:]))


def test_km_matches_duckdb(spark):
    rng = random.Random(2)
    rows = [
        (round(rng.expovariate(0.1), 1) + 0.1, 1 if rng.random() < 0.7 else 0)
        for _ in range(500)
    ]
    df = spark.createDataFrame(rows, "dur double, ev int")
    got = sorted(
        (r.t, r.n_risk, r.n_events, r.n_censored, r.survival)
        for r in kaplan_meier(df, "dur", "ev").collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE subj(dur DOUBLE, ev INTEGER)")
    con.executemany("INSERT INTO subj VALUES (?, ?)", rows)
    expect = sorted(
        tuple(r)
        for r in con.execute(
            """
            WITH per_t AS (
              SELECT dur AS t, sum(ev) AS d, sum(1 - ev) AS c
              FROM subj GROUP BY 1
            ), risk AS (
              SELECT t, d, c,
                     (SELECT count(*) FROM subj)
                   - coalesce(sum(d + c) OVER (ORDER BY t
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                     AS n_risk
              FROM per_t
            )
            SELECT t, n_risk, d, c,
                   round(CASE WHEN max(CASE WHEN d > 0 AND d >= n_risk
                                            THEN 1 ELSE 0 END)
                              OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) = 1
                         THEN 0.0
                         ELSE exp(sum(CASE WHEN d = 0 THEN 0.0
                                           ELSE ln(1 - d / CAST(n_risk AS DOUBLE))
                                      END)
                              OVER (ORDER BY t ROWS UNBOUNDED PRECEDING))
                         END, 6) AS survival
            FROM risk
            """
        ).fetchall()
    )
    assert [g[:4] for g in got] == [e[:4] for e in expect]
    assert all(abs(g[4] - e[4]) <= 1e-6 for g, e in zip(got, expect))


def test_logrank_test_semantics(spark):
    """Different hazards → significant; identical distributions (A/A)
    → not; observed/expected match a python reference fold."""
    from distributedqueryengine_spark.operators.survival import logrank_test

    rng = random.Random(12)
    rows = []
    for g, scale in (("x", 8.0), ("y", 20.0)):
        for _ in range(250):
            t = round(rng.expovariate(1 / scale), 1) + 0.1
            rows.append((g, t, 1 if rng.random() < 0.75 else 0))
    df = spark.createDataFrame(rows, "g string, dur double, ev int")
    res = logrank_test(df, "dur", "ev", "g", "x", "y")
    assert res["n_a"] == res["n_b"] == 250
    assert res["p_value"] < 1e-6  # clearly different curves
    # shorter-lived group observes MORE events than expected under H0
    assert res["observed_a"] > res["expected_a"]

    # python reference for observed/expected/variance
    def ref(pairs_a, pairs_b):
        times = sorted(
            {t for t, e in pairs_a if e} | {t for t, e in pairs_b if e}
        )
        obs = exp = var = 0.0
        for t in times:
            n1 = sum(1 for u, _ in pairs_a if u >= t)
            n2 = sum(1 for u, _ in pairs_b if u >= t)
            d1 = sum(1 for u, e in pairs_a if u == t and e)
            d2 = sum(1 for u, e in pairs_b if u == t and e)
            nt, dt = n1 + n2, d1 + d2
            obs += d1
            exp += dt * n1 / nt
            if nt > 1:
                var += dt * (n1 / nt) * (n2 / nt) * (nt - dt) / (nt - 1)
        return obs, exp, (obs - exp) ** 2 / var

    pa = [(t, e) for g, t, e in rows if g == "x"]
    pb = [(t, e) for g, t, e in rows if g == "y"]
    o, e_, chi = ref(pa, pb)
    assert abs(res["observed_a"] - o) < 1e-6
    assert abs(res["expected_a"] - e_) < 1e-4
    assert abs(res["chi2"] - chi) < 1e-3

    # A/A: same distribution split randomly → not significant
    aa = [("p" if rng.random() < 0.5 else "q", t, e) for _, t, e in rows]
    aadf = spark.createDataFrame(aa, "g string, dur double, ev int")
    assert logrank_test(aadf, "dur", "ev", "g", "p", "q")["p_value"] > 0.01


def _logrank_reference(rows, ga, gb):
    """Pure-python O(T log T) log-rank: one sort, suffix at-risk sums."""
    import math
    from collections import defaultdict

    per_t = defaultdict(lambda: [0, 0, 0, 0])  # t -> [d1, d2, m1, m2]
    for g, t, e in rows:
        if t is None or g not in (ga, gb):
            continue
        slot = per_t[float(t)]
        if g == ga:
            slot[0] += e
            slot[2] += 1
        else:
            slot[1] += e
            slot[3] += 1
    n1 = sum(v[2] for v in per_t.values())
    n2 = sum(v[3] for v in per_t.values())
    obs = exp = var = 0.0
    tot1, tot2 = n1, n2
    for t in sorted(per_t):
        d1, d2, m1, m2 = per_t[t]
        dt, nt = d1 + d2, tot1 + tot2
        if dt > 0 and nt >= 1:
            obs += d1
            exp += dt * tot1 / nt
            if nt > 1:
                var += dt * (tot1 / nt) * (tot2 / nt) * (nt - dt) / (nt - 1)
        tot1 -= m1
        tot2 -= m2
    chi2 = (obs - exp) ** 2 / var if var > 0 else 0.0
    p = 2 * (1 - 0.5 * (1 + math.erf(math.sqrt(chi2) / math.sqrt(2))))
    return chi2, p, obs, exp, n1, n2


def test_logrank_matches_reference_random(spark):
    """Randomized differential: the in-plan bucketed-prefix-sum log-rank
    equals a pure-python sorted-pass reference across tie-heavy,
    continuous, and censored shapes."""
    import math
    import random

    from distributedqueryengine_spark.operators.survival import logrank_test

    for seed, tie_grain in [(1, 1.0), (2, None), (3, 0.5)]:
        rng = random.Random(seed)
        rows = []
        for i in range(800):
            g = "x" if i % 2 else "y"
            t = rng.expovariate(1.0 if g == "x" else 1.3) * 10
            if tie_grain:
                t = round(t / tie_grain) * tie_grain
            rows.append((g, t, int(rng.random() < 0.7)))
        df = spark.createDataFrame(rows, "g string, t double, e int").repartition(7)
        got = logrank_test(df, "t", "e", "g", "x", "y")
        chi2, p, obs, exp, n1, n2 = _logrank_reference(rows, "x", "y")
        assert math.isclose(got["chi2"], chi2, rel_tol=1e-6, abs_tol=1e-6), (seed, got, chi2)
        assert math.isclose(got["observed_a"], obs, abs_tol=1e-6)
        assert math.isclose(got["expected_a"], exp, abs_tol=1e-6)
        assert (got["n_a"], got["n_b"]) == (n1, n2)
        assert math.isclose(got["p_value"], p, abs_tol=1e-6)


def test_logrank_50k_distinct_times_fast(spark):
    """The r8 verdict's done criterion: continuous durations (distinct
    times ~ subjects, 50k of them) complete in seconds — the old O(T^2)
    driver fold took minutes and collected a subject-sized curve."""
    import time

    from distributedqueryengine_spark.operators.survival import logrank_test

    n = 50_000
    df = spark.range(n).select(
        F.when(F.col("id") % 2 == 0, "x").otherwise("y").alias("g"),
        # continuous, effectively all-distinct durations
        (F.abs(F.hash("id")).cast("double") / 1e6 + F.col("id") / 1e9).alias("t"),
        (F.abs(F.hash("id", F.lit(1))) % 10 < 7).cast("int").alias("e"),
    )
    t0 = time.time()
    out = logrank_test(df, "t", "e", "g", "x", "y")
    wall = time.time() - t0
    assert out["n_a"] + out["n_b"] == n
    assert out["chi2"] >= 0.0 and 0.0 <= out["p_value"] <= 1.0
    assert wall < 60, f"50k distinct times took {wall:.1f}s"


def test_logrank_time_bucket_and_df_variant(spark):
    """time_bucket floors durations before the collapse (enforcing the
    curve-sized contract) and equals the reference computed on the
    floored data; logrank_test_df returns the same numbers as a 1-row
    frame without any driver fold."""
    import math
    import random

    from distributedqueryengine_spark.operators.survival import (
        logrank_test,
        logrank_test_df,
    )

    rng = random.Random(9)
    rows = [
        ("x" if i % 2 else "y", rng.expovariate(1.2) * 30, int(rng.random() < 0.8))
        for i in range(600)
    ]
    df = spark.createDataFrame(rows, "g string, t double, e int")
    got = logrank_test(df, "t", "e", "g", "x", "y", time_bucket=7.0)
    floored = [(g, (t // 7.0) * 7.0, e) for g, t, e in rows]
    chi2, p, obs, exp, n1, n2 = _logrank_reference(floored, "x", "y")
    assert math.isclose(got["chi2"], chi2, rel_tol=1e-6, abs_tol=1e-6)
    assert math.isclose(got["expected_a"], exp, abs_tol=1e-6)

    row = logrank_test_df(df, "t", "e", "g", "x", "y", time_bucket=7.0).collect()
    assert len(row) == 1
    r = row[0]
    assert math.isclose(r["chi2"], got["chi2"], abs_tol=1e-6)
    assert (r["n_a"], r["n_b"]) == (got["n_a"], got["n_b"])

    import pytest as _pytest

    with _pytest.raises(ValueError, match="time_bucket"):
        logrank_test(df, "t", "e", "g", "x", "y", time_bucket=0.0)

    # empty frame: defined zeros, not a crash
    empty = logrank_test(df.limit(0), "t", "e", "g", "x", "y")
    assert empty["chi2"] == 0.0 and empty["n_a"] == 0
