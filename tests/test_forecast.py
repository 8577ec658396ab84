"""Holt / Holt-Winters forecasting: ≡ python reference per key, linear
trends extrapolated, seasonality recovered, short keys fall back,
irregular grids rejected."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from distributedqueryengine_spark.operators.forecast import (
    _holt,
    _holt_winters,
    holt_winters_forecast,
)


def test_forecast_matches_reference_and_semantics(spark):
    rows = []
    # key 'lin': clean linear trend 5 + 2t (20 pts < 2 seasons → Holt)
    for t in range(20):
        rows.append(("lin", 1000 + 60 * t, 5.0 + 2.0 * t))
    # key 'seas': sin season (period 12) on a slope
    for t in range(48):
        rows.append(
            ("seas", 1000 + 60 * t, 10.0 + 0.5 * t + 8.0 * math.sin(2 * math.pi * t / 12))
        )
    # key 'tiny': single observation
    rows.append(("tiny", 1000, 7.0))
    df = spark.createDataFrame(rows, "k string, sec long, v double")

    out = holt_winters_forecast(
        df, ["k"], "sec", "v", interval_seconds=60, horizon=6,
        alpha=0.5, beta=0.3, gamma=0.4, season_length=12,
    )
    got = {}
    for r in out.collect():
        got.setdefault(r.k, {})[r.step] = (r.forecast_ts, r.forecast, r.method)

    # per-key equality with the module's reference recurrences
    lin_vals = [5.0 + 2.0 * t for t in range(20)]
    ref_lin = _holt(lin_vals, 0.5, 0.3, 6)
    for h in range(6):
        ts, fcv, method = got["lin"][h + 1]
        assert method == "holt"  # 20 < 2*12 → fallback
        assert ts == 1000 + 60 * 19 + 60 * (h + 1)
        assert abs(fcv - round(ref_lin[h], 6)) < 1e-9
        # a clean linear trend extrapolates accurately
        assert abs(fcv - (5.0 + 2.0 * (19 + h + 1))) < 0.3

    seas_vals = [
        10.0 + 0.5 * t + 8.0 * math.sin(2 * math.pi * t / 12) for t in range(48)
    ]
    ref_seas = _holt_winters(seas_vals, 0.5, 0.3, 0.4, 12, 6)
    truths, fcs = [], []
    for h in range(6):
        _, fcv, method = got["seas"][h + 1]
        assert method == "holt_winters"
        assert abs(fcv - round(ref_seas[h], 6)) < 1e-9
        truths.append(
            10.0 + 0.5 * (47 + h + 1)
            + 8.0 * math.sin(2 * math.pi * ((47 + h + 1) % 12) / 12)
        )
        fcs.append(fcv)
    # principled accuracy bar: beats the naive repeat-last-value forecast
    hw_mae = sum(abs(a - b) for a, b in zip(fcs, truths)) / 6
    naive_mae = sum(abs(seas_vals[-1] - t) for t in truths) / 6
    assert hw_mae < 0.6 * naive_mae, (hw_mae, naive_mae)

    # the seasonal forecast actually oscillates (not a straight line)
    seas_fc = [got["seas"][h + 1][1] for h in range(6)]
    diffs = [b - a for a, b in zip(seas_fc, seas_fc[1:])]
    assert max(diffs) > 0 > min(diffs)

    # single point: flat self-forecast
    assert all(got["tiny"][h + 1][1] == 7.0 for h in range(6))


def test_forecast_rejects_irregular_series(spark):
    df = spark.createDataFrame(
        [("k", 1000, 1.0), ("k", 1060, 2.0), ("k", 1180, 3.0)],
        "k string, sec long, v double",
    )
    with pytest.raises(Exception, match="irregular series"):
        holt_winters_forecast(
            df, ["k"], "sec", "v", interval_seconds=60, horizon=2
        ).collect()


def test_forecast_composes_with_resample(spark, tables):
    """The documented pipeline: resample_fill makes the regular grid,
    the forecaster consumes it — hourly event counts per type."""
    from distributedqueryengine_spark.operators.timeseries import resample_fill

    ev = tables["events"].select("event_type", "ts", "value")
    grid = resample_fill(
        ev, ["event_type"], "ts", 3600,
        {"n": F.count(F.lit(1))}, fill="zero",
    )
    out = holt_winters_forecast(
        grid, ["event_type"], "bucket_ts", "n",
        interval_seconds=3600, horizon=4,
    )
    rows = out.collect()
    types = {r.event_type for r in rows}
    assert types == {r.event_type for r in ev.select("event_type").distinct().collect()}
    assert all(r.step in (1, 2, 3, 4) for r in rows)
    # forecast timestamps continue each key's grid
    last = {
        r.event_type: r.m
        for r in grid.groupBy("event_type").agg(F.max("bucket_ts").alias("m")).collect()
    }
    for r in rows:
        assert r.forecast_ts == last[r.event_type] + 3600 * r.step


def test_groupwise_ols_matches_numpy(spark):
    """Per-key multi-feature OLS ≡ numpy lstsq; known coefficients
    recovered on clean data; NULL rows dropped; under-determined and
    constant-y groups degrade visibly."""
    import random

    import numpy as np

    from distributedqueryengine_spark.operators.forecast import groupwise_ols

    rng = random.Random(4)
    rows = []
    # key 'a': y = 3 + 2*x1 - 0.5*x2 + noise
    for _ in range(200):
        x1, x2 = rng.gauss(0, 2), rng.gauss(5, 3)
        rows.append(("a", 3 + 2 * x1 - 0.5 * x2 + rng.gauss(0, 0.01), x1, x2))
    # key 'b': different coefs + a NULL row
    for _ in range(100):
        x1, x2 = rng.gauss(0, 1), rng.gauss(0, 1)
        rows.append(("b", -1 + 0.7 * x1 + 1.5 * x2 + rng.gauss(0, 0.01), x1, x2))
    rows.append(("b", None, 1.0, 1.0))
    rows.append(("tiny", 5.0, 1.0, 2.0))  # n < p → NULL coefs
    df = spark.createDataFrame(rows, "k string, y double, x1 double, x2 double")

    out = {r.k: r for r in groupwise_ols(df, ["k"], "y", ["x1", "x2"]).collect()}
    assert abs(out["a"].intercept - 3) < 0.01
    assert abs(out["a"].beta_x1 - 2) < 0.01
    assert abs(out["a"].beta_x2 + 0.5) < 0.01
    assert out["a"].r2 > 0.999
    assert out["b"].n == 100  # NULL row dropped
    assert abs(out["b"].beta_x2 - 1.5) < 0.01
    assert out["tiny"].n == 1 and out["tiny"].intercept is None

    # exact numpy agreement on a group
    sub = [(y, x1, x2) for k, y, x1, x2 in rows if k == "a"]
    X = np.hstack([np.ones((len(sub), 1)), np.array([[x1, x2] for _, x1, x2 in sub])])
    yv = np.array([y for y, _, _ in sub])
    beta, *_ = np.linalg.lstsq(X, yv, rcond=None)
    assert abs(out["a"].intercept - round(float(beta[0]), 6)) < 1e-9
    assert abs(out["a"].beta_x1 - round(float(beta[1]), 6)) < 1e-9
