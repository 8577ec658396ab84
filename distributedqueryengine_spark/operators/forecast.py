"""Per-key time-series forecasting: Holt / Holt-Winters exponential
smoothing over a REGULAR grid.

Thousands-to-millions of independent small forecasts (one per metric ×
dimension cell) is the warehouse forecasting shape — not one giant
model. That maps exactly onto applyInPandas: keys hash-partition
across the cluster, each group runs a sequential smoothing recurrence
over its OWN series. This is the justified-Python-kernel case (the
recurrence is inherently sequential per key — no Column-expression
form exists), and the per-group state is one series, the same
bounded-by-key-activity contract as the funnel fold.

Input contract: a regular, gap-free grid per key — compose with
resample_fill first (that is what it is for); the operator raises
in-kernel on an irregular series rather than silently forecasting
nonsense. Missing-seasonality keys: pass season_length=None for
Holt's linear-trend method; with season_length set, keys shorter than
two seasons fall back to Holt (flagged in the `method` column).
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _holt(vals, alpha, beta, horizon):
    level, trend = vals[0], (vals[1] - vals[0]) if len(vals) > 1 else 0.0
    for v in vals[1:]:
        prev = level
        level = alpha * v + (1 - alpha) * (level + trend)
        trend = beta * (level - prev) + (1 - beta) * trend
    return [level + (h + 1) * trend for h in range(horizon)]


def _holt_winters(vals, alpha, beta, gamma, m, horizon):
    # additive seasonality, standard initialization from the first 2 seasons
    season_means = [sum(vals[i * m : (i + 1) * m]) / m for i in range(2)]
    level = season_means[0]
    trend = (season_means[1] - season_means[0]) / m
    seasonal = [vals[i] - season_means[0] for i in range(m)]
    for t, v in enumerate(vals):
        s_idx = t % m
        prev = level
        level = alpha * (v - seasonal[s_idx]) + (1 - alpha) * (level + trend)
        trend = beta * (level - prev) + (1 - beta) * trend
        seasonal[s_idx] = gamma * (v - level) + (1 - gamma) * seasonal[s_idx]
    n = len(vals)
    return [
        level + (h + 1) * trend + seasonal[(n + h) % m] for h in range(horizon)
    ]


def holt_winters_forecast(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    interval_seconds: int,
    horizon: int,
    alpha: float = 0.3,
    beta: float = 0.1,
    gamma: float = 0.1,
    season_length: int | None = None,
) -> DataFrame:
    """Forecast `horizon` future buckets per key: output (key...,
    step 1..horizon, forecast_ts epoch seconds, forecast double,
    method 'holt'|'holt_winters'). `ts_col` may be a timestamp or
    epoch-seconds long; the series must be regular at
    `interval_seconds` (in-kernel check)."""
    for name, v in (("alpha", alpha), ("beta", beta), ("gamma", gamma)):
        if not 0 < v < 1:
            raise ValueError(f"{name} must be in (0,1), got {v}")
    if horizon < 1:
        raise ValueError(f"horizon must be >= 1, got {horizon}")
    if season_length is not None and season_length < 2:
        raise ValueError(f"season_length must be >= 2, got {season_length}")
    keys = list(key_cols)
    m = season_length

    ts_dt = dict(df.dtypes)[ts_col]
    sec = (
        F.col(ts_col).cast("long")
        if ts_dt in ("bigint", "int", "long")
        else F.unix_timestamp(F.col(ts_col)).cast("long")
    )
    base = df.select(*keys, sec.alias("__sec"), F.col(value_col).cast("double").alias("__v"))

    out_fields = ", ".join(
        [f"`{k}` {t}" for k, t in base.select(*keys).dtypes]
        + ["step int", "forecast_ts long", "forecast double", "method string"]
    )

    def fc(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__sec")
        secs = pdf["__sec"].tolist()
        vals = pdf["__v"].tolist()
        gaps = {b - a for a, b in zip(secs, secs[1:])}
        if gaps and gaps != {interval_seconds}:
            raise ValueError(
                f"irregular series for key {tuple(pdf.iloc[0][k] for k in keys)}: "
                f"gaps {sorted(gaps)[:5]} != {interval_seconds}; run resample_fill first"
            )
        if m is not None and len(vals) >= 2 * m:
            preds = _holt_winters(vals, alpha, beta, gamma, m, horizon)
            method = "holt_winters"
        elif len(vals) >= 2:
            preds = _holt(vals, alpha, beta, horizon)
            method = "holt"
        else:  # a single point forecasts itself (no trend information)
            preds = [vals[0]] * horizon
            method = "holt"
        last = secs[-1]
        out = {k: [pdf.iloc[0][k]] * horizon for k in keys}
        out["step"] = list(range(1, horizon + 1))
        out["forecast_ts"] = [last + (h + 1) * interval_seconds for h in range(horizon)]
        out["forecast"] = [round(p, 6) for p in preds]
        out["method"] = [method] * horizon
        return pd.DataFrame(out)

    return base.groupBy(*keys).applyInPandas(fc, out_fields)


def groupwise_ols(
    df: DataFrame,
    key_cols: Sequence[str],
    y_col: str,
    x_cols: Sequence[str],
    fit_intercept: bool = True,
) -> DataFrame:
    """Per-key ordinary least squares with MULTIPLE features — the
    million-small-regressions warehouse shape (per-SKU price
    elasticity, per-segment trend fits) that Spark's single-feature
    regr_slope/regr_intercept aggregates can't express. Output:
    key_cols + n (rows used) + intercept + one `beta_<x>` per feature
    + r2.

    applyInPandas per key (justified kernel: the normal-equations
    solve is a per-group numpy lstsq, not a Column expression); rows
    with any NULL in y/x are dropped per group; groups with fewer rows
    than unknowns, or a singular design, emit NULL coefficients with
    their n (visible, not silently absent). Same bounded-by-key-
    activity state contract as the other grouped kernels."""
    import numpy as np
    import pandas as pd

    keys = list(key_cols)
    xs = list(x_cols)
    if not xs:
        raise ValueError("x_cols must name at least one feature")
    base = df.select(
        *keys,
        F.col(y_col).cast("double").alias("__y"),
        *[F.col(c).cast("double").alias(f"__x_{c}") for c in xs],
    )
    out_fields = ", ".join(
        [f"`{k}` {t}" for k, t in base.select(*keys).dtypes]
        + ["n long", "intercept double"]
        + [f"`beta_{c}` double" for c in xs]
        + ["r2 double"]
    )
    p = len(xs) + (1 if fit_intercept else 0)

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        cols = ["__y"] + [f"__x_{c}" for c in xs]
        clean = pdf.dropna(subset=cols)
        head = {k: [pdf.iloc[0][k]] for k in keys}
        n = len(clean)
        if n < p:
            return pd.DataFrame(
                {**head, "n": [n], "intercept": [None],
                 **{f"beta_{c}": [None] for c in xs}, "r2": [None]}
            )
        X = clean[[f"__x_{c}" for c in xs]].to_numpy(dtype=np.float64)
        if fit_intercept:
            X = np.hstack([np.ones((n, 1)), X])
        yv = clean["__y"].to_numpy(dtype=np.float64)
        beta, *_ = np.linalg.lstsq(X, yv, rcond=None)
        resid = yv - X @ beta
        ss_res = float(resid @ resid)
        ss_tot = float(((yv - yv.mean()) ** 2).sum())
        r2 = 1.0 - ss_res / ss_tot if ss_tot > 0 else None
        off = 1 if fit_intercept else 0
        return pd.DataFrame(
            {
                **head,
                "n": [n],
                "intercept": [round(float(beta[0]), 6) if fit_intercept else 0.0],
                **{
                    f"beta_{c}": [round(float(beta[off + i]), 6)]
                    for i, c in enumerate(xs)
                },
                "r2": [round(r2, 6) if r2 is not None else None],
            }
        )

    return base.groupBy(*keys).applyInPandas(fit, out_fields)
