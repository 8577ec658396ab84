"""Survival analysis: the Kaplan-Meier estimator with right-censoring.

Retention and churn questions are survival questions — "what fraction
of subjects survive past t, given that many are still alive when the
data ends" — and ignoring censoring (just averaging observed
lifetimes) biases every answer downward. The KM product-limit
estimator is the standard fix, and it is exactly SQL-shaped:

    S(t) = Π over event times u ≤ t of (1 − d_u / n_u)

with d_u the events at u and n_u the number still at risk entering u.

Shape: one aggregate collapses subjects to per-(group, time) event /
censor counts (the curve table is distinct-times-sized, never
subject-sized); n_at_risk is total minus an exclusive cumulative sum;
the running product is exp(Σ ln(·)) — one window over the tiny curve
frame, with the d==n (everyone-dies) terminal step handled via an
explicit zero flag rather than ln(0) (Spark's ln(0) is NULL, which
would silently poison the tail). Fully DuckDB-differentiable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    by: Sequence[str] = (),
) -> DataFrame:
    """Survival curve per group: (by..., t, n_risk, n_events,
    n_censored, survival) at every distinct observed time (event or
    censoring); `event_col` is 1/true for an observed event, 0/false
    for right-censored. survival is S(t) AFTER the events at t
    (right-continuous step function, the standard convention);
    censored-only times keep the previous survival value. Rows with
    NULL duration are dropped."""
    keys = list(by)
    d = F.col(duration_col).cast("double")
    e = F.col(event_col).cast("int")
    per_t = (
        df.filter(d.isNotNull())
        .groupBy(*keys, d.alias("t"))
        .agg(
            F.sum(e).cast("long").alias("n_events"),
            F.sum(1 - e).cast("long").alias("n_censored"),
        )
    )
    w_order = Window.partitionBy(*keys).orderBy("t") if keys else Window.orderBy("t")
    w_tot = Window.partitionBy(*keys) if keys else Window.partitionBy()
    prior = (
        F.coalesce(
            F.sum(F.col("n_events") + F.col("n_censored")).over(
                w_order.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        )
    )
    total = F.sum(F.col("n_events") + F.col("n_censored")).over(w_tot)
    curve = per_t.withColumn("n_risk", (total - prior).cast("long"))
    frac = 1.0 - F.col("n_events") / F.col("n_risk")
    # running product via exp(sum ln), zero steps flagged explicitly
    ln_term = F.when(F.col("n_events") == 0, F.lit(0.0)).when(
        frac > 0, F.log(frac)
    )
    zero_step = (F.col("n_events") > 0) & (frac <= 0)
    run = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    survived = F.when(
        F.max(zero_step.cast("int")).over(run) == 1, F.lit(0.0)
    ).otherwise(F.exp(F.sum(ln_term).over(run)))
    return curve.select(
        *keys,
        "t",
        "n_risk",
        "n_events",
        "n_censored",
        F.round(survived, 6).alias("survival"),
    )


def median_survival(km: DataFrame, by: Sequence[str] = ()) -> DataFrame:
    """(by..., median_t): the first time survival drops to <= 0.5 from a
    kaplan_meier result; NULL when the curve never reaches 0.5 (more
    than half the subjects are censored alive — the honest answer)."""
    keys = list(by)
    crossed = km.filter(F.col("survival") <= 0.5)
    agg = crossed.groupBy(*keys).agg(F.min("t").alias("median_t")) if keys else crossed.agg(F.min("t").alias("median_t"))
    if not keys:
        return agg
    groups = km.select(*keys).distinct()
    return groups.join(agg, keys, "left")


def logrank_test(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    group_col: str,
    group_a,
    group_b,
) -> dict:
    """Two-sample log-rank test: are the survival curves of `group_a`
    and `group_b` different? The standard companion to kaplan_meier
    (comparing median survival alone wastes the whole curve and
    mishandles censoring). Returns {'chi2', 'p_value', 'observed_a',
    'expected_a', 'n_a', 'n_b'} — chi2 is (Σ(O₁−E₁))²/ΣV with the
    hypergeometric variance at each pooled event time; p is the exact
    df=1 chi-square tail 2·(1−Φ(√chi2)) via the same JVM-portable erf
    the A/B module uses (computed driver-side here: the curve table
    this folds over is distinct-times-sized).

    Shape: ONE per-(group, time) aggregate — the only subject-sized
    stage; the test fold runs on the collected curve, which is
    distinct-event-times-sized, not subjects."""
    import math

    d = F.col(duration_col).cast("double")
    e = F.col(event_col).cast("int")
    g = F.col(group_col)
    sub = df.filter(d.isNotNull() & g.isin(group_a, group_b)).select(
        F.when(g == group_a, F.lit("a")).otherwise(F.lit("b")).alias("g"),
        d.alias("t"),
        e.alias("e"),
    )
    per_t = sub.groupBy("g", "t").agg(
        F.sum("e").alias("d"), F.count(F.lit(1)).alias("m")
    )
    rows = per_t.collect()  # curve-sized BY CONSTRUCTION
    per_g_tm = {"a": [], "b": []}
    for r in rows:
        per_g_tm[r["g"]].append((r["t"], int(r["m"]), int(r["d"])))
    times = sorted({r["t"] for r in rows if r["d"] > 0})
    obs_a = exp_a = var_sum = 0.0
    for t in times:
        n1 = sum(m for tt, m, _ in per_g_tm["a"] if tt >= t)
        n2 = sum(m for tt, m, _ in per_g_tm["b"] if tt >= t)
        d1 = sum(dd for tt, _, dd in per_g_tm["a"] if tt == t)
        d2 = sum(dd for tt, _, dd in per_g_tm["b"] if tt == t)
        nt, dt = n1 + n2, d1 + d2
        if nt < 1 or n1 == 0 and n2 == 0:
            continue
        obs_a += d1
        exp_a += dt * n1 / nt
        if nt > 1:
            var_sum += dt * (n1 / nt) * (n2 / nt) * (nt - dt) / (nt - 1)
    chi2 = (obs_a - exp_a) ** 2 / var_sum if var_sum > 0 else 0.0
    p = 2 * (1 - 0.5 * (1 + math.erf(math.sqrt(chi2) / math.sqrt(2))))
    return {
        "chi2": round(chi2, 6),
        "p_value": round(p, 6),
        "observed_a": round(obs_a, 6),
        "expected_a": round(exp_a, 6),
        "n_a": sum(m for _, m, _ in per_g_tm["a"]),
        "n_b": sum(m for _, m, _ in per_g_tm["b"]),
    }
