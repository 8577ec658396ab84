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
