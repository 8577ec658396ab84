"""Experiment analysis: Welch's t-test over grouped metrics.

The A/B-testing readout every product-analytics warehouse runs daily:
compare a metric between variants without assuming equal variances.
Everything is derived from ONE hash aggregate per (experiment, group)
— n, mean, variance are algebraic, so the operator is a single
map-side-combinable pass over event rows regardless of group sizes —
and the test statistics are computed on the groups-sized result:

    t  = (m₁ − m₂) / √(v₁/n₁ + v₂/n₂)
    df = (v₁/n₁ + v₂/n₂)² / ((v₁/n₁)²/(n₁−1) + (v₂/n₂)²/(n₂−1))
         (Welch–Satterthwaite)
    p  ≈ 2·(1 − Φ(|t|))  — the NORMAL approximation, accurate to the
         third decimal for df ≳ 30 (the regime every real experiment
         lives in) and implemented via the Abramowitz–Stegun 7.1.26
         erf polynomial (|ε| < 1.5e-7) as a pure JVM expression.
         Small-df experiments should read t and df against a t-table;
         both are emitted, nothing is hidden behind the approximation.

welch_ttest itself is two-variant by contract; multi-arm experiments
go through `pairwise_ttests` (every arm vs the shared control with
Holm/Bonferroni family-wise correction), continuous monitoring through
`msprt_always_valid` (peeking-safe mixture SPRT), and planning through
`required_sample_size`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def erf_approx(x: Column) -> Column:
    """Abramowitz–Stegun 7.1.26 polynomial erf, |error| < 1.5e-7 —
    Spark has no built-in erf; this keeps p-values JVM-side."""
    sign = F.when(x < 0, F.lit(-1.0)).otherwise(F.lit(1.0))
    ax = F.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = (
        0.254829592 * t
        - 0.284496736 * t * t
        + 1.421413741 * t * t * t
        - 1.453152027 * t * t * t * t
        + 1.061405429 * t * t * t * t * t
    )
    return sign * (1.0 - poly * F.exp(-ax * ax))


def normal_sf2(x: Column) -> Column:
    """Two-sided normal tail: 2·(1 − Φ(|x|)) = erfc(|x|/√2)."""
    return 1.0 - erf_approx(F.abs(x) / F.lit(2.0**0.5))


def welch_ttest(
    df: DataFrame,
    group_col: str,
    metric_col: str,
    control: str,
    treatment: str,
    by: list[str] | tuple[str, ...] = (),
) -> DataFrame:
    """Per `by`-cell Welch's t-test of `metric_col` between the
    `treatment` and `control` values of `group_col`. Output: by-cols +
    (n_control, mean_control, n_treatment, mean_treatment, diff,
    rel_diff, t_stat, df, p_value_normal). Cells missing either
    variant, or with n < 2 on either side, are dropped (no statistic
    exists). Positive t / diff means treatment > control."""
    keys = list(by)
    per_group = (
        df.filter(F.col(group_col).isin(control, treatment))
        .groupBy(*keys, group_col)
        .agg(
            F.count(metric_col).alias("n"),
            F.avg(metric_col).alias("m"),
            F.var_samp(metric_col).alias("v"),
        )
        .filter(F.col("n") >= 2)
    )
    c = per_group.filter(F.col(group_col) == control).select(
        *keys,
        F.col("n").alias("n_control"),
        F.col("m").alias("mean_control"),
        F.col("v").alias("__vc"),
    )
    t_ = per_group.filter(F.col(group_col) == treatment).select(
        *keys,
        F.col("n").alias("n_treatment"),
        F.col("m").alias("mean_treatment"),
        F.col("v").alias("__vt"),
    )
    joined = c.join(t_, keys) if keys else c.crossJoin(t_)
    se_c = F.col("__vc") / F.col("n_control")
    se_t = F.col("__vt") / F.col("n_treatment")
    se2 = se_c + se_t
    tstat = (F.col("mean_treatment") - F.col("mean_control")) / F.sqrt(se2)
    dof = (se2 * se2) / (
        (se_c * se_c) / (F.col("n_control") - 1)
        + (se_t * se_t) / (F.col("n_treatment") - 1)
    )
    return joined.select(
        *keys,
        "n_control",
        F.round("mean_control", 6).alias("mean_control"),
        "n_treatment",
        F.round("mean_treatment", 6).alias("mean_treatment"),
        F.round(F.col("mean_treatment") - F.col("mean_control"), 6).alias("diff"),
        F.round(
            (F.col("mean_treatment") - F.col("mean_control"))
            / F.abs(F.col("mean_control")),
            6,
        ).alias("rel_diff"),
        F.round(tstat, 6).alias("t_stat"),
        F.round(dof, 6).alias("df"),
        F.round(normal_sf2(tstat), 6).alias("p_value_normal"),
    )


def proportion_ztest(
    df: DataFrame,
    group_col: str,
    success_col: str,
    control: str,
    treatment: str,
    by: list[str] | tuple[str, ...] = (),
) -> DataFrame:
    """Two-proportion z-test for CONVERSION metrics (success_col is
    boolean/0-1): the binary companion to welch_ttest. Pooled-variance
    z under H0, two-sided normal p — exact for proportions at any
    realistic n. Output: by-cols + (n_control, rate_control,
    n_treatment, rate_treatment, diff, rel_diff, z_stat, p_value)."""
    keys = list(by)
    s = F.col(success_col).cast("double")
    per_group = (
        df.filter(F.col(group_col).isin(control, treatment))
        .groupBy(*keys, group_col)
        .agg(F.count(s).alias("n"), F.sum(s).alias("x"))
        .filter(F.col("n") >= 1)
    )
    c = per_group.filter(F.col(group_col) == control).select(
        *keys, F.col("n").alias("n_control"), F.col("x").alias("__xc")
    )
    t_ = per_group.filter(F.col(group_col) == treatment).select(
        *keys, F.col("n").alias("n_treatment"), F.col("x").alias("__xt")
    )
    joined = c.join(t_, keys) if keys else c.crossJoin(t_)
    pc = F.col("__xc") / F.col("n_control")
    pt = F.col("__xt") / F.col("n_treatment")
    pooled = (F.col("__xc") + F.col("__xt")) / (
        F.col("n_control") + F.col("n_treatment")
    )
    se = F.sqrt(
        pooled * (1 - pooled) * (1 / F.col("n_control") + 1 / F.col("n_treatment"))
    )
    z = F.when(se > 0, (pt - pc) / se).otherwise(F.lit(0.0))
    return joined.select(
        *keys,
        "n_control",
        F.round(pc, 6).alias("rate_control"),
        "n_treatment",
        F.round(pt, 6).alias("rate_treatment"),
        F.round(pt - pc, 6).alias("diff"),
        F.round(F.when(pc > 0, (pt - pc) / pc), 6).alias("rel_diff"),
        F.round(z, 6).alias("z_stat"),
        F.round(normal_sf2(z), 6).alias("p_value"),
    )


def srm_check(
    df: DataFrame,
    group_col: str,
    expected_ratios: dict,
    by: list[str] | tuple[str, ...] = (),
    alpha: float = 0.001,
) -> DataFrame:
    """Sample-Ratio-Mismatch check — the experiment health gate run
    BEFORE reading any metric: chi-square goodness of fit of observed
    assignment counts against `expected_ratios` (e.g. {'c': 0.5,
    't': 0.5}). A failing SRM means the randomization or logging is
    broken and every downstream p-value is garbage.

    Output: by-cols + (n_total, chi2, df, p_value, srm — true when
    p < alpha). p uses the Wilson–Hilferty cube-root normal
    approximation of the chi-square tail (JVM-side, accurate to ~1e-3
    in the decision region for df ≥ 1; the statistic and df are
    emitted for exact lookups). Groups outside `expected_ratios` raise
    — an unexpected variant IS an SRM-class bug, loudly. The variant
    list is built FROM `expected_ratios`, so an expected arm with zero
    observed rows (the most extreme mismatch — e.g. a dead assignment
    path) contributes (0−E)²/E and flags, rather than vanishing from
    the statistic."""
    total_ratio = sum(expected_ratios.values())
    if abs(total_ratio - 1.0) > 1e-9:
        raise ValueError(f"expected_ratios must sum to 1, got {total_ratio}")
    bad_ratios = {k: v for k, v in expected_ratios.items() if v <= 0}
    if bad_ratios:
        raise ValueError(
            f"expected_ratios must all be > 0 (expected=0 makes chi2 "
            f"infinite, not a valid arm): {bad_ratios}"
        )
    if len(expected_ratios) < 2:
        raise ValueError("SRM check needs >= 2 expected variants")
    keys = list(by)
    grp_type = df.schema[group_col].dataType
    counts = df.groupBy(*keys, group_col).agg(F.count(F.lit(1)).alias("n"))
    # loud guard: any unexpected variant (incl. NULL) fails the whole
    # check in-plan. Carried on the TOTALS side so it survives the
    # expected-variant join below.
    is_expected = F.col(group_col).isin(*expected_ratios.keys())
    bad = F.when(
        ~F.coalesce(is_expected, F.lit(False)),
        F.coalesce(F.col(group_col).cast("string"), F.lit("NULL")),
    )
    totals = counts.groupBy(*keys).agg(
        F.sum("n").alias("n_total"), F.max(bad).alias("__bad")
    )
    totals = totals.withColumn(
        "n_total",
        F.when(F.col("__bad").isNull(), F.col("n_total")).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("unexpected variant in SRM check: "), F.col("__bad")
                )
            ).cast("long")
        ),
    ).drop("__bad")
    ratio = F.create_map(
        *[
            x
            for kv in expected_ratios.items()
            for x in (F.lit(kv[0]), F.lit(float(kv[1])))
        ]
    )
    # Enumerate the variant list from expected_ratios per by-cell and
    # LEFT-join observed counts: a variant with ZERO observed rows (the
    # most extreme mismatch) contributes (0-E)^2/E instead of silently
    # vanishing, and df stays len(expected_ratios)-1.
    variants = totals.withColumn(
        group_col,
        F.explode(
            F.array(
                *[F.lit(g).cast(grp_type) for g in expected_ratios]
            )
        ),
    )
    joined = variants.join(
        counts, keys + [group_col], "left"
    ).withColumn("n", F.coalesce(F.col("n"), F.lit(0)))
    expected = F.col("n_total") * ratio[F.col(group_col)]
    chi = joined.groupBy(*keys, "n_total").agg(
        F.sum(F.pow(F.col("n") - expected, 2) / expected).alias("chi2"),
    )
    dof = F.lit(len(expected_ratios) - 1).cast("int")
    # Wilson–Hilferty: (chi2/df)^(1/3) ~ N(1 - 2/(9df), 2/(9df))
    wh_z = (
        F.pow(F.col("chi2") / dof, 1.0 / 3.0) - (1 - 2 / (9 * dof))
    ) / F.sqrt(2 / (9 * dof))
    p = 1 - 0.5 * (1 + erf_approx(wh_z / F.lit(2.0**0.5)))  # one-sided upper
    return chi.select(
        *keys,
        "n_total",
        F.round("chi2", 6).alias("chi2"),
        dof.alias("df"),
        F.round(p, 6).alias("p_value"),
        (p < alpha).alias("srm"),
    )


def cuped_adjust(
    df: DataFrame,
    metric_col: str,
    covariate_col: str,
    by: list[str] | tuple[str, ...] = (),
    out_col: str | None = None,
) -> DataFrame:
    """CUPED (Controlled-experiment Using Pre-Experiment Data) variance
    reduction: Y' = Y − θ·(X − E[X]) with θ = cov(X, Y)/var(X), X a
    pre-experiment covariate (e.g. the user's pre-period value of the
    same metric). Y' has the same expectation per variant — so every
    test above stays valid — but its variance shrinks by the squared
    X–Y correlation, the cheapest sensitivity win in experimentation.

    θ and E[X] are computed over ALL rows (variant-blind — computing θ
    per variant would bias the adjustment), per `by` cell when given:
    one algebraic aggregate (covar_samp/var_samp/avg), broadcast back.
    Rows with NULL covariate pass through unadjusted (Y' = Y), the
    standard treatment for users with no pre-period. Appends
    `out_col` (default '<metric>_cuped') plus a `__theta`-free frame —
    run welch_ttest on the adjusted column afterwards."""
    keys = list(by)
    out_col = out_col or f"{metric_col}_cuped"
    x = F.col(covariate_col).cast("double")
    y = F.col(metric_col).cast("double")
    stats_agg = [
        F.covar_samp(x, y).alias("__cxy"),
        F.var_samp(x).alias("__vx"),
        F.avg(x).alias("__mx"),
    ]
    stats = df.groupBy(*keys).agg(*stats_agg) if keys else df.agg(*stats_agg)
    joined = (
        df.join(F.broadcast(stats), keys) if keys else df.crossJoin(F.broadcast(stats))
    )
    theta = F.when(
        F.col("__vx").isNotNull() & (F.col("__vx") > 0),
        F.col("__cxy") / F.col("__vx"),
    ).otherwise(F.lit(0.0))
    adjusted = F.when(
        x.isNotNull(), y - theta * (x - F.col("__mx"))
    ).otherwise(y)
    return joined.withColumn(out_col, F.round(adjusted, 6)).drop(
        "__cxy", "__vx", "__mx"
    )


def msprt_always_valid(
    df: DataFrame,
    group_col: str,
    metric_col: str,
    control: str,
    treatment: str,
    tau2: float = 1.0,
    by: list[str] | tuple[str, ...] = (),
) -> DataFrame:
    """Always-valid (peeking-safe) test of the treatment-vs-control
    mean difference: the mixture Sequential Probability Ratio Test of
    Johari, Koomen, Pekelis & Walsh ("Peeking at A/B Tests", KDD'17)
    with a normal mixture prior of variance `tau2` over the effect.

    A fixed-n p-value (welch_ttest) is only valid at ONE
    pre-registered look; monitored continuously it inflates false
    positives severalfold. The mSPRT p-value is valid at EVERY look
    simultaneously: with observed difference Δ and variance of the
    difference V = s²_c/n_c + s²_t/n_t,

        Λ = sqrt(V / (V + τ²)) · exp( Δ²·τ² / (2·V·(V + τ²)) )
        p_always_valid = min(1, 1/Λ)

    Report min(p so far) across looks — it is a valid sequential
    p-value under H0 for any stopping rule. τ² tunes sensitivity:
    roughly the prior variance of plausible effects (too small wastes
    power on effects it can't represent; too large dilutes Λ early).
    Output: by-cols + (n_control, n_treatment, diff, lambda_mixture,
    p_always_valid). Cells missing a variant or with n < 2 drop, as in
    welch_ttest. One aggregate + JVM column math — the same shape as
    the fixed-n tests, so it runs per micro-batch or per day over the
    same state."""
    if tau2 <= 0:
        raise ValueError(f"tau2 must be > 0, got {tau2}")
    keys = list(by)
    per_group = (
        df.filter(F.col(group_col).isin(control, treatment))
        .groupBy(*keys, group_col)
        .agg(
            F.count(metric_col).alias("n"),
            F.avg(metric_col).alias("m"),
            F.var_samp(metric_col).alias("v"),
        )
        .filter(F.col("n") >= 2)
    )
    c = per_group.filter(F.col(group_col) == control).select(
        *keys,
        F.col("n").alias("n_control"),
        F.col("m").alias("__mc"),
        F.col("v").alias("__vc"),
    )
    t_ = per_group.filter(F.col(group_col) == treatment).select(
        *keys,
        F.col("n").alias("n_treatment"),
        F.col("m").alias("__mt"),
        F.col("v").alias("__vt"),
    )
    joined = c.join(t_, keys) if keys else c.crossJoin(t_)
    diff = F.col("__mt") - F.col("__mc")
    v = (
        F.col("__vc") / F.col("n_control")
        + F.col("__vt") / F.col("n_treatment")
    )
    t2 = F.lit(float(tau2))
    lam = F.sqrt(v / (v + t2)) * F.exp(
        (diff * diff) * t2 / (2.0 * v * (v + t2))
    )
    return joined.select(
        *keys,
        "n_control",
        "n_treatment",
        F.round(diff, 6).alias("diff"),
        F.round(lam, 6).alias("lambda_mixture"),
        F.round(F.least(F.lit(1.0), 1.0 / lam), 6).alias("p_always_valid"),
    )


def pairwise_ttests(
    df: DataFrame,
    group_col: str,
    metric_col: str,
    control: str,
    treatments: list | tuple,
    by: list[str] | tuple[str, ...] = (),
    correction: str = "holm",
) -> DataFrame:
    """Multi-arm readout: Welch's t of EVERY treatment arm against the
    shared control, with family-wise multiple-comparison correction —
    the contract the two-variant `welch_ttest` deliberately excludes
    (reading k uncorrected p-values inflates the family false-positive
    rate to ~k·α). Output: welch_ttest columns + `treatment` +
    `p_adjusted` + `significant_05`.

    `correction`: 'holm' (step-down — uniformly more powerful than
    Bonferroni at the same FWER; p_(i) multiplied by (k−i+1) in
    ascending order with a running max to keep monotonicity),
    'bonferroni' (k·p), or 'none'. The correction family is the set of
    treatment arms WITHIN each `by` cell (the standard scope: one
    experiment's arms correct together; different segments are
    different families).

    Shape: ONE per-(by, arm) aggregate feeds all k comparisons (the
    control row joins k times — k is arms, not data); the Holm rank is
    a window over k rows per cell. Everything stays JVM-side."""
    from pyspark.sql.window import Window

    arms = list(treatments)
    if not arms:
        raise ValueError("treatments must name at least one arm")
    if control in arms:
        raise ValueError(f"control {control!r} cannot also be a treatment")
    if len(set(arms)) != len(arms):
        raise ValueError(f"duplicate treatment arms: {arms}")
    if correction not in ("holm", "bonferroni", "none"):
        raise ValueError(
            f"correction must be holm|bonferroni|none, got {correction!r}"
        )
    keys = list(by)
    per_group = (
        df.filter(F.col(group_col).isin(control, *arms))
        .groupBy(*keys, group_col)
        .agg(
            F.count(metric_col).alias("n"),
            F.avg(metric_col).alias("m"),
            F.var_samp(metric_col).alias("v"),
        )
        .filter(F.col("n") >= 2)
    )
    c = per_group.filter(F.col(group_col) == control).select(
        *keys,
        F.col("n").alias("n_control"),
        F.col("m").alias("mean_control"),
        F.col("v").alias("__vc"),
    )
    t_ = per_group.filter(F.col(group_col) != control).select(
        *keys,
        F.col(group_col).alias("treatment"),
        F.col("n").alias("n_treatment"),
        F.col("m").alias("mean_treatment"),
        F.col("v").alias("__vt"),
    )
    joined = c.join(t_, keys) if keys else c.crossJoin(t_)
    se_c = F.col("__vc") / F.col("n_control")
    se_t = F.col("__vt") / F.col("n_treatment")
    se2 = se_c + se_t
    tstat = (F.col("mean_treatment") - F.col("mean_control")) / F.sqrt(se2)
    dof = (se2 * se2) / (
        (se_c * se_c) / (F.col("n_control") - 1)
        + (se_t * se_t) / (F.col("n_treatment") - 1)
    )
    p_raw = normal_sf2(tstat)
    base = joined.select(
        *keys,
        "treatment",
        "n_control",
        F.round("mean_control", 6).alias("mean_control"),
        "n_treatment",
        F.round("mean_treatment", 6).alias("mean_treatment"),
        F.round(F.col("mean_treatment") - F.col("mean_control"), 6).alias("diff"),
        F.round(tstat, 6).alias("t_stat"),
        F.round(dof, 6).alias("df"),
        p_raw.alias("__p"),
    )
    k_cell = F.count(F.lit(1)).over(Window.partitionBy(*keys))
    if correction == "bonferroni":
        p_adj = F.least(F.lit(1.0), F.col("__p") * k_cell)
    elif correction == "none":
        p_adj = F.col("__p")
    else:  # holm step-down
        rnk = F.row_number().over(
            Window.partitionBy(*keys).orderBy(F.col("__p").asc(), "treatment")
        )
        stepped = F.col("__p") * (k_cell - rnk + 1)
        # running max over ascending-p order enforces monotonicity
        p_adj = F.least(
            F.lit(1.0),
            F.max(stepped).over(
                Window.partitionBy(*keys)
                .orderBy(F.col("__p").asc(), "treatment")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    return base.select(
        *keys,
        "treatment",
        "n_control",
        "mean_control",
        "n_treatment",
        "mean_treatment",
        "diff",
        "t_stat",
        "df",
        F.round(F.col("__p"), 6).alias("p_value"),
        F.round(p_adj, 6).alias("p_adjusted"),
        (p_adj < 0.05).alias("significant_05"),
    )


def required_sample_size(
    mde: float,
    sd: float,
    alpha: float = 0.05,
    power: float = 0.8,
    two_sided: bool = True,
) -> int:
    """Per-arm n for a two-sample mean test to detect `mde` (absolute
    difference) with metric standard deviation `sd`:
    n = ((z_{α[/2]} + z_{power})·sd·√2 / mde)² — the planning-side
    companion to welch_ttest (driver-side pure math; z via a standard
    rational inverse-normal approximation, |ε| < 4.5e-4)."""
    import math as _m

    if mde <= 0 or sd <= 0:
        raise ValueError("mde and sd must be positive")
    if not (0 < alpha < 1 and 0 < power < 1):
        raise ValueError("alpha and power must be in (0, 1)")

    def z(p: float) -> float:
        # Beasley-Springer-Moro / Moro's rational approximation
        a = [2.50662823884, -18.61500062529, 41.39119773534, -25.44106049637]
        b = [-8.47351093090, 23.08336743743, -21.06224101826, 3.13082909833]
        c = [0.3374754822726147, 0.9761690190917186, 0.1607979714918209,
             0.0276438810333863, 0.0038405729373609, 0.0003951896511919,
             0.0000321767881768, 0.0000002888167364, 0.0000003960315187]
        y = p - 0.5
        if abs(y) < 0.42:
            r = y * y
            num = y * (((a[3] * r + a[2]) * r + a[1]) * r + a[0])
            den = (((b[3] * r + b[2]) * r + b[1]) * r + b[0]) * r + 1.0
            return num / den
        r = p if y < 0 else 1.0 - p
        s = _m.log(-_m.log(r))
        t = c[0]
        for i in range(1, 9):
            t += c[i] * s**i
        return -t if y < 0 else t

    za = z(1 - alpha / 2) if two_sided else z(1 - alpha)
    zb = z(power)
    n = ((za + zb) * sd * _m.sqrt(2.0) / mde) ** 2
    return int(_m.ceil(n))
