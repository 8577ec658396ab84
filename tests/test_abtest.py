"""Welch t-test: statistics vs a pure-python reference (math.erf for
the normal tail), a planted true effect detected, A/A silent, and the
erf polynomial accuracy pin."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F


def _welch_ref(a, b):
    na, nb = len(a), len(b)
    ma, mb = sum(a) / na, sum(b) / nb
    va = sum((x - ma) ** 2 for x in a) / (na - 1)
    vb = sum((x - mb) ** 2 for x in b) / (nb - 1)
    se2 = va / na + vb / nb
    t = (mb - ma) / math.sqrt(se2)
    dof = se2**2 / ((va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))
    p = 2 * (1 - 0.5 * (1 + math.erf(abs(t) / math.sqrt(2))))
    return t, dof, p


def test_erf_polynomial_accuracy(spark):
    from distributedqueryengine_spark.operators.abtest import erf_approx

    xs = [x / 10 for x in range(-40, 41)]
    df = spark.createDataFrame([(x,) for x in xs], "x double")
    got = {r.x: r.e for r in df.select("x", erf_approx(F.col("x")).alias("e")).collect()}
    for x in xs:
        assert abs(got[x] - math.erf(x)) < 1.5e-7, x


def test_welch_ttest_matches_reference(spark):
    from distributedqueryengine_spark.operators.abtest import welch_ttest

    rng = random.Random(3)
    control = [rng.gauss(10.0, 2.0) for _ in range(400)]
    treat = [rng.gauss(10.4, 3.0) for _ in range(350)]  # true effect +0.4
    rows = [("c", v) for v in control] + [("t", v) for v in treat]
    df = spark.createDataFrame(rows, "grp string, metric double")

    out = welch_ttest(df, "grp", "metric", control="c", treatment="t").first()
    t_ref, df_ref, p_ref = _welch_ref(control, treat)
    assert out.n_control == 400 and out.n_treatment == 350
    assert abs(out.t_stat - t_ref) < 1e-5
    assert abs(out.df - df_ref) < 1e-3
    assert abs(out.p_value_normal - p_ref) < 1e-5
    assert out.p_value_normal < 0.1  # the planted effect is visible

    # A/A: same distribution split at random → no significant effect
    aa = [("c" if rng.random() < 0.5 else "t", rng.gauss(5.0, 1.0)) for _ in range(2000)]
    aa_df = spark.createDataFrame(aa, "grp string, metric double")
    aa_out = welch_ttest(aa_df, "grp", "metric", control="c", treatment="t").first()
    assert aa_out.p_value_normal > 0.01  # not spuriously significant


def test_welch_ttest_by_cells_and_guards(spark):
    from distributedqueryengine_spark.operators.abtest import welch_ttest

    rng = random.Random(9)
    rows = []
    for seg, lift in (("mobile", 1.0), ("web", 0.0)):
        for _ in range(300):
            rows.append((seg, "c", rng.gauss(10, 2)))
            rows.append((seg, "t", rng.gauss(10 + lift, 2)))
    # a segment with a missing variant must be dropped, not error
    rows += [("empty_seg", "c", 1.0), ("empty_seg", "c", 2.0)]
    df = spark.createDataFrame(rows, "seg string, grp string, metric double")
    out = {
        r.seg: r
        for r in welch_ttest(
            df, "grp", "metric", control="c", treatment="t", by=["seg"]
        ).collect()
    }
    assert set(out) == {"mobile", "web"}
    assert out["mobile"].p_value_normal < 0.001  # 0.5σ lift at n=300
    assert out["mobile"].diff > 0.5
    assert out["web"].p_value_normal > 0.001 or abs(out["web"].diff) < 0.5


def test_proportion_ztest_matches_reference(spark):
    from distributedqueryengine_spark.operators.abtest import proportion_ztest

    # control: 120/1000, treatment: 150/1000
    rows = [("c", 1)] * 120 + [("c", 0)] * 880 + [("t", 1)] * 150 + [("t", 0)] * 850
    df = spark.createDataFrame(rows, "grp string, conv int")
    out = proportion_ztest(df, "grp", "conv", control="c", treatment="t").first()

    pc, pt = 0.12, 0.15
    pooled = (120 + 150) / 2000
    se = math.sqrt(pooled * (1 - pooled) * (1 / 1000 + 1 / 1000))
    z_ref = (pt - pc) / se
    p_ref = 2 * (1 - 0.5 * (1 + math.erf(abs(z_ref) / math.sqrt(2))))
    assert out.rate_control == 0.12 and out.rate_treatment == 0.15
    assert abs(out.z_stat - z_ref) < 1e-5
    assert abs(out.p_value - p_ref) < 1e-5
    assert out.p_value < 0.06  # a real lift at this n


def test_srm_check_detects_mismatch(spark):
    import pytest as _pytest

    from distributedqueryengine_spark.operators.abtest import srm_check

    # healthy 50/50
    ok_rows = [("c",)] * 5000 + [("t",)] * 5010
    ok = srm_check(
        spark.createDataFrame(ok_rows, "grp string"), "grp", {"c": 0.5, "t": 0.5}
    ).first()
    assert not ok.srm and ok.p_value > 0.5

    # broken: 10% of treatment traffic lost
    bad_rows = [("c",)] * 5000 + [("t",)] * 4500
    bad = srm_check(
        spark.createDataFrame(bad_rows, "grp string"), "grp", {"c": 0.5, "t": 0.5}
    ).first()
    assert bad.srm and bad.p_value < 0.001
    # Wilson-Hilferty p within tolerance of the exact df=1 tail:
    # P(chi2_1 > x) = 2*(1 - Phi(sqrt(x)))
    exact = 2 * (1 - 0.5 * (1 + math.erf(math.sqrt(bad.chi2) / math.sqrt(2))))
    assert abs(bad.p_value - exact) < 2e-3

    # unexpected variant raises loudly at materialization
    weird = spark.createDataFrame([("c",), ("t",), ("mystery",)], "grp string")
    with _pytest.raises(Exception, match="unexpected variant"):
        srm_check(weird, "grp", {"c": 0.5, "t": 0.5}).collect()


def test_cuped_reduces_variance_and_preserves_effect(spark):
    """CUPED against a correlated pre-period covariate: per-row values
    equal the python reference, variance shrinks ~(1-rho^2), the
    treatment effect estimate is unchanged, and the t-test on the
    adjusted metric is MORE significant than on the raw one."""
    import statistics

    from distributedqueryengine_spark.operators.abtest import (
        cuped_adjust,
        welch_ttest,
    )

    rng = random.Random(17)
    rows = []
    for i in range(1500):
        pre = rng.gauss(100, 20)                   # pre-period behavior
        grp = "t" if i % 2 else "c"
        lift = 2.0 if grp == "t" else 0.0
        post = 0.8 * pre + rng.gauss(20, 8) + lift  # strongly correlated
        rows.append((i, grp, pre, post))
    df = spark.createDataFrame(rows, "uid long, grp string, pre double, post double")

    adj = cuped_adjust(df, "post", "pre")
    got = {r.uid: r.post_cuped for r in adj.collect()}

    # python reference
    xs = [r[2] for r in rows]
    ys = [r[3] for r in rows]
    mx, my = statistics.mean(xs), statistics.mean(ys)
    cxy = sum((a - mx) * (b - my) for a, b in zip(xs, ys)) / (len(xs) - 1)
    vx = statistics.variance(xs)
    theta = cxy / vx
    for uid, grp, pre, post in rows[:200]:
        ref = post - theta * (pre - mx)
        assert abs(got[uid] - ref) < 1e-4, uid

    raw_var = statistics.variance(ys)
    adj_var = statistics.variance(list(got.values()))
    assert adj_var < 0.5 * raw_var  # rho ~0.9 → big reduction

    raw = welch_ttest(df, "grp", "post", control="c", treatment="t").first()
    cup = welch_ttest(adj, "grp", "post_cuped", control="c", treatment="t").first()
    assert abs(cup.diff - raw.diff) < 1.0          # effect preserved
    assert abs(cup.t_stat) > abs(raw.t_stat)       # sensitivity gained
    assert cup.p_value_normal <= raw.p_value_normal

    # NULL covariate passes through unadjusted
    with_null = spark.createDataFrame(
        [(1, "c", None, 5.0), (2, "t", 1.0, 6.0), (3, "t", 3.0, 7.0)],
        "uid long, grp string, pre double, post double",
    )
    out = {r.uid: r.post_cuped for r in cuped_adjust(with_null, "post", "pre").collect()}
    assert out[1] == 5.0


def test_srm_check_flags_missing_variant(spark):
    """An expected arm with ZERO observed rows is the most extreme
    sample-ratio mismatch: it must contribute (0-E)^2/E and flag,
    with df = len(expected_ratios)-1, not divide-by-zero into NULLs
    (r8 advice)."""
    import pytest as _pytest

    from distributedqueryengine_spark.operators.abtest import srm_check

    only_c = spark.createDataFrame([("c",)] * 1000, "grp string")
    row = srm_check(only_c, "grp", {"c": 0.5, "t": 0.5}).first()
    assert row.df == 1
    assert row.chi2 == 1000.0  # (1000-500)^2/500 + (0-500)^2/500
    assert row.srm and row.p_value is not None and row.p_value < 1e-6

    # three arms, one dead, per by-cell
    rows = [("x", "c")] * 400 + [("x", "t1")] * 400 + [("y", "c")] * 300 + [
        ("y", "t1")
    ] * 350 + [("y", "t2")] * 310
    df3 = spark.createDataFrame(rows, "cell string, grp string")
    out = {
        r.cell: r
        for r in srm_check(
            df3, "grp", {"c": 1 / 3, "t1": 1 / 3, "t2": 1 / 3}, by=["cell"]
        ).collect()
    }
    assert out["x"].df == 2 and out["y"].df == 2
    assert out["x"].srm  # t2 entirely missing in cell x
    assert not out["y"].srm  # roughly balanced three arms

    # NULL variant is an unexpected variant: loud in-plan failure
    withnull = spark.createDataFrame(
        [("c",), ("t",), (None,)], "grp string"
    )
    with _pytest.raises(Exception, match="unexpected variant"):
        srm_check(withnull, "grp", {"c": 0.5, "t": 0.5}).collect()

    # degenerate single-arm config is rejected up front
    with _pytest.raises(ValueError, match=">= 2"):
        srm_check(only_c, "grp", {"c": 1.0})


def test_srm_check_rejects_nonpositive_ratio(spark):
    """A zero/negative expected ratio would make (n-0)^2/0 an Infinity
    chi2 with a NULL srm flag — rejected loudly instead."""
    import pytest

    from distributedqueryengine_spark.operators.abtest import srm_check

    df = spark.createDataFrame([("a",), ("b",)], "grp string")
    with pytest.raises(ValueError, match="> 0"):
        srm_check(df, "grp", {"a": 1.0, "b": 0.0})
    with pytest.raises(ValueError, match="> 0"):
        srm_check(df, "grp", {"a": 1.5, "b": -0.5})


def test_msprt_always_valid_matches_reference_and_behaves(spark):
    """mSPRT vs the python formula on random shapes; A/A stays
    insignificant across repeated looks while a planted effect drives
    p below alpha as data accumulates (the peeking-safety property the
    fixed-n t-test lacks)."""
    from distributedqueryengine_spark.operators.abtest import (
        msprt_always_valid,
    )

    rng = random.Random(42)

    def run(effect, n):
        rows = [("c", rng.gauss(10, 2)) for _ in range(n)] + [
            ("t", rng.gauss(10 + effect, 2)) for _ in range(n)
        ]
        df = spark.createDataFrame(rows, "grp string, m double")
        r = msprt_always_valid(df, "grp", "m", "c", "t", tau2=0.5).collect()[0]
        # python reference
        cs = [m for g, m in rows if g == "c"]
        ts = [m for g, m in rows if g == "t"]
        mc, mt = sum(cs) / len(cs), sum(ts) / len(ts)
        vc = sum((x - mc) ** 2 for x in cs) / (len(cs) - 1)
        vt = sum((x - mt) ** 2 for x in ts) / (len(ts) - 1)
        v = vc / len(cs) + vt / len(ts)
        lam = math.sqrt(v / (v + 0.5)) * math.exp(
            (mt - mc) ** 2 * 0.5 / (2 * v * (v + 0.5))
        )
        p_ref = min(1.0, 1.0 / lam)
        assert abs(r.p_always_valid - p_ref) < 1e-4, (n, effect)
        return r.p_always_valid

    # A/A: min over 5 looks stays above alpha
    aa = [run(0.0, n) for n in (50, 100, 200, 400, 800)]
    assert min(aa) > 0.05, aa
    # planted effect: p crosses alpha by the largest look
    ab = [run(1.0, n) for n in (50, 100, 200, 400, 800)]
    assert min(ab) < 0.01, ab

    import pytest

    df = spark.createDataFrame([("c", 1.0)], "grp string, m double")
    with pytest.raises(ValueError, match="tau2"):
        msprt_always_valid(df, "grp", "m", "c", "t", tau2=0.0)


def test_pairwise_ttests_holm_matches_reference(spark):
    """Multi-arm Welch + Holm vs a python reference: per-arm stats
    equal welch_ttest's, Holm adjustment matches the step-down formula,
    and only the planted-effect arm survives correction."""
    from distributedqueryengine_spark.operators.abtest import (
        pairwise_ttests,
        welch_ttest,
    )

    rng = random.Random(5)
    arms = {"t1": 0.0, "t2": 1.2, "t3": 0.05}
    rows = [("c", rng.gauss(10, 2)) for _ in range(400)]
    for arm, lift in arms.items():
        rows += [(arm, rng.gauss(10 + lift, 2)) for _ in range(400)]
    df = spark.createDataFrame(rows, "grp string, m double")
    out = {
        r.treatment: r
        for r in pairwise_ttests(
            df, "grp", "m", "c", ["t1", "t2", "t3"]
        ).collect()
    }
    assert set(out) == set(arms)
    # per-arm stats equal the two-variant operator's
    for arm in arms:
        solo = welch_ttest(df, "grp", "m", "c", arm).collect()[0]
        assert abs(out[arm].t_stat - solo.t_stat) < 1e-9
        assert abs(out[arm].p_value - solo.p_value_normal) < 1e-6
    # python Holm reference
    ps = sorted((out[a].p_value, a) for a in arms)
    k, run, expect = len(ps), 0.0, {}
    for i, (p, a) in enumerate(ps):
        run = max(run, p * (k - i))
        expect[a] = min(1.0, run)
    for a in arms:
        assert abs(out[a].p_adjusted - expect[a]) < 1e-4, a
    assert out["t2"].significant_05
    assert not out["t1"].significant_05
    # bonferroni is k*p
    bon = {
        r.treatment: r.p_adjusted
        for r in pairwise_ttests(
            df, "grp", "m", "c", ["t1", "t2", "t3"],
            correction="bonferroni",
        ).collect()
    }
    for a in arms:
        assert abs(bon[a] - min(1.0, out[a].p_value * 3)) < 1e-4

    import pytest

    with pytest.raises(ValueError, match="cannot also"):
        pairwise_ttests(df, "grp", "m", "c", ["c", "t1"])


def test_required_sample_size_reference_values(spark):
    """Pinned against the standard formula: mde=0.1σ, α=0.05, power=0.8
    → n ≈ 1570 per arm (2·(1.96+0.8416)²·100)."""
    from distributedqueryengine_spark.operators.abtest import (
        required_sample_size,
    )

    n = required_sample_size(mde=0.2, sd=2.0, alpha=0.05, power=0.8)
    ref = 2 * (1.959964 + 0.841621) ** 2 * (2.0 / 0.2) ** 2
    assert abs(n - ref) <= 2
    # monotone: smaller effect or higher power needs more samples
    assert required_sample_size(0.1, 2.0) > n
    assert required_sample_size(0.2, 2.0, power=0.9) > n
    import pytest

    with pytest.raises(ValueError):
        required_sample_size(0.0, 1.0)
