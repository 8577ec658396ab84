"""ML evaluation: exact AUC vs a rank-based python reference (ties
included), threshold report vs hand counts, calibration/ECE semantics."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from distributedqueryengine_spark.operators.mleval import (
    calibration_table,
    ece,
    roc_auc,
    threshold_report,
)


def _auc_ref(pairs):
    """Mann-Whitney with average ranks (ties counted half)."""
    pos = [s for s, y in pairs if y == 1]
    neg = [s for s, y in pairs if y == 0]
    u = 0.0
    for p in pos:
        for n in neg:
            u += 1.0 if p > n else (0.5 if p == n else 0.0)
    return u / (len(pos) * len(neg))


def test_roc_auc_matches_reference_with_ties(spark):
    rng = random.Random(13)
    pairs = []
    for _ in range(400):
        y = rng.random() < 0.4
        # overlapping distributions + heavy ties (quantized scores)
        s = round(rng.gauss(0.62 if y else 0.45, 0.18), 2)
        pairs.append((s, int(y)))
    df = spark.createDataFrame(pairs, "score double, label int")
    got = roc_auc(df, "score", "label", score_buckets=64)
    ref = _auc_ref(pairs)
    assert abs(got - ref) < 1e-9
    assert 0.6 < got < 0.9  # separable but noisy

    # degenerate: single class raises
    ones = spark.createDataFrame([(0.5, 1), (0.7, 1)], "score double, label int")
    with pytest.raises(ValueError, match="one class"):
        roc_auc(ones, "score", "label")

    # perfect separation = 1.0; random labels on constant score = 0.5
    perf = spark.createDataFrame(
        [(0.9, 1)] * 5 + [(0.1, 0)] * 5, "score double, label int"
    )
    assert roc_auc(perf, "score", "label") == 1.0
    const = spark.createDataFrame(
        [(0.5, 1)] * 7 + [(0.5, 0)] * 3, "score double, label int"
    )
    assert roc_auc(const, "score", "label") == 0.5


def test_threshold_report_matches_hand_counts(spark):
    rows = [(0.9, 1), (0.8, 0), (0.7, 1), (0.4, 1), (0.3, 0), (0.1, 0)]
    df = spark.createDataFrame(rows, "score double, label int")
    rep = {r.threshold: r for r in threshold_report(df, "score", "label", [0.5, 0.75]).collect()}
    r5 = rep[0.5]
    assert (r5.tp, r5.fp, r5.fn, r5.tn) == (2, 1, 1, 2)
    assert abs(r5.precision - 2 / 3) < 1e-6 and abs(r5.recall - 2 / 3) < 1e-6
    r75 = rep[0.75]
    assert (r75.tp, r75.fp, r75.fn, r75.tn) == (1, 1, 2, 2)
    # one aggregate pass: both thresholds from the same job (smoke: no error)


def test_calibration_and_ece(spark):
    rng = random.Random(7)
    # perfectly calibrated scores: P(y=1) == score
    cal = [(round(rng.random(), 4),) for _ in range(20000)]
    cal_rows = [(s, 1 if rng.random() < s else 0) for (s,) in cal]
    df = spark.createDataFrame(cal_rows, "score double, label int")
    tab = calibration_table(df, "score", "label", n_bins=10).collect()
    assert [r.bin for r in tab] == list(range(10))
    assert all(r.gap < 0.05 for r in tab), [(r.bin, r.gap) for r in tab]
    assert ece(df, "score", "label") < 0.02

    # systematically overconfident model: score 0.9, true rate 0.5
    over_rows = [(0.9, 1 if rng.random() < 0.5 else 0) for _ in range(5000)]
    over = spark.createDataFrame(over_rows, "score double, label int")
    assert ece(over, "score", "label") > 0.3
    # out-of-range scores clamp into edge bins rather than vanishing
    oob = spark.createDataFrame([(1.7, 1), (-0.3, 0)], "score double, label int")
    t = calibration_table(oob, "score", "label", n_bins=5).collect()
    assert {r.bin for r in t} == {0, 4} and sum(r.n for r in t) == 2


def test_roc_auc_df_and_ece_df_variants(spark):
    """Frame-returning variants compose lazily in pipelines: same values
    as the scalar APIs, 1-row frames, NULL (not raise) on degenerate
    input with the counts visible."""
    import math
    import random

    from distributedqueryengine_spark.operators.mleval import (
        ece,
        ece_df,
        roc_auc,
        roc_auc_df,
    )

    rng = random.Random(11)
    rows = [
        (min(1.0, max(0.0, rng.gauss(0.65 if y else 0.35, 0.2))), int(y))
        for y in [rng.random() < 0.4 for _ in range(2000)]
    ]
    df = spark.createDataFrame(rows, "score double, label int")

    r = roc_auc_df(df, "score", "label").collect()
    assert len(r) == 1
    assert math.isclose(r[0]["auc"], roc_auc(df, "score", "label"), abs_tol=1e-12)
    assert r[0]["n_pos"] + r[0]["n_neg"] == 2000

    e = ece_df(df, "score", "label").collect()[0]
    assert math.isclose(e["ece"], ece(df, "score", "label"), abs_tol=1e-6)
    assert e["n"] == 2000

    # degenerate: one class only -> NULL auc, counts visible; empty -> NULL ece
    onec = spark.createDataFrame([(0.5, 1), (0.7, 1)], "score double, label int")
    row = roc_auc_df(onec, "score", "label").collect()[0]
    assert row["auc"] is None and row["n_pos"] == 2 and row["n_neg"] == 0
    erow = ece_df(df.limit(0), "score", "label").collect()[0]
    assert erow["ece"] is None and erow["n"] == 0


def test_roc_auc_df_empty_input_counts_are_zero(spark):
    """roc_auc_df on an empty frame reports n_pos=n_neg=0 (not NULL) so
    the caller can see WHY auc is NULL, as the docstring promises."""
    from distributedqueryengine_spark.operators.mleval import roc_auc_df

    df = spark.createDataFrame([], "score double, label int")
    row = roc_auc_df(df, "score", "label").collect()[0]
    assert row["auc"] is None
    assert row["n_pos"] == 0 and row["n_neg"] == 0
