"""Deterministic weighted sampling (Efraimidis–Spirakis).

The sampling surface in queries.py (hash split, stratified systematic,
source-mixture quotas) is uniform-within-stratum; training pipelines
also need WEIGHTED selection — quality-score-proportional document
sampling, importance-weighted mixture draws — that stays deterministic
and single-pass at 100 TB.

Efraimidis–Spirakis reservoir: each row gets key u^(1/w) (u uniform,
w its weight); the global top-n keys are a without-replacement sample
with inclusion probability increasing in w. Here u derives from md5 of
the row key + seed (no rand(): reruns, retries, and different cluster
sizes select IDENTICAL rows), the per-row score is ln(u)/w (monotone in
u^(1/w), numerically safer), and top-n is TakeOrderedAndProject —
no global sort, no driver materialization beyond n rows' keys.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TWO60 = float(1 << 60)


def _uniform01(key: Column, seed: int) -> Column:
    """Deterministic uniform in (0, 1): 60 bits of md5(seed || key).
    The +1 keeps it strictly positive so ln(u) is finite."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws("§", F.lit(str(seed)), key)), 1, 15),
        16,
        10,
    ).cast("double")
    return (h + F.lit(1.0)) / F.lit(_TWO60 + 2.0)


def weighted_sample_n(
    df: DataFrame,
    weight_col: str | Column,
    n: int,
    key_cols: Sequence[str],
    seed: int = 42,
) -> DataFrame:
    """Without-replacement weighted sample of exactly n rows (or all
    rows with positive weight, if fewer). Rows with weight <= 0 or NULL
    are never selected. `key_cols` must uniquely identify rows — the
    randomness is a pure function of (seed, key), which is what makes
    the draw reproducible across engines and reruns."""
    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    if not key_cols:
        raise ValueError("key_cols must name the row-identity columns")
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
    score = F.log(_uniform01(key, seed)) / w.cast("double")
    return (
        df.filter(w.isNotNull() & (w > 0))
        .withColumn("__es_score", score)
        .orderBy(F.col("__es_score").desc())
        .limit(n)
        .drop("__es_score")
    )
