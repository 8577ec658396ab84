"""Distribution-drift monitoring: PSI over aligned histograms.

The data-quality companion to operators/expectations.py: expectations
catch RULE violations (nulls, ranges, references); drift catches
DISTRIBUTION shift — the silent failure mode of long-running ingest
and model-feature pipelines (a feature whose histogram slides keeps
passing every row-level rule). Population Stability Index is the
industry-standard score: PSI = Σ (aᵢ − eᵢ)·ln(aᵢ/eᵢ) over aligned
bins; < 0.1 stable, 0.1–0.25 moderate shift, > 0.25 action.

Scale shape: the reference side is profiled ONCE into (edges, shares)
— a 2-scalar collect for the range (bounded by contract, same as any
frozen-artifact fit step) and one bin-keyed aggregate; each scored
side (a batch, or every micro-batch in the streaming monitor) pays one
pass + one n_bins-row aggregate against the FROZEN edges, so drift
scoring adds O(bins) driver data per batch, never data-sized state.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: share floor: keeps ln() finite when a bin is empty on one side (the
#: standard PSI smoothing; scores above ~0.25 are saturated anyway)
_EPS = 1.0e-6


def fit_reference_histogram(
    ref: DataFrame, value_col: str, n_bins: int = 10
) -> dict:
    """Freeze the reference distribution: {'lo', 'hi', 'n', 'shares'}
    (shares is a dense n_bins list summing to 1). The ONLY driver
    materialization in the module — n_bins + 2 scalars, fit once and
    reused for every future scoring pass (persist it next to the model
    the same way you persist the quantile edges of a discretizer)."""
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    x = ref.select(F.col(value_col).cast("double").alias("x")).filter(
        F.col("x").isNotNull()
    )
    rng = x.agg(
        F.min("x").alias("lo"), F.max("x").alias("hi"), F.count("x").alias("n")
    ).first()
    if not rng.n:
        raise ValueError("reference has no non-NULL values to profile")
    lo, hi, n = float(rng.lo), float(rng.hi), int(rng.n)
    counts = dict(
        (int(r.bin), int(r.n))
        for r in _bin_counts(x, lo, hi, n_bins).collect()
    )
    shares = [counts.get(i, 0) / n for i in range(n_bins)]
    return {"lo": lo, "hi": hi, "n": n, "shares": shares}


def _bin_counts(x: DataFrame, lo: float, hi: float, n_bins: int) -> DataFrame:
    """(bin, n) against FIXED edges; out-of-range clamps to edge bins
    (drift wants to SEE mass piling outside the reference range)."""
    if hi > lo:
        raw = F.floor((F.col("x") - F.lit(lo)) / F.lit((hi - lo) / n_bins))
        bin_ = F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1)).cast("int")
    else:
        bin_ = F.lit(0)
    return x.select(bin_.alias("bin")).groupBy("bin").agg(
        F.count(F.lit(1)).alias("n")
    )


def psi_score(
    current: DataFrame, value_col: str, reference: dict
) -> dict:
    """Score one frame against a frozen reference: {'psi', 'n',
    'bin_shares'}. One pass over `current`, one n_bins-row aggregate."""
    shares = reference["shares"]
    n_bins = len(shares)
    x = current.select(F.col(value_col).cast("double").alias("x")).filter(
        F.col("x").isNotNull()
    )
    rows = _bin_counts(x, reference["lo"], reference["hi"], n_bins).collect()
    counts = {int(r.bin): int(r.n) for r in rows}
    n = sum(counts.values())
    cur = [counts.get(i, 0) / n if n else 0.0 for i in range(n_bins)]
    psi = 0.0
    for e, a in zip(shares, cur):
        e = max(e, _EPS)
        a = max(a, _EPS)
        psi += (a - e) * math.log(a / e)
    return {"psi": round(psi, 6), "n": n, "bin_shares": cur}


def stream_drift_monitor(
    stream: DataFrame,
    value_col: str,
    reference: dict,
    sink: list | None = None,
    checkpoint: str | None = None,
):
    """Continuously score a stream's micro-batches against the frozen
    reference: each batch appends {'batch_id', 'psi', 'n'} to `sink`
    (or your own foreachBatch wrapper around psi_score). Per-batch cost
    is one pass over the batch + an n_bins-row aggregate — no state
    grows with the stream. Returns the started StreamingQuery."""
    out = sink if sink is not None else []

    def score(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        r = psi_score(batch_df, value_col, reference)
        out.append({"batch_id": batch_id, "psi": r["psi"], "n": r["n"]})

    writer = stream.writeStream.foreachBatch(score).outputMode("append")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()
