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


def _write_scores(batch_df, batch_id, path, rows, schema):
    """Land per-batch monitor scores in parquet via the effectively-once
    batch-id-partition sink (streaming/sinks.py): a replayed batch
    rewrites exactly its own `batch_id=<n>` partition, so scores never
    duplicate across restarts."""
    from distributedqueryengine_spark.streaming.sinks import (
        write_batch_idempotent,
    )

    score_df = batch_df.sparkSession.createDataFrame(rows, schema)
    write_batch_idempotent(score_df, batch_id, path)


def stream_drift_monitor(
    stream: DataFrame,
    value_col: str,
    reference: dict,
    sink: list | None = None,
    checkpoint: str | None = None,
    path: str | None = None,
):
    """Continuously score a stream's micro-batches against the frozen
    reference: each batch appends {'batch_id', 'psi', 'n'} to `sink`
    (driver-side, for tests/ad-hoc) and/or — the production path —
    writes one score row into the parquet directory `path`, partitioned
    by batch_id with replay-idempotent dynamic overwrite (pass
    `checkpoint` so the engine replays the same batch ids; a restart
    then rewrites, never duplicates, score rows). Per-batch cost is one
    pass over the batch + an n_bins-row aggregate — no state grows with
    the stream. Returns the started StreamingQuery."""
    out = sink if sink is not None else []

    def score(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        r = psi_score(batch_df, value_col, reference)
        if sink is not None or path is None:
            out.append({"batch_id": batch_id, "psi": r["psi"], "n": r["n"]})
        if path is not None:
            _write_scores(
                batch_df, batch_id, path,
                [(float(r["psi"]), int(r["n"]))], "psi double, n long",
            )

    writer = stream.writeStream.foreachBatch(score).outputMode("append")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


# ------------------------------------------------- categorical drift

OTHER = "<other>"


def fit_reference_categories(
    ref: DataFrame, value_col: str, top_n: int = 50
) -> dict:
    """Freeze a categorical distribution: {'categories': [...],
    'shares': {cat: share}} over the top_n categories by count
    (deterministic tiebreak by value) with everything else pooled into
    '<other>' — the pooling is what keeps scoring aligned when new
    categories appear in production (they land in OTHER instead of
    breaking the score). Driver data is top_n+1 scalars."""
    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")
    x = ref.select(F.col(value_col).cast("string").alias("x")).filter(
        F.col("x").isNotNull()
    )
    counts = x.groupBy("x").agg(F.count(F.lit(1)).alias("n"))
    top = counts.orderBy(F.col("n").desc(), F.col("x").asc()).limit(top_n).collect()
    total = x.count()
    if not total:
        raise ValueError("reference has no non-NULL values to profile")
    cats = [r.x for r in top]
    shares = {r.x: r.n / total for r in top}
    shares[OTHER] = max(0.0, 1.0 - sum(shares.values()))
    return {"categories": cats, "shares": shares, "n": int(total)}


def categorical_psi_score(
    current: DataFrame, value_col: str, reference: dict
) -> dict:
    """PSI over the frozen category set (+ OTHER): {'psi', 'n',
    'shares'}. One pass + one (top_n+1)-row aggregate; unseen
    categories pool into OTHER rather than erroring."""
    cats = set(reference["categories"])
    x = current.select(F.col(value_col).cast("string").alias("x")).filter(
        F.col("x").isNotNull()
    )
    mapped = x.select(
        F.when(F.col("x").isin(*cats), F.col("x")).otherwise(F.lit(OTHER)).alias("c")
        if cats
        else F.lit(OTHER).alias("c")
    )
    rows = mapped.groupBy("c").agg(F.count(F.lit(1)).alias("n")).collect()
    n = sum(r.n for r in rows)
    cur = {r.c: r.n / n for r in rows} if n else {}
    psi = 0.0
    for cat in list(reference["shares"]):
        e = max(reference["shares"][cat], _EPS)
        a = max(cur.get(cat, 0.0), _EPS)
        psi += (a - e) * math.log(a / e)
    return {"psi": round(psi, 6), "n": n, "shares": cur}


def stream_categorical_drift_monitor(
    stream: DataFrame,
    value_col: str,
    reference: dict,
    sink: list | None = None,
    checkpoint: str | None = None,
    path: str | None = None,
):
    """Categorical counterpart of stream_drift_monitor: score each
    micro-batch's category shares against a fit_reference_categories
    result; appends {'batch_id', 'psi', 'n'} per batch to `sink`
    and/or writes a replay-idempotent score row per batch under
    parquet `path` (batch_id-partitioned dynamic overwrite — restarts
    rewrite, never duplicate). Same zero-growing-state contract."""
    out = sink if sink is not None else []

    def score(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        r = categorical_psi_score(batch_df, value_col, reference)
        if sink is not None or path is None:
            out.append({"batch_id": batch_id, "psi": r["psi"], "n": r["n"]})
        if path is not None:
            _write_scores(
                batch_df, batch_id, path,
                [(float(r["psi"]), int(r["n"]))], "psi double, n long",
            )

    writer = stream.writeStream.foreachBatch(score).outputMode("append")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()
