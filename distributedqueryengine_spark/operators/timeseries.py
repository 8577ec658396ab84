"""Time-series regularization: bucketed resampling with gap filling.

The continuous-aggregate counterpart to q_time_rollup's grouping-sets
rollup: real event streams have holes (no events in a bucket), and
downstream consumers (charts, models, window features) need a REGULAR
grid per key — every bucket present, missing values filled by policy
(NULL, zero, or forward-fill). Timescale calls this time_bucket_gapfill
+ locf; Spark has no built-in, so it composes here from:

1. one hash aggregate to (key, bucket) granularity,
2. a per-key [min_bucket, max_bucket] grid via explode(sequence(...))
   — narrow generation, row count = buckets per key, no join against a
   global calendar table,
3. a left join of observed values onto the grid (same key+bucket
   partitioning as the aggregate — AQE sees matching distributions),
4. forward fill as last(value, ignorenulls=True) over an unbounded
   preceding window per key.

One shuffle on the key for the aggregate/join + one window sort; the
grid never materializes more than max_buckets rows per key (guarded —
a mis-specified interval on a years-long series would otherwise
explode silently).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def resample_fill(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    interval_seconds: int,
    value_aggs: dict[str, Column],
    fill: str = "null",
    max_buckets_per_key: int = 1_000_000,
) -> DataFrame:
    """Regular per-key time grid at `interval_seconds` with
    `value_aggs` (name -> aggregate Column over the bucket's rows) and
    gap policy `fill` in {'null', 'zero', 'ffill'}. Output: key_cols +
    bucket_ts (epoch seconds, long) + one column per agg + `observed`
    (false on filled gap rows).

    'ffill' carries the last observed value forward (gaps before a
    key's first observation stay NULL — there is nothing to carry);
    'zero' fills numeric gaps with 0; 'null' leaves them NULL;
    'interp' linearly interpolates between the surrounding buckets
    where the VALUE is non-NULL (Timescale's interpolate();
    strictly-outside-the-observed-range rows stay NULL — there is no
    second anchor to draw a line to). Anchors are per value column: an
    observed bucket whose aggregate is NULL (e.g. sum over all-NULL
    rows) is itself interpolated and never serves as an anchor, so it
    cannot skew the slope of neighboring gaps. 'interp' requires
    numeric aggregates.
    """
    if fill not in ("null", "zero", "ffill", "interp"):
        raise ValueError(f"fill must be null|zero|ffill|interp, got {fill!r}")
    if interval_seconds <= 0:
        raise ValueError(f"interval_seconds must be positive, got {interval_seconds}")
    if not value_aggs:
        raise ValueError("value_aggs must name at least one aggregate")
    keys = list(key_cols)
    bucket = (
        F.floor(F.unix_timestamp(F.col(ts_col)) / interval_seconds)
        * interval_seconds
    ).cast("long")
    observed = (
        df.withColumn("__bucket", bucket)
        .groupBy(*keys, "__bucket")
        .agg(*[c.alias(n) for n, c in value_aggs.items()])
        .withColumn("observed", F.lit(True))
    )
    spans = observed.groupBy(*keys).agg(
        F.min("__bucket").alias("__lo"), F.max("__bucket").alias("__hi")
    )
    # grid-size guard, IN-PLAN: raise_error fires inside the sequence
    # expression the moment an oversized key is evaluated — rather than
    # silently exploding the grid — and costs zero extra jobs (the old
    # shape paid an eager count() per call; this stays lazy).
    guarded_lo = F.when(
        (F.col("__hi") - F.col("__lo")) / interval_seconds >= max_buckets_per_key,
        F.raise_error(
            F.lit(
                f"a key spans >= {max_buckets_per_key} buckets at "
                f"interval={interval_seconds}s; coarsen the interval or "
                "raise max_buckets_per_key"
            )
        ).cast("long"),
    ).otherwise(F.col("__lo"))
    grid = spans.select(
        *keys,
        F.explode(
            F.sequence(guarded_lo, F.col("__hi"), F.lit(interval_seconds).cast("long"))
        ).alias("__bucket"),
    )
    joined = grid.join(observed, [*keys, "__bucket"], "left").withColumn(
        "observed", F.coalesce("observed", F.lit(False))
    )
    names = list(value_aggs)
    if fill == "zero":
        joined = joined.na.fill({n: 0 for n in names})
    elif fill == "ffill":
        w = (
            Window.partitionBy(*keys)
            .orderBy("__bucket")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        for n in names:
            joined = joined.withColumn(
                n, F.last(n, ignorenulls=True).over(w)
            )
    elif fill == "interp":
        back = (
            Window.partitionBy(*keys)
            .orderBy("__bucket")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        fwd = (
            Window.partitionBy(*keys)
            .orderBy("__bucket")
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        for n in names:
            # Anchor the TIME on buckets where THIS value is non-NULL —
            # not merely observed: an observed bucket whose aggregate is
            # NULL (e.g. sum of all-NULL rows) must not desynchronize
            # the time anchor from the value anchor, or the slope for
            # neighboring gaps comes out wrong.
            val_bucket = F.when(F.col(n).isNotNull(), F.col("__bucket"))
            pb = F.last(val_bucket, ignorenulls=True).over(back)
            nb = F.first(val_bucket, ignorenulls=True).over(fwd)
            pv = F.last(n, ignorenulls=True).over(back)
            nv = F.first(n, ignorenulls=True).over(fwd)
            frac = (F.col("__bucket") - pb) / (nb - pb)
            line = pv + (nv - pv) * frac
            joined = joined.withColumn(
                n,
                F.when(F.col("observed") & F.col(n).isNotNull(), F.col(n)).otherwise(
                    F.when(
                        pb.isNotNull() & nb.isNotNull() & (nb != pb), line
                    ).otherwise(F.when(F.col("observed"), F.col(n))),
                ),
            )
    return joined.select(
        *keys, F.col("__bucket").alias("bucket_ts"), *names, "observed"
    )


def sessionize(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    gap_seconds: int,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Assign a session id to EVERY event row: a new session starts
    when the gap to the key's previous event exceeds `gap_seconds`.
    The batch, row-level complement of streaming session_window (which
    emits per-session AGGREGATES): downstream joins can attach
    session_id to raw events for funnel/attribution work.

    session_id = (key, epoch of the session's first event) — stable
    across recomputation and naturally unique per key without any
    global counter. Classic lag + conditional cumulative-sum over ONE
    window shuffle on the key; `tiebreak` columns order simultaneous
    events deterministically. Output: input columns + session_id
    (string) + session_start (long epoch seconds) + event_seq (1-based
    position within the session)."""
    if gap_seconds <= 0:
        raise ValueError(f"gap_seconds must be positive, got {gap_seconds}")
    keys = list(key_cols)
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in tiebreak]
    w = Window.partitionBy(*keys).orderBy(*order)
    epoch = F.unix_timestamp(F.col(ts_col))
    new_session = (
        F.when(F.lag(epoch).over(w).isNull(), 1)
        .when(epoch - F.lag(epoch).over(w) > gap_seconds, 1)
        .otherwise(0)
    )
    run = Window.partitionBy(*keys).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    with_run = df.withColumn("__sess_n", F.sum(new_session).over(run))
    sess_w = Window.partitionBy(*keys, "__sess_n")
    start = F.min(epoch).over(sess_w)
    seq_w = Window.partitionBy(*keys, "__sess_n").orderBy(*order)
    return (
        with_run.withColumn("session_start", start.cast("long"))
        .withColumn(
            "session_id",
            F.concat_ws("|", *[F.col(k).cast("string") for k in keys], F.col("session_start")),
        )
        .withColumn("event_seq", F.row_number().over(seq_w).cast("int"))
        .drop("__sess_n")
    )


def cohort_retention(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    period_seconds: int,
) -> DataFrame:
    """Cohort retention matrix: users grouped by their FIRST activity
    period (the cohort), then for each later period the count and
    fraction of the cohort still active — the standard
    product-analytics triangle (period_seconds = 86400*7 for weekly
    cohorts).

    Output: (cohort_period, periods_since, n_active, n_cohort,
    retention), one row per (cohort, offset) with activity;
    periods_since=0 rows have retention 1.0 by construction.

    Shape: activity collapses to DISTINCT (user, period) first — every
    later stage is user-period-sized, not event-sized; the cohort
    lookup is a user-keyed equi-join; the final matrix is a hash
    aggregate on (cohort, offset) joined against the BROADCAST
    cohort-size frame (one row per cohort period — dozens, not
    data-sized). The only event-row-sized stage is the first
    distinct."""
    if period_seconds <= 0:
        raise ValueError(f"period_seconds must be positive, got {period_seconds}")
    period = (
        F.floor(F.unix_timestamp(F.col(ts_col)) / period_seconds)
    ).cast("long")
    activity = (
        df.select(F.col(key_col).alias("u"), period.alias("p")).distinct()
    )
    cohorts = activity.groupBy("u").agg(F.min("p").alias("cohort_p"))
    sizes = cohorts.groupBy("cohort_p").agg(
        F.count(F.lit(1)).alias("n_cohort")
    )
    matrix = (
        activity.join(cohorts, "u")
        .groupBy(
            "cohort_p", (F.col("p") - F.col("cohort_p")).alias("periods_since")
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    return (
        matrix.join(F.broadcast(sizes), "cohort_p")
        .select(
            (F.col("cohort_p") * period_seconds).alias("cohort_period"),
            F.col("periods_since").cast("int"),
            "n_active",
            "n_cohort",
            F.round(F.col("n_active") / F.col("n_cohort"), 6).alias("retention"),
        )
    )


def funnel(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    step_col: str,
    steps: Sequence[str],
    within_seconds: int | None = None,
    max_events_per_key: int | None = None,
) -> DataFrame:
    """Ordered funnel per key: the earliest chronological completion of
    steps[0] → steps[1] → ... (each step at-or-after the previous;
    optionally the whole funnel within `within_seconds` of step 0).
    Output: (key, step_times array<long> — epoch of each step reached,
    NULL from the first miss on — and max_step, how many steps were
    completed).

    Spark-first shape: NO k-way self-join (the naive funnel plan —
    k joins on the event table — shuffles the events k times).
    Instead: filter to funnel events, collect each key's (ts, step)
    pairs sorted, and FOLD over them once with a higher-order
    aggregate whose accumulator is the step-time array. One shuffle
    (the groupBy key); per-key state is its funnel-event count —
    bounded by user activity, the same contract as any
    sessionization. The fold is a greedy earliest-match scan: without
    a window this provably yields the maximal completed prefix
    (earliest feasible step times only widen later feasibility); WITH
    `within_seconds` the funnel is anchored at the key's FIRST step-0
    event (first-touch attribution, the common dashboard definition) —
    a later step-0 occurrence that would complete inside a fresher
    window is deliberately not searched (any-touch anchoring is a
    different, quadratic-leaning semantics).

    Hot-key guard: per-key state is bounded by user activity, which is
    fine for human keys but unguarded against adversarial ones (a bot
    key with 10M step events would accumulate them all into one
    aggregation buffer — and unlike window operators, hash-aggregate
    buffers don't spill per-group). With `max_events_per_key` set, each
    key folds over only its EARLIEST `max_events_per_key` events by
    (ts, step) — a deterministic capped prefix — and the output gains
    `n_events` (the key's true funnel-event count) and `truncated`
    (whether the cap dropped anything). The capping row_number window
    spills to disk per partition, and the subsequent groupBy reuses its
    hash partitioning, so the plan stays at one exchange."""
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    if within_seconds is not None and within_seconds <= 0:
        raise ValueError(f"within_seconds must be positive, got {within_seconds}")
    if max_events_per_key is not None and max_events_per_key < len(steps):
        raise ValueError(
            f"max_events_per_key={max_events_per_key} cannot hold a "
            f"{len(steps)}-step funnel"
        )
    k = len(steps)
    steps_lit = F.array(*[F.lit(s) for s in steps])
    ev = df.filter(F.col(step_col).isin(*steps)).select(
        F.col(key_col).alias("u"),
        F.struct(
            F.unix_timestamp(F.col(ts_col)).alias("t"),
            F.col(step_col).alias("s"),
        ).alias("e"),
    )
    if max_events_per_key is not None:
        rn_w = Window.partitionBy("u").orderBy(F.col("e.t").asc(), F.col("e.s").asc())
        capped = ev.withColumn("__rn", F.row_number().over(rn_w))
        per_key = capped.groupBy("u").agg(
            F.array_sort(
                F.collect_list(
                    F.when(F.col("__rn") <= max_events_per_key, F.col("e"))
                )
            ).alias("evs"),
            F.max("__rn").alias("n_events"),
        )
    else:
        per_key = ev.groupBy("u").agg(
            F.array_sort(F.collect_list("e")).alias("evs")
        )
    init = F.array(*[F.lit(None).cast("long") for _ in range(k)])

    def fold(acc, e):
        def set_i(v, i):
            # i is 0-based; element_at is 1-based → element_at(acc, i)
            # reads slot i-1. Slot fills when: empty, step matches,
            # previous slot filled (or first), and the window holds.
            prev_ok = F.when(i == 0, F.lit(True)).otherwise(
                F.element_at(acc, i).isNotNull() & (e["t"] >= F.element_at(acc, i))
            )
            window_ok = (
                F.lit(True)
                if within_seconds is None
                else F.when(i == 0, F.lit(True)).otherwise(
                    F.element_at(acc, 1).isNotNull()
                    & (e["t"] - F.element_at(acc, 1) <= F.lit(within_seconds))
                )
            )
            fill = (
                v.isNull()
                & (e["s"] == F.element_at(steps_lit, i + 1))
                & prev_ok
                & window_ok
            )
            return F.when(fill, e["t"]).otherwise(v)

        return F.transform(acc, lambda v, i: set_i(v, i))

    extra = (
        [
            F.col("n_events").cast("long").alias("n_events"),
            (F.col("n_events") > F.lit(max_events_per_key)).alias("truncated"),
        ]
        if max_events_per_key is not None
        else []
    )
    out = per_key.select(
        F.col("u").alias(key_col),
        F.aggregate("evs", init, fold).alias("step_times"),
        *extra,
    )
    return out.withColumn(
        "max_step",
        F.size(F.filter("step_times", lambda t: t.isNotNull())).cast("int"),
    )


def funnel_counts(funnel_df: DataFrame, n_steps: int) -> DataFrame:
    """(step, n_keys, conversion): how many keys completed AT LEAST
    each step, from a `funnel` result — the summary the dashboard
    plots. conversion is vs step 1's population."""
    per_step = funnel_df.select(
        F.explode(F.sequence(F.lit(1), F.lit(n_steps))).alias("step"),
        F.col("max_step"),
    )
    counts = (
        per_step.groupBy("step")
        .agg(F.count_if(F.col("max_step") >= F.col("step")).alias("n_keys"))
        .orderBy("step")
    )
    from pyspark.sql.window import Window

    first = F.first("n_keys").over(
        Window.orderBy("step").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return counts.withColumn(
        "conversion", F.round(F.col("n_keys") / F.greatest(first, F.lit(1)), 6)
    )


def rolling_zscore(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    window_rows: int = 20,
    min_points: int = 5,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Per-row anomaly score: (value - rolling mean) / rolling stddev
    over the PRECEDING `window_rows` rows per key (the current row is
    excluded from its own baseline — a spike must not mask itself).
    NULL until `min_points` history rows exist or the window is
    constant (stddev 0). One window shuffle on the key; output adds
    `zscore` to the input columns."""
    if window_rows < 2:
        raise ValueError(f"window_rows must be >= 2, got {window_rows}")
    if not 2 <= min_points <= window_rows:
        raise ValueError(
            f"need 2 <= min_points <= window_rows, got {min_points}/{window_rows}"
        )
    keys = list(key_cols)
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in tiebreak]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(-window_rows, -1)
    )
    mean = F.avg(value_col).over(w)
    sd = F.stddev_samp(value_col).over(w)
    n = F.count(value_col).over(w)
    z = F.when(
        (n >= min_points) & sd.isNotNull() & (sd > 0),
        F.round((F.col(value_col) - mean) / sd, 6),
    )
    return df.withColumn("zscore", z)


def event_transitions(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    event_col: str,
    tiebreak: Sequence[str] = (),
    include_terminal: bool = False,
) -> DataFrame:
    """First-order Markov transition matrix over per-key event
    sequences: (from_event, to_event, n, p) where n counts adjacent
    pairs across all keys and p = P(to | from) — the user-journey /
    next-action summary every product-analytics stack derives from the
    same event tables the funnel and sessionization operators consume.

    `include_terminal=True` adds (last_event → NULL) rows so each
    from_event's outgoing p sums to 1 INCLUDING sequence ends;
    otherwise terminal events simply contribute no pair.

    Shape: one lag window per key (the same single shuffle contract as
    sessionize — ordered by ts + tiebreak for determinism under
    simultaneous events), then a hash aggregate on the (from, to) pair
    — output is alphabet²-sized, not event-sized. p is computed with a
    window over from_event on the already-tiny matrix."""
    keys = list(key_cols)
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in tiebreak]
    w = Window.partitionBy(*keys).orderBy(*order)
    paired = df.select(
        F.col(event_col).alias("from_event"),
        F.lead(event_col).over(w).alias("to_event"),
    )
    if not include_terminal:
        paired = paired.filter(F.col("to_event").isNotNull())
    counts = paired.groupBy("from_event", "to_event").agg(
        F.count(F.lit(1)).alias("n")
    )
    total_w = Window.partitionBy("from_event")
    return counts.withColumn(
        "p", F.round(F.col("n") / F.sum("n").over(total_w), 6)
    )


def seasonal_deviation(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    season_seconds: int = 7 * 86400,
    bucket_seconds: int = 3600,
    min_history: int = 3,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Per-row anomaly score against the key's SEASONAL baseline: each
    row is compared to the history of its own phase — same
    hour-of-week for the defaults — rather than its immediate
    neighbors, which is what separates "traffic is down because it's
    Sunday 3am" from "traffic is down" (rolling_zscore flags the
    former; this doesn't).

    phase = (epoch // bucket_seconds) mod (season_seconds /
    bucket_seconds). Baseline mean/stddev run over the row's STRICTLY
    PRECEDING same-phase occurrences (expanding window, current row
    excluded — a spike must not mask itself, same contract as
    rolling_zscore); `seasonal_z` is NULL until `min_history` prior
    occurrences exist or when the baseline is constant. Output adds
    (phase, seasonal_z) to the input columns.

    One window shuffle on (key, phase) — the same single-exchange
    contract as sessionize; at 100 TB the partition count multiplies
    by phases-per-season, which only helps balance."""
    if season_seconds <= 0 or bucket_seconds <= 0:
        raise ValueError("season_seconds and bucket_seconds must be positive")
    if season_seconds % bucket_seconds != 0:
        raise ValueError(
            f"bucket_seconds must divide season_seconds "
            f"({bucket_seconds} / {season_seconds})"
        )
    if min_history < 2:
        raise ValueError(f"min_history must be >= 2, got {min_history}")
    keys = list(key_cols)
    n_phases = season_seconds // bucket_seconds
    epoch = F.unix_timestamp(F.col(ts_col))
    phase = (F.floor(epoch / bucket_seconds) % n_phases).cast("int")
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in tiebreak]
    w = (
        Window.partitionBy(*keys, "phase")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    mean = F.avg(value_col).over(w)
    sd = F.stddev_samp(value_col).over(w)
    n = F.count(value_col).over(w)
    z = F.when(
        (n >= min_history) & sd.isNotNull() & (sd > 0),
        F.round((F.col(value_col) - mean) / sd, 6),
    )
    return df.withColumn("phase", phase).withColumn("seasonal_z", z)


def item_cooccurrence(
    df: DataFrame,
    session_col: str,
    item_col: str,
    min_count: int = 1,
    max_items_per_session: int | None = None,
) -> DataFrame:
    """Item-to-item co-occurrence over sessions: (item_a, item_b,
    n_both, n_a, n_b, n_sessions, lift, pmi) for unordered pairs
    a < b — the 'frequently bought/viewed together' substrate.
    lift = P(a,b) / (P(a)·P(b)) over sessions; pmi = ln(lift).

    Shape: collapse to DISTINCT (session, item) first — everything
    after is basket-sized, not event-sized; the pair build is ONE
    self-join on the session key whose fan-out is Σ basket_size² —
    bounded by real basket sizes, and GUARDED: with
    `max_items_per_session` set, oversized baskets (bots, crawlers)
    contribute only their first N items by item order (deterministic)
    instead of a quadratic blow-up. Marginals and the session total
    ride broadcast joins of item-sized / 1-row aggregates."""
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    baskets = df.select(
        F.col(session_col).alias("s"), F.col(item_col).alias("i")
    ).distinct()
    if max_items_per_session is not None:
        if max_items_per_session < 2:
            raise ValueError("max_items_per_session must be >= 2")
        w = Window.partitionBy("s").orderBy(F.col("i").asc())
        baskets = (
            baskets.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= max_items_per_session)
            .drop("__rn")
        )
    n_sessions = baskets.select(F.count_distinct("s").alias("__ns"))
    marg = baskets.groupBy("i").agg(F.count(F.lit(1)).alias("n_i"))
    a = baskets.select(F.col("s"), F.col("i").alias("item_a"))
    b = baskets.select(F.col("s"), F.col("i").alias("item_b"))
    pairs = (
        a.join(b, "s")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
        .filter(F.col("n_both") >= min_count)
    )
    out = (
        pairs.join(
            F.broadcast(marg.select(F.col("i").alias("item_a"), F.col("n_i").alias("n_a"))),
            "item_a",
        )
        .join(
            F.broadcast(marg.select(F.col("i").alias("item_b"), F.col("n_i").alias("n_b"))),
            "item_b",
        )
        .crossJoin(F.broadcast(n_sessions))
    )
    lift = (F.col("n_both") * F.col("__ns")) / (F.col("n_a") * F.col("n_b"))
    return out.select(
        "item_a",
        "item_b",
        "n_both",
        "n_a",
        "n_b",
        F.col("__ns").alias("n_sessions"),
        F.round(lift, 6).alias("lift"),
        F.round(F.log(lift), 6).alias("pmi"),
    )


def session_cooccurrence(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    item_col: str,
    gap_seconds: int,
    tiebreak: Sequence[str] = (),
    min_count: int = 1,
    max_items_per_session: int | None = None,
) -> DataFrame:
    """Convenience composition: sessionize (gap-based) then
    item_cooccurrence over the derived session ids."""
    sess = sessionize(df, key_cols, ts_col, gap_seconds, tiebreak=tiebreak)
    return item_cooccurrence(
        sess, "session_id", item_col,
        min_count=min_count, max_items_per_session=max_items_per_session,
    )


def cusum_changepoints(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    threshold_sigmas: float = 5.0,
    drift_sigmas: float = 0.5,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Tabular CUSUM level-shift detection per key: maintains the
    classic one-sided cumulative sums
        S⁺ᵢ = max(0, S⁺ᵢ₋₁ + zᵢ − k)   S⁻ᵢ = max(0, S⁻ᵢ₋₁ − zᵢ − k)
    (z standardized against the KEY's global mean/stddev, k =
    `drift_sigmas` the slack) and flags rows where either sum crosses
    `threshold_sigmas` — the standard 'did the level shift' monitor
    that catches slow drifts a pointwise z-score never trips. Output
    adds (cusum_pos, cusum_neg, changepoint boolean).

    The max(0, …) recurrence is not a prefix sum, but it has a closed
    scan form: S⁺ᵢ = Pᵢ − min(P₀..Pᵢ, 0) where Pᵢ = Σ(z−k) — a running
    sum minus a running min, BOTH plain window aggregates. So the
    whole detector is two cumulative windows per side over ONE
    (key)-shuffle — no UDF, no iteration, no state; the same
    single-exchange contract as sessionize. Baseline mean/stddev ride
    a broadcast join of the key-sized aggregate (for a frozen external
    baseline, standardize upstream and pass z directly with
    threshold/drift in z units)."""
    if threshold_sigmas <= 0 or drift_sigmas < 0:
        raise ValueError("need threshold_sigmas > 0 and drift_sigmas >= 0")
    keys = list(key_cols)
    stats = df.groupBy(*keys).agg(
        F.avg(value_col).alias("__mu"),
        F.stddev_samp(value_col).alias("__sd"),
    )
    z = F.when(
        F.col("__sd").isNotNull() & (F.col("__sd") > 0),
        (F.col(value_col) - F.col("__mu")) / F.col("__sd"),
    ).otherwise(F.lit(0.0))
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in tiebreak]
    run = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = df.join(F.broadcast(stats), keys).withColumn("__z", z)
    # S+ via running-sum-minus-running-min of P = cumsum(z - k)
    p_pos = F.sum(F.col("__z") - F.lit(drift_sigmas)).over(run)
    p_neg = F.sum(-F.col("__z") - F.lit(drift_sigmas)).over(run)
    base = base.withColumn("__pp", p_pos).withColumn("__pn", p_neg)
    m_pos = F.min(F.least(F.col("__pp"), F.lit(0.0))).over(run)
    m_neg = F.min(F.least(F.col("__pn"), F.lit(0.0))).over(run)
    out = (
        base.withColumn("cusum_pos", F.round(F.col("__pp") - m_pos, 6))
        .withColumn("cusum_neg", F.round(F.col("__pn") - m_neg, 6))
        .withColumn(
            "changepoint",
            (F.col("cusum_pos") > threshold_sigmas)
            | (F.col("cusum_neg") > threshold_sigmas),
        )
        .drop("__mu", "__sd", "__z", "__pp", "__pn")
    )
    return out


def condition_streaks(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    condition: Column,
    tiebreak: Sequence[str] = (),
    min_length: int = 1,
) -> DataFrame:
    """Gaps-and-islands over a BOOLEAN condition: per key, the maximal
    consecutive runs of rows where `condition` holds, as
    (key..., streak_start, streak_end, length) — 'how many consecutive
    days over SLA', 'longest winning streak', the value-driven sibling
    of sessionize's time-driven islands.

    Classic two-row_number difference: rows are numbered per key and
    per (key, condition); their difference is constant within an
    island, so one groupBy on (key, diff) finishes the job. ONE window
    shuffle on the key + one same-key aggregate (no second exchange —
    the aggregate reuses the window's hash partitioning)."""
    if min_length < 1:
        raise ValueError(f"min_length must be >= 1, got {min_length}")
    keys = list(key_cols)
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in tiebreak]
    w_all = Window.partitionBy(*keys).orderBy(*order)
    w_cond = Window.partitionBy(*keys, "__c").orderBy(*order)
    marked = df.withColumn("__c", condition)
    runs = (
        marked.withColumn(
            "__grp", F.row_number().over(w_all) - F.row_number().over(w_cond)
        )
        .filter(F.col("__c"))
        .groupBy(*keys, "__grp")
        .agg(
            F.min(ts_col).alias("streak_start"),
            F.max(ts_col).alias("streak_end"),
            F.count(F.lit(1)).cast("int").alias("length"),
        )
        .filter(F.col("length") >= min_length)
        .drop("__grp")
    )
    return runs


def robust_zscore(
    df: DataFrame,
    value_col: str,
    by: Sequence[str] = (),
    out_col: str = "robust_z",
) -> DataFrame:
    """Median/MAD outlier score: 0.6745·(x − median) / MAD — the robust
    sibling of the mean/stddev z-score, immune to the outliers it is
    hunting (a single 10^9 reading inflates a stddev enough to hide
    itself; it moves a median not at all). The 0.6745 factor makes the
    score sigma-comparable under normality (MAD = 0.6745σ).

    One aggregate computes median and MAD per group — MAD needs the
    median first, so it is TWO exact-percentile aggregates (group-
    sized frames, broadcast back with the same null-safe join contract
    as winsorize); a constant group (MAD 0) scores NULL rather than
    ±inf. percentile() is exact-interpolated → DuckDB-differentiable."""
    from pyspark.sql import functions as F

    keys = list(by)
    x = F.col(value_col).cast("double")
    med_agg = F.percentile(x, F.lit(0.5)).alias("__med")
    med = df.groupBy(*keys).agg(med_agg) if keys else df.agg(med_agg)
    if keys:
        renamed = med
        for k in keys:
            renamed = renamed.withColumnRenamed(k, f"__mk_{k}")
        cond = None
        for k in keys:
            c = F.col(k).eqNullSafe(F.col(f"__mk_{k}"))
            cond = c if cond is None else (cond & c)
        with_med = df.join(F.broadcast(renamed), cond, "left").drop(
            *[f"__mk_{k}" for k in keys]
        )
    else:
        with_med = df.crossJoin(F.broadcast(med))
    mad_agg = F.percentile(F.abs(x - F.col("__med")), F.lit(0.5)).alias("__mad")
    mad = (
        with_med.groupBy(*keys).agg(F.first("__med").alias("__med"), mad_agg)
        if keys
        else with_med.agg(F.first("__med").alias("__med"), mad_agg)
    )
    if keys:
        renamed = mad
        for k in keys:
            renamed = renamed.withColumnRenamed(k, f"__mk_{k}")
        cond = None
        for k in keys:
            c = F.col(k).eqNullSafe(F.col(f"__mk_{k}"))
            cond = c if cond is None else (cond & c)
        joined = df.join(F.broadcast(renamed), cond, "left").drop(
            *[f"__mk_{k}" for k in keys]
        )
    else:
        joined = df.crossJoin(F.broadcast(mad))
    z = F.when(
        F.col("__mad") > 0,
        F.round(0.6745 * (x - F.col("__med")) / F.col("__mad"), 6),
    )
    return joined.withColumn(out_col, z).drop("__med", "__mad")


def rolling_corr(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    x_col: str,
    y_col: str,
    window_rows: int = 20,
    min_points: int = 5,
    tiebreak: Sequence[str] = (),
    out_col: str = "rolling_corr",
) -> DataFrame:
    """Per-row rolling Pearson correlation between two series over the
    PRECEDING `window_rows` rows per key (current row excluded, same
    leakage contract as rolling_zscore) — co-movement / rolling-beta
    features for pairs of metrics. NULL until `min_points` complete
    (x, y) pairs exist or either side is constant in the window. One
    window shuffle on the key; corr() is an algebraic window aggregate
    so the frame never buffers beyond Spark's own window machinery."""
    if window_rows < 2:
        raise ValueError(f"window_rows must be >= 2, got {window_rows}")
    if not 2 <= min_points <= window_rows:
        raise ValueError(
            f"need 2 <= min_points <= window_rows, got {min_points}/{window_rows}"
        )
    keys = list(key_cols)
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in tiebreak]
    w = Window.partitionBy(*keys).orderBy(*order).rowsBetween(-window_rows, -1)
    both = F.when(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull(), F.lit(1)
    )
    n = F.count(both).over(w)
    c = F.corr(x_col, y_col).over(w)
    out = F.when((n >= min_points) & c.isNotNull(), F.round(c, 6))
    return df.withColumn(out_col, out)
