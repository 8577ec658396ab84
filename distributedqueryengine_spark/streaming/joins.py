"""Stream-stream and stream-static joins (Structured Streaming).

The reference has no streaming (SURVEY §2.2); this is the north-star
event-correlation capability: join two event streams on a key within
a time interval (e.g. "purchase within 1h after a click").

One function covers batch and streaming inputs identically — the
batch form is the DuckDB-oracle-checkable semantics, the streaming
form (watermarks on BOTH sides, required by Spark for state cleanup)
is verified against batch recomputation in tests.

Scale: Spark executes this as a stream-stream symmetric hash join,
state keyed by the equi-keys and pruned by the watermark + interval
bound. State size is bounded by (watermark delay + interval width) ×
arrival rate per key — the interval condition is what lets Spark
evict, so ALWAYS pass time bounds at 100 TB; an unbounded
stream-stream join grows state forever.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    lower: str = "0 seconds",
    upper: str = "1 hour",
    how: str = "inner",
    watermark: str | None = None,
) -> DataFrame:
    """Join rows sharing `keys` where
    right_ts ∈ [left_ts + lower, left_ts + upper].

    `lower`/`upper` are SQL interval strings. With `watermark` set and
    streaming inputs, both sides get `withWatermark` (Spark requires
    it on each side of a stream-stream join for state eviction).
    Columns are disambiguated with l_/r_ prefixes on the timestamps.
    """
    lcol, rcol = f"l_{left_ts}", f"r_{right_ts}"
    lf = left.withColumnRenamed(left_ts, lcol)
    rf = right.withColumnRenamed(right_ts, rcol)
    if watermark is not None:
        lf = lf.withWatermark(lcol, watermark)
        rf = rf.withWatermark(rcol, watermark)
    cond = F.lit(True)
    for k in keys:
        cond = cond & (lf[k] == rf[k])
    cond = (
        cond
        & (F.col(rcol) >= F.col(lcol) + F.expr(f"INTERVAL {lower}"))
        & (F.col(rcol) <= F.col(lcol) + F.expr(f"INTERVAL {upper}"))
    )
    out = lf.join(rf, cond, how)
    # drop the duplicated key columns from the right side
    for k in keys:
        out = out.drop(rf[k])
    return out
