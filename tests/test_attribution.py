"""Attribution models vs hand-computed credits and a DuckDB mirror
(linear model over real events); credit conservation; lookback and
hot-key cap semantics."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from distributedqueryengine_spark.operators.attribution import (
    channel_report,
    conversion_attribution,
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "u long, ep long, ev string").select(
        "u", F.timestamp_seconds("ep").alias("ts"), "ev"
    )


def test_attribution_models_hand_checked(spark):
    rows = [
        (1, 100, "ad"), (1, 200, "email"), (1, 300, "search"), (1, 400, "buy"),
        (2, 100, "ad"), (2, 150, "buy"),
        (3, 500, "buy"),                      # no touches → direct
        (1, 10_000, "email"), (1, 10_050, "buy"),  # second journey for key 1
    ]
    df = _mk(spark, rows)
    touches = ["ad", "email", "search"]

    def run(model):
        out = conversion_attribution(
            df, "u", "ts", "ev", "buy", touches,
            model=model, lookback_seconds=1000,
        )
        res = {}
        for r in out.collect():
            res.setdefault((r.u, r.conversion_ts), []).append(
                (r.touch_event, r.credit)
            )
        return res

    lin = run("linear")
    assert sorted(lin[(1, 400)]) == [("ad", round(1 / 3, 6)), ("email", round(1 / 3, 6)), ("search", round(1 / 3, 6))]
    assert lin[(2, 150)] == [("ad", 1.0)]
    assert lin[(3, 500)] == [(None, 1.0)]          # direct bucket
    assert lin[(1, 10050)] == [("email", 1.0)]      # second journey isolated

    first = run("first_touch")
    assert first[(1, 400)] == [("ad", 1.0)]
    last = run("last_touch")
    assert last[(1, 400)] == [("search", 1.0)]
    posn = run("position")
    assert sorted(posn[(1, 400)]) == [("ad", 0.4), ("email", 0.2), ("search", 0.4)]

    # credit conservation per conversion under every model
    for model in ("first_touch", "last_touch", "linear", "position"):
        for key, credits in run(model).items():
            # per-row 6-dp rounding: tolerance scales with touch count
            assert abs(sum(c for _, c in credits) - 1.0) < 1e-6 * (
                len(credits) + 1
            ), (model, key)


def test_attribution_lookback_and_cap(spark):
    rows = (
        [(1, 100, "ad")]                      # outside 50s lookback
        + [(1, 960 + i, "email") for i in range(30)]  # 30 recent touches
        + [(1, 1000, "buy")]
    )
    df = _mk(spark, rows)
    out = conversion_attribution(
        df, "u", "ts", "ev", "buy", ["ad", "email"],
        model="linear", lookback_seconds=50, max_touches_per_conversion=10,
    ).collect()
    assert all(r.touch_event == "email" for r in out)   # 'ad' out of window
    assert all(r.n_touches == 10 for r in out)          # capped to most recent 10
    assert len(out) == 10
    assert abs(sum(r.credit for r in out) - 1.0) < 1e-6
    # the capped prefix is the MOST RECENT touches
    assert min(r.touch_ts for r in out) == 960 + 20


def test_attribution_linear_matches_duckdb(spark, tables):
    """Linear credit over real events (view/click touches, purchase
    conversions) vs the identical SQL in DuckDB."""
    ev = tables["events"].select("user_id", "ts", "event_type")
    kinds = [r.event_type for r in ev.select("event_type").distinct().collect()]
    conv = sorted(kinds)[0]
    touches = [k for k in sorted(kinds) if k != conv][:3]
    lookback = 7 * 86400

    out = conversion_attribution(
        ev, "user_id", "ts", "event_type", conv, touches,
        model="linear", lookback_seconds=lookback,
    )
    got = sorted(
        (r.user_id, r.conversion_ts, r.touch_ts, r.touch_event, r.credit)
        for r in out.collect()
        if r.touch_event is not None
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/events.parquet')"
    )
    tlist = ", ".join(f"'{t}'" for t in touches)
    expect = sorted(
        tuple(r)
        for r in con.execute(
            f"""
            WITH e AS (
              SELECT user_id AS k, epoch_us(ts)//1000000 AS t, event_type AS ev
              FROM events
            ), convs AS (
              SELECT k, t AS conv_t FROM e WHERE ev = '{conv}'
            ), touches AS (
              SELECT k, t AS touch_t, ev AS touch_e FROM e WHERE ev IN ({tlist})
            ), cand AS (
              SELECT c.k, c.conv_t, tt.touch_t, tt.touch_e
              FROM convs c JOIN touches tt ON c.k = tt.k
              WHERE tt.touch_t <= c.conv_t
                AND tt.touch_t > c.conv_t - {lookback}
            )
            SELECT k, conv_t, touch_t, touch_e,
                   round(1.0 / count(*) OVER (PARTITION BY k, conv_t), 6) AS credit
            FROM cand
            """
        ).fetchall()
    )
    assert got == expect and got

    # channel report sums to the number of conversions
    n_convs = ev.filter(F.col("event_type") == conv).count()
    total = (
        channel_report(out).agg(F.sum("conversions").alias("s")).first().s
    )
    assert abs(total - n_convs) < 1e-3
