"""Gap-filled resampling tests (operators/timeseries.py): driver-side
reference over synthetic sparse series + real events, all three fill
policies, and the grid-size guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributedqueryengine_spark.operators.timeseries import resample_fill


def _mk(spark):
    rows = [
        # key A: observations at +0, +120, +360 from an aligned base
        ("A", 1_700_000_040, 10.0),
        ("A", 1_700_000_045, 20.0),      # same bucket as first (60s)
        ("A", 1_700_000_160, 7.0),
        ("A", 1_700_000_400, 1.0),
        # key B: single observation
        ("B", 1_700_000_100, 5.0),
    ]
    return spark.createDataFrame(rows, "k string, epoch long, v double").select(
        "k", F.timestamp_seconds("epoch").alias("ts"), "v"
    )


def test_resample_fill_policies_match_reference(spark):
    df = _mk(spark)
    base = 1_700_000_040
    expect_buckets_a = [base + i * 60 for i in range(7)]  # 0..360

    for fill in ("null", "zero", "ffill"):
        out = resample_fill(
            df, ["k"], "ts", 60, {"s": F.sum("v"), "n": F.count(F.lit(1))}, fill=fill
        ).collect()
        a = {r.bucket_ts: r for r in out if r.k == "A"}
        assert sorted(a) == expect_buckets_a  # complete, regular grid
        # observed buckets keep their aggregates under every policy
        assert a[base].s == 30.0 and a[base].n == 2 and a[base].observed
        assert a[base + 120].s == 7.0 and a[base + 120].observed
        assert a[base + 360].s == 1.0
        gap = a[base + 60]
        assert not gap.observed
        if fill == "null":
            assert gap.s is None and gap.n is None
        elif fill == "zero":
            assert gap.s == 0.0 and gap.n == 0
        else:  # ffill carries bucket-0 values forward
            assert gap.s == 30.0 and gap.n == 2
            assert a[base + 180].s == 7.0  # last observed before the gap
        # key B: single bucket, no gaps fabricated beyond its span
        b = [r for r in out if r.k == "B"]
        assert len(b) == 1 and b[0].s == 5.0 and b[0].observed


def test_resample_fill_on_real_events(spark, tables):
    """Hourly resample of events per event_type: observed buckets must
    equal a direct groupBy, the grid must be hole-free and monotone."""
    ev = tables["events"].select("event_type", "ts", "value")
    out = resample_fill(
        ev, ["event_type"], "ts", 3600, {"total": F.sum("value")}, fill="ffill"
    ).persist()
    direct = {
        (r.event_type, r.b): round(r.t, 6)
        for r in ev.groupBy(
            "event_type",
            (F.floor(F.unix_timestamp("ts") / 3600) * 3600).cast("long").alias("b"),
        )
        .agg(F.sum("value").alias("t"))
        .collect()
    }
    rows = out.collect()
    got_observed = {
        (r.event_type, r.bucket_ts): round(r.total, 6)
        for r in rows
        if r.observed
    }
    assert got_observed == direct
    # hole-free per key
    by_key: dict = {}
    for r in rows:
        by_key.setdefault(r.event_type, []).append(r.bucket_ts)
    for k, ts in by_key.items():
        ts = sorted(ts)
        assert ts == list(range(ts[0], ts[-1] + 3600, 3600)), k
        # ffill: no NULLs after the first observed bucket
    out.unpersist()


def test_resample_guards(spark):
    df = _mk(spark)
    with pytest.raises(ValueError, match="fill must be"):
        resample_fill(df, ["k"], "ts", 60, {"s": F.sum("v")}, fill="bogus")
    with pytest.raises(ValueError, match="positive"):
        resample_fill(df, ["k"], "ts", 0, {"s": F.sum("v")})
    with pytest.raises(ValueError, match="buckets"):
        resample_fill(
            df, ["k"], "ts", 1, {"s": F.sum("v")}, max_buckets_per_key=100
        )
