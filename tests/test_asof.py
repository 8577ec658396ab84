"""As-of and range join operator tests (operators/asof.py)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from distributedqueryengine_spark.operators.asof import asof_join, range_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [
            Row(sym="A", ts=_ts("2024-01-01 10:00:05"), px=10.0),
            Row(sym="A", ts=_ts("2024-01-01 10:00:00"), px=9.0),   # exact tie with quote
            Row(sym="A", ts=_ts("2024-01-01 09:59:00"), px=8.0),   # before any quote
            Row(sym="B", ts=_ts("2024-01-01 10:00:10"), px=20.0),
        ]
    )
    quotes = spark.createDataFrame(
        [
            Row(sym="A", ts=_ts("2024-01-01 10:00:00"), bid=1.0),
            Row(sym="A", ts=_ts("2024-01-01 10:00:04"), bid=2.0),
            Row(sym="B", ts=_ts("2024-01-01 10:00:09"), bid=3.0),
            Row(sym="C", ts=_ts("2024-01-01 10:00:00"), bid=9.0),
        ]
    )
    return trades, quotes


def test_asof_backward_semantics(trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, on="ts", by=["sym"], right_cols=["ts", "bid"])
    got = {(r.sym, r.px): (r.bid_r, r.ts_r) for r in out.collect()}
    assert out.count() == trades.count()  # left outer: every trade kept
    assert got[("A", 10.0)][0] == 2.0     # latest quote <= 10:00:05
    assert got[("A", 9.0)][0] == 1.0      # exact-tie quote matches (<=)
    assert got[("A", 8.0)] == (None, None)  # no prior quote → nulls
    assert got[("B", 20.0)][0] == 3.0     # per-group isolation


def test_asof_never_crosses_groups(trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, on="ts", by=["sym"], right_cols=["bid"])
    assert all(r.bid_r != 9.0 for r in out.collect())  # C's quote never leaks


def test_range_join_matches_naive(spark):
    left = spark.createDataFrame([Row(lid=i, v=float(i)) for i in range(40)])
    right = spark.createDataFrame(
        [
            Row(rid=0, lo=5.0, hi=10.0),
            Row(rid=1, lo=9.5, hi=30.0),   # spans multiple buckets
            Row(rid=2, lo=38.0, hi=39.0),
            Row(rid=3, lo=100.0, hi=200.0),  # matches nothing
        ]
    )
    out = range_join(left, right, "v", "lo", "hi", bucket_width=7.0)
    got = {(r.lid, r.rid) for r in out.collect()}
    naive = {
        (l, r)
        for l in range(40)
        for r, (lo, hi) in enumerate([(5, 10), (9.5, 30), (38, 39), (100, 200)])
        if lo <= l < hi
    }
    assert got == naive


def test_range_join_with_equi_keys(spark):
    left = spark.createDataFrame(
        [Row(k="x", v=5.0), Row(k="y", v=5.0)]
    )
    right = spark.createDataFrame(
        [Row(k="x", lo=0.0, hi=10.0), Row(k="y", lo=6.0, hi=10.0)]
    )
    out = range_join(left, right, "v", "lo", "hi", bucket_width=5.0, equi_keys=["k"])
    rows = out.collect()
    assert len(rows) == 1 and rows[0].k == "x"
