"""SCD2 / change-compaction tests (operators/cdc.py): differential vs
DuckDB window SQL over the real events table, plus NULL-safety and
point-in-time invariants on synthetic change logs.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from distributedqueryengine_spark.operators import cdc

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF_DIR}/events.parquet')"
    )
    return con


def test_scd2_matches_duckdb(spark, tables, duck):
    """scd2_from_changes over events (key=user_id, attrs=event_type)
    must agree row-for-row with the equivalent DuckDB window SQL —
    compaction, half-open intervals, is_current, and version numbers.
    Timestamps compare as epoch micros (fixture stores nanos; Spark
    reads micros via load_table, DuckDB reads ns natively)."""
    ev = tables["events"]
    got = sorted(
        (
            r.user_id,
            r.event_type,
            r.vf,
            r.vt,
            r.is_current,
            r.version,
        )
        for r in cdc.scd2_from_changes(
            ev, ["user_id"], "ts", ["event_type"], tiebreak=["event_id"]
        )
        .select(
            "user_id",
            "event_type",
            F.unix_micros("valid_from").alias("vf"),
            F.unix_micros("valid_to").alias("vt"),
            "is_current",
            "version",
        )
        .collect()
    )
    expect = sorted(
        tuple(r)
        for r in duck.execute(
            """
            WITH marked AS (
              SELECT user_id, ts, event_type, event_id,
                     row_number() OVER w AS rn,
                     lag(event_type) OVER w AS p_et
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ),
            compacted AS (
              SELECT user_id, ts, event_type, event_id FROM marked
              WHERE rn = 1 OR event_type IS DISTINCT FROM p_et
            )
            SELECT user_id, event_type,
                   epoch_us(ts) AS vf,
                   epoch_us(lead(ts) OVER w2) AS vt,
                   (lead(ts) OVER w2 IS NULL) AS is_current,
                   CAST(row_number() OVER w2 AS INTEGER) AS version
            FROM compacted
            WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
            """
        ).fetchall()
    )
    assert got == expect
    # exactly one open row per user
    cur = [g for g in got if g[4]]
    assert len(cur) == len({g[0] for g in got})


def test_compact_changes_null_safe(spark):
    rows = [
        # key 1: value → NULL → NULL → value  (NULL→NULL is a no-op)
        (1, 10, "a", 5),
        (1, 20, "a", None),
        (1, 30, "a", None),
        (1, 40, "a", 5),
        # key 2: attr flips then no-op repeat
        (2, 10, "x", 1),
        (2, 20, "y", 1),
        (2, 30, "y", 1),
    ]
    df = spark.createDataFrame(rows, "k int, ts int, s string, v int")
    got = sorted(
        (r.k, r.ts)
        for r in cdc.compact_changes(df, ["k"], "ts", ["s", "v"]).collect()
    )
    assert got == [(1, 10), (1, 20), (1, 40), (2, 10), (2, 20)]


def test_scd2_snapshot_point_in_time(spark):
    rows = [
        (1, "2024-01-01 00:00:00", "bronze"),
        (1, "2024-03-01 00:00:00", "silver"),
        (1, "2024-06-01 00:00:00", "gold"),
        (2, "2024-02-01 00:00:00", "bronze"),
    ]
    df = spark.createDataFrame(rows, "cust int, ts string, tier string").select(
        "cust", F.col("ts").cast("timestamp").alias("ts"), "tier"
    )
    dim = cdc.scd2_from_changes(df, ["cust"], "ts", ["tier"]).persist()
    # intervals tile: each snapshot has at most one row per key
    for at, expect in [
        ("2024-01-15 00:00:00", {1: "bronze"}),
        ("2024-04-01 00:00:00", {1: "silver", 2: "bronze"}),
        ("2024-12-01 00:00:00", {1: "gold", 2: "bronze"}),
    ]:
        snap = {r.cust: r.tier for r in cdc.snapshot_at(dim, at).collect()}
        assert snap == expect, f"at={at}"
    # before any change: empty
    assert cdc.snapshot_at(dim, "2023-01-01 00:00:00").count() == 0
    # current rows == latest attribute per key
    cur = {r.cust: r.tier for r in dim.filter("is_current").collect()}
    assert cur == {1: "gold", 2: "bronze"}
    dim.unpersist()


def test_snapshot_diff_classifies_changes(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, None, 40), (5, "e", None)],
        "k int, s string, v int",
    )
    new = spark.createDataFrame(
        [(1, "a", 10), (2, "B", 20), (4, None, 40), (5, "e", 99), (6, "f", 60)],
        "k int, s string, v int",
    )
    from distributedqueryengine_spark.operators.cdc import snapshot_diff

    got = {r.k: r for r in snapshot_diff(old, new, ["k"]).collect()}
    # k=1 unchanged → absent; k=4 NULL==NULL unchanged → absent
    assert set(got) == {2, 3, 5, 6}
    assert got[2].op == "update" and got[2].before.s == "b" and got[2].after.s == "B"
    assert got[3].op == "delete" and got[3].after is None
    assert got[5].op == "update" and got[5].before.v is None and got[5].after.v == 99
    assert got[6].op == "insert" and got[6].before is None

    # compare_cols restriction: only `s` matters → k=5's v change invisible
    got_s = {
        r.k: r.op
        for r in snapshot_diff(old, new, ["k"], compare_cols=["s"]).collect()
    }
    assert got_s == {2: "update", 3: "delete", 6: "insert"}

    # round-trip sanity on a real table: diff(x, x) is empty
    assert snapshot_diff(new, new, ["k"]).count() == 0
