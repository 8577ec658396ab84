"""Skyline (Pareto frontier) operator tests.

Reference model: brute-force O(n^2) dominance check in pure python —
the operator must return exactly the undominated row set, order
insensitive, all columns preserved.
"""

from __future__ import annotations

import random

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F

from distributedqueryengine_spark.operators.skyline import skyline


def _brute_frontier(rows, maximize, minimize, by=()):
    def dominates(b, a):
        if by and any(b[g] != a[g] for g in by):
            return False
        ge = all(b[c] >= a[c] for c in maximize) and all(b[c] <= a[c] for c in minimize)
        gt = any(b[c] > a[c] for c in maximize) or any(b[c] < a[c] for c in minimize)
        return ge and gt

    return [a for a in rows if not any(dominates(b, a) for b in rows)]


def _key(row, cols):
    return tuple(row[c] for c in cols)


def test_skyline_matches_bruteforce_fixed(spark):
    rows = [
        Row(id=1, q=5.0, cost=10.0),
        Row(id=2, q=5.0, cost=8.0),   # dominates id=1
        Row(id=3, q=7.0, cost=12.0),  # frontier (best q)
        Row(id=4, q=3.0, cost=5.0),   # frontier (best cost)
        Row(id=5, q=7.0, cost=12.0),  # exact tie with id=3 -> both kept
        Row(id=6, q=2.0, cost=6.0),   # dominated by id=4
    ]
    df = spark.createDataFrame(rows).repartition(3)
    got = skyline(df, maximize=["q"], minimize=["cost"]).collect()
    want = _brute_frontier([r.asDict() for r in rows], ["q"], ["cost"])
    assert sorted(r["id"] for r in got) == sorted(r["id"] for r in want) == [2, 3, 4, 5]


def test_skyline_grouped(spark):
    rows = [
        Row(g="a", id=1, q=5.0, cost=10.0),
        Row(g="a", id=2, q=6.0, cost=9.0),
        Row(g="b", id=3, q=1.0, cost=1.0),
        Row(g="b", id=4, q=0.5, cost=2.0),  # dominated within b only
    ]
    df = spark.createDataFrame(rows).repartition(4)
    got = skyline(df, maximize=["q"], minimize=["cost"], by=["g"]).collect()
    want = _brute_frontier([r.asDict() for r in rows], ["q"], ["cost"], by=["g"])
    assert sorted(r["id"] for r in got) == sorted(r["id"] for r in want) == [2, 3]


@pytest.mark.parametrize("seed,n,d_max,d_min", [(7, 200, 2, 1), (11, 300, 1, 2), (13, 150, 3, 0)])
def test_skyline_randomized(spark, seed, n, d_max, d_min):
    rng = random.Random(seed)
    maximize = [f"m{i}" for i in range(d_max)]
    minimize = [f"c{i}" for i in range(d_min)]
    rows = []
    for i in range(n):
        # Coarse grid so exact ties and dominance chains both occur.
        vals = {c: float(rng.randint(0, 12)) for c in maximize + minimize}
        rows.append({"id": i, **vals})
    df = spark.createDataFrame(rows).repartition(8)
    got = {r["id"] for r in skyline(df, maximize=maximize, minimize=minimize).collect()}
    want = {r["id"] for r in _brute_frontier(rows, maximize, minimize)}
    assert got == want


def test_skyline_grouped_randomized(spark):
    rng = random.Random(23)
    rows = [
        {
            "g": rng.choice(["x", "y", "z"]),
            "id": i,
            "m0": float(rng.randint(0, 9)),
            "c0": float(rng.randint(0, 9)),
        }
        for i in range(250)
    ]
    df = spark.createDataFrame(rows).repartition(8)
    got = {r["id"] for r in skyline(df, maximize=["m0"], minimize=["c0"], by=["g"]).collect()}
    want = {r["id"] for r in _brute_frontier(rows, ["m0"], ["c0"], by=["g"])}
    assert got == want


def test_skyline_null_policy(spark):
    rows = [Row(id=1, q=1.0), Row(id=2, q=None), Row(id=3, q=float("nan"))]
    df = spark.createDataFrame(rows)
    # 'raise' fires lazily inside the distributed local pass (query
    # construction stays job-free), so it surfaces on the action.
    with pytest.raises(Exception, match="NULL/NaN"):
        skyline(df, maximize=["q"]).collect()
    got = skyline(df, maximize=["q"], on_null="drop").collect()
    assert [r["id"] for r in got] == [1]


def test_skyline_global_limit_raises(spark):
    # Perfectly anti-correlated: every row is on the frontier.
    rows = [{"id": i, "m": float(i), "c": float(i)} for i in range(50)]
    df = spark.createDataFrame(rows).repartition(2)
    with pytest.raises(ValueError, match="global_limit"):
        skyline(df, maximize=["m"], minimize=["c"], global_limit=10)
    # And with a sufficient limit all 50 survive.
    got = skyline(df, maximize=["m"], minimize=["c"], global_limit=100).count()
    assert got == 50


def test_skyline_requires_criteria(spark):
    df = spark.range(3)
    with pytest.raises(ValueError, match="at least one"):
        skyline(df)


def test_skyline_preserves_all_columns(spark):
    df = spark.createDataFrame([Row(id=1, q=2.0, extra="keep-me")])
    out = skyline(df, maximize=["q"])
    assert out.columns == df.columns
    assert out.collect()[0]["extra"] == "keep-me"


@pytest.fixture()
def tiny_arrow_batches(spark):
    """Shrink Arrow batches so multi-batch final/grouped passes are hit."""
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    spark.conf.set(key, "64")
    yield
    spark.conf.set(key, old)


def test_skyline_final_pass_spans_arrow_batches(spark, tiny_arrow_batches):
    # Two anti-correlated lines of constant sum; every point survives its
    # own partition's local pass, but line B (sum N+1) dominates line A
    # (sum N) pointwise: (i, N+1-i) beats (i, N-i). With 64-row Arrow
    # batches the old per-batch final scan kept line-A points whose
    # dominator landed in another batch — the pass must be whole-set.
    n = 200
    rows_a = [{"id": i, "m0": float(i), "m1": float(n - i), "src": "a"} for i in range(n)]
    rows_b = [
        {"id": n + i, "m0": float(i), "m1": float(n + 1 - i), "src": "b"} for i in range(n)
    ]
    df = spark.createDataFrame(rows_a + rows_b).repartition(2, "src")
    got = {r["id"] for r in skyline(df, maximize=["m0", "m1"]).collect()}
    want = {r["id"] for r in _brute_frontier(rows_a + rows_b, ["m0", "m1"], [])}
    assert got == want == {n + i for i in range(n)}


def test_skyline_grouped_pass_spans_arrow_batches(spark, tiny_arrow_batches):
    # Same construction inside ONE group, >64 survivors per group: the
    # grouped pass must see the whole group (applyInPandas), not Arrow
    # chunks of a repartitioned stream.
    n = 120
    rows = []
    for g in ("g1", "g2"):
        off = 0 if g == "g1" else 10_000
        rows += [
            {"g": g, "id": off + i, "m0": float(i), "m1": float(n - i), "src": 0}
            for i in range(n)
        ]
        rows += [
            {"g": g, "id": off + n + i, "m0": float(i), "m1": float(n + 1 - i), "src": 1}
            for i in range(n)
        ]
    df = spark.createDataFrame(rows).repartition(4, "src")
    got = {r["id"] for r in skyline(df, maximize=["m0", "m1"], by=["g"]).collect()}
    want = {r["id"] for r in _brute_frontier(rows, ["m0", "m1"], [], by=["g"])}
    assert got == want


def test_skyline_grouped_global_limit_raises(spark):
    # Anti-correlated single group: every row survives phase 1, so the
    # per-group guard must fire instead of silently scanning one task.
    rows = [{"g": "only", "id": i, "m": float(i), "c": float(i)} for i in range(60)]
    df = spark.createDataFrame(rows).repartition(3)
    with pytest.raises(Exception, match="global_limit"):
        skyline(df, maximize=["m"], minimize=["c"], by=["g"], global_limit=10).collect()
