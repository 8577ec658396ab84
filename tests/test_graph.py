"""PageRank tests: numpy power-iteration reference on graphs with
dangling nodes, hubs, and cycles; probability-mass invariant."""

from __future__ import annotations

import numpy as np
import pytest

from distributedqueryengine_spark.functions.graph import pagerank


def _ref_pagerank(edges, n, damping=0.85, iters=60):
    out: dict[int, list[int]] = {}
    for s, d in edges:
        out.setdefault(s, []).append(d)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.full(n, (1.0 - damping) / n)
        dangling = sum(r[s] for s in range(n) if s not in out)
        nxt += damping * dangling / n
        for s, ds in out.items():
            share = damping * r[s] / len(ds)
            for d in ds:
                nxt[d] += share
        r = nxt
    return r


@pytest.fixture(scope="module")
def graph(spark):
    # hub-and-spoke + cycle + dangling sink, deterministic extras
    edges = (
        [(0, i) for i in range(1, 6)]            # hub fan-out
        + [(i, 0) for i in range(1, 4)]          # back-links
        + [(6, 7), (7, 8), (8, 6)]               # 3-cycle
        + [(5, 9)]                               # 9 is dangling
        + [((i * 7) % 10, (i * 3) % 10) for i in range(10)]
    )
    return edges, spark.createDataFrame(edges, "src long, dst long")


def test_pagerank_matches_numpy(spark, graph):
    edges, df = graph
    got = {r.id: r.rank for r in pagerank(df, max_iter=60, tol=1e-12).collect()}
    ref = _ref_pagerank(edges, 10)
    assert set(got) == set(range(10))
    for i in range(10):
        assert abs(got[i] - ref[i]) < 1e-6, (i, got[i], ref[i])
    # ranks remain a probability distribution (dangling mass conserved)
    assert abs(sum(got.values()) - 1.0) < 1e-9
    # hub receives back-links from 3 spokes → top rank
    assert max(got, key=got.get) == 0


def test_pagerank_converges_early_and_guards(spark, graph):
    _, df = graph
    # loose tol stops well before max_iter yet lands near the fixed point
    loose = {r.id: r.rank for r in pagerank(df, max_iter=60, tol=1e-4).collect()}
    tight = {r.id: r.rank for r in pagerank(df, max_iter=60, tol=1e-12).collect()}
    for i in loose:
        assert abs(loose[i] - tight[i]) < 1e-3
    with pytest.raises(ValueError, match="damping"):
        pagerank(df, damping=1.5)
    empty = df.limit(0)
    assert pagerank(empty).count() == 0


def test_pagerank_driver_barrier_budget(spark, graph):
    """Job budget per iteration, pinned via the status tracker (AQE off
    for the probe — AQE splits one action into per-stage jobs and
    would obscure the count): the batched shape costs 4 jobs/iter —
    ONE blocking action (the eager localCheckpoint) + 3 broadcast-
    exchange jobs — with NO dangling-mass collect; a per-round
    convergence check (check_every=1) adds exactly one more. The old
    shape's two per-round collects would trip the <=4 bound. Fixed
    overhead (setup + final state) cancels by differencing two run
    lengths."""
    edges, df = graph

    sc = spark.sparkContext

    def jobs_for(n_iter, check_every):
        group = f"pr_budget_{n_iter}_{check_every}"
        sc.setJobGroup(group, "pagerank job-count probe")
        try:
            pagerank(df, max_iter=n_iter, tol=0.0, check_every=check_every).collect()
        finally:
            sc.setJobGroup(None, None)
        return len(sc.statusTracker().getJobIdsForGroup(group))

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        per_iter = (jobs_for(8, 10**9) - jobs_for(4, 10**9)) / 4
        per_iter_chk = (jobs_for(8, 1) - jobs_for(4, 1)) / 4
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert per_iter <= 4.0, per_iter
    assert per_iter_chk - per_iter == 1.0, (per_iter, per_iter_chk)

    # and the numeric answer is unchanged by the folding (vs numpy ref)
    got = {r.id: r.rank for r in pagerank(df, max_iter=60, tol=1e-12).collect()}
    ref = _ref_pagerank(edges, 10)
    assert all(abs(got[i] - ref[i]) < 1e-6 for i in range(10))
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_triangle_count_matches_duckdb(spark):
    """Exact triangle count (global + per-vertex) on a messy multigraph
    (duplicates, reversed edges, self-loops) vs the canonical a<b<c
    DuckDB enumeration."""
    import duckdb

    from distributedqueryengine_spark.functions.graph import triangle_count

    edges = (
        [(0, 1), (1, 2), (2, 0)]          # triangle
        + [(2, 3), (3, 4), (4, 2)]        # second triangle sharing vertex 2
        + [(4, 5), (5, 6)]                # path, no triangle
        + [(1, 0), (0, 1), (3, 3)]        # reversed dup, dup, self-loop
        + [(i, (i + 1) % 8) for i in range(8)]  # ring overlay
        + [(0, 4), (1, 5), (0, 2)]
    )
    df = spark.createDataFrame(edges, "src long, dst long")
    got = triangle_count(df).first().n_triangles
    per_v = {
        r.id: r.n_triangles
        for r in triangle_count(df, per_vertex=True).collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE raw(a BIGINT, b BIGINT)")
    con.executemany("INSERT INTO raw VALUES (?, ?)", edges)
    expect_rows = con.execute(
        """
        WITH e AS (
          SELECT DISTINCT least(a,b) AS a, greatest(a,b) AS b
          FROM raw WHERE a <> b
        )
        SELECT e1.a, e1.b, e2.b
        FROM e e1 JOIN e e2 ON e1.b = e2.a
                  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
        """
    ).fetchall()
    assert got == len(expect_rows) > 0
    from collections import Counter

    expect_pv = Counter(v for tri in expect_rows for v in tri)
    assert per_v == dict(expect_pv)


def test_triangle_count_random_graphs(spark):
    """Random Erdős–Rényi-ish graphs vs DuckDB enumeration."""
    import random

    import duckdb

    from distributedqueryengine_spark.functions.graph import triangle_count

    rng = random.Random(8)
    for trial in range(3):
        n, p = 30, 0.2
        edges = [
            (i, j) for i in range(n) for j in range(n)
            if i != j and rng.random() < p
        ]
        df = spark.createDataFrame(edges, "src long, dst long")
        got = triangle_count(df).first().n_triangles
        con = duckdb.connect()
        con.execute("CREATE TABLE raw(a BIGINT, b BIGINT)")
        con.executemany("INSERT INTO raw VALUES (?, ?)", edges)
        expect = con.execute(
            """
            WITH e AS (
              SELECT DISTINCT least(a,b) AS a, greatest(a,b) AS b
              FROM raw WHERE a <> b
            )
            SELECT count(*) FROM e e1
            JOIN e e2 ON e1.b = e2.a
            JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
            """
        ).fetchone()[0]
        assert got == expect, trial


def test_personalized_pagerank_matches_numpy(spark):
    """Weighted personalized PageRank vs a dense numpy reference:
    teleport over a 2-node source set, weighted out-edges, dangling
    mass returned to the sources; ranks sum to 1 and concentrate near
    the sources."""
    import numpy as np

    from distributedqueryengine_spark.functions.graph import personalized_pagerank

    edges = [
        (0, 1, 2.0), (0, 2, 1.0), (1, 2, 1.0), (2, 0, 1.0),
        (2, 3, 3.0), (3, 4, 1.0), (4, 5, 1.0),  # 5 dangles
        (6, 0, 1.0),                             # 6 feeds the core
    ]
    n, d = 7, 0.85
    sources = [0, 3]
    df = spark.createDataFrame(edges, "src long, dst long, w double")
    got = {
        r.id: r.rank
        for r in personalized_pagerank(
            df, sources, weight_col="w", max_iter=80, tol=1e-13
        ).collect()
    }

    tp = np.zeros(n)
    for s in sources:
        tp[s] = 1 / len(sources)
    A = np.zeros((n, n))
    for s, t, w in edges:
        A[s, t] += w
    out = A.sum(axis=1)
    r = tp.copy()
    for _ in range(300):
        nxt = np.zeros(n)
        dangling = sum(r[i] for i in range(n) if out[i] == 0)
        for s in range(n):
            if out[s] > 0:
                nxt += d * r[s] * A[s] / out[s]
        nxt += d * dangling * tp + (1 - d) * tp
        r = nxt
    for i in range(n):
        assert abs(got[i] - r[i]) < 1e-8, (i, got[i], r[i])
    assert abs(sum(got.values()) - 1.0) < 1e-9
    # personalization: the source set outranks the far periphery
    assert got[0] > got[5] and got[3] > got[5]

    # guard: sources disjoint from the graph
    import pytest as _pytest

    with _pytest.raises(ValueError, match="sources"):
        personalized_pagerank(df, [99])
