"""Iterative graph algorithms beyond dedup.py's connected components.

PageRank here is the canonical iterative-join workload — the class the
driver's oracle deliberately can't express in one SQL text — and its
distributed discipline matches the CC implementation it sits beside:
every iteration is (join + aggregate) on the edge relation partitioned
by key, the lineage is cut with localCheckpoint each round (20
iterations of uncheckpointed joins would nest 20 plans deep and
re-execute the whole chain per action), and the ONLY driver-side data
movement is a 1-row convergence aggregate every `check_every` rounds
(the same bounded contract as CC's convergence check). The per-round
driver-barrier budget is exactly ONE job: the dangling-mass sum rides
the update plan as a broadcast 1-row cross join instead of its own
collect.

Dangling nodes (no out-edges) follow the standard treatment: their
rank mass redistributes uniformly, keeping the ranks a probability
distribution (sums to 1 — asserted in tests, the invariant sloppy
implementations lose).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    max_iter: int = 20,
    tol: float = 1.0e-6,
    check_every: int = 5,
) -> DataFrame:
    """(id, rank) over the directed edge list, ranks summing to 1.

    Stops at `max_iter` or when the L1 delta between iterations drops
    below `tol` (tested every `check_every` rounds). Self-loops count
    as ordinary edges; duplicate edges add proportional weight
    (multigraph semantics — dedupe upstream if unwanted).

    Driver-barrier budget: ONE action per iteration (the eager
    localCheckpoint that cuts the lineage), plus one convergence
    aggregate every `check_every` rounds. The dangling-node mass is NOT
    collected per round — it rides the same plan as the contribution
    aggregate via a broadcast 1-row cross join, so both aggregates
    execute inside the checkpoint's single job."""
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0,1), got {damping}")
    if check_every < 1:
        raise ValueError(f"check_every must be >= 1, got {check_every}")
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).persist()
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).persist()

    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).localCheckpoint()
    base = (1.0 - damping) / n
    for it in range(max_iter):
        # dangling mass as a 1-row FRAME folded into the update plan —
        # no .first() barrier; the filter side reuses the ranks⋈out_deg
        # join the contribs side also needs.
        dangling_df = (
            ranks.join(out_deg, ranks["id"] == out_deg["src"], "left")
            .filter(F.col("deg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dang"))
        )
        contribs = (
            e.join(ranks, e["src"] == ranks["id"])
            .join(out_deg, "src")
            .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        new_ranks = (
            nodes.join(contribs, nodes["id"] == contribs["dst"], "left")
            .crossJoin(F.broadcast(dangling_df))
            .select(
                "id",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0.0))
                        + F.col("__dang") / n
                    )
                ).alias("rank"),
            )
            .localCheckpoint()
        )
        converged = False
        if (it + 1) % check_every == 0 or it == max_iter - 1:
            delta = (
                new_ranks.alias("a")
                .join(ranks.alias("b"), "id")
                .agg(F.sum(F.abs(F.col("a.rank") - F.col("b.rank"))))
                .first()[0]
            )
            converged = delta is not None and delta < tol
        ranks = new_ranks
        if converged:
            break
    e.unpersist()
    nodes.unpersist()
    out_deg.unpersist()
    return ranks


def triangle_count(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    per_vertex: bool = False,
) -> DataFrame:
    """Exact triangle counting over an undirected simple graph
    (self-loops dropped, duplicate/reversed edges collapsed). Returns a
    1-row (n_triangles) frame, or per-vertex (id, n_triangles) with
    `per_vertex=True` — the substrate for clustering coefficients and
    community/spam signals on link graphs.

    Scale shape — DEGREE ORIENTATION, the standard trick that makes
    triangle enumeration tractable on skewed graphs: each undirected
    edge is directed from its lower-(degree, id) endpoint to the
    higher one, so every triangle is enumerated exactly once from its
    smallest vertex, and the wedge join fans out from LOW-degree
    vertices only — a celebrity node with 10M followers contributes
    wedges bounded by its FOLLOWERS' (small) out-degrees, never
    10M². Plan: two self-joins of the oriented edge list (wedge
    build + closure check), both shuffle-partitioned on their join
    keys; output of the wedge stage is Σ out_deg(v)² with out-degrees
    capped at O(√m) by orientation — the textbook m^{3/2} bound."""
    e = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("id"))
        .unionByName(e.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # orient by (deg, id): u -> v iff (deg(u), u) < (deg(v), v)
    da = deg.select(F.col("id").alias("a"), F.col("deg").alias("da"))
    db = deg.select(F.col("id").alias("b"), F.col("deg").alias("db"))
    keyed = e.join(da, "a").join(db, "b")
    fwd = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = keyed.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("v"),
    )
    # wedges u->v, u->w (v before w in orientation order) closed by v->w
    e1 = oriented.alias("e1")
    e2 = oriented.alias("e2")
    wedges = e1.join(e2, F.col("e1.u") == F.col("e2.u")).select(
        F.col("e1.u").alias("x"),
        F.col("e1.v").alias("y"),
        F.col("e2.v").alias("z"),
    )
    closer = oriented.select(F.col("u").alias("y"), F.col("v").alias("z"))
    tris = wedges.join(closer, ["y", "z"]).select("x", "y", "z")
    if per_vertex:
        return (
            tris.select(F.explode(F.array("x", "y", "z")).alias("id"))
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("n_triangles"))
        )
    return tris.agg(F.count(F.lit(1)).alias("n_triangles"))


def personalized_pagerank(
    edges: DataFrame,
    sources: Sequence | DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    damping: float = 0.85,
    max_iter: int = 20,
    tol: float = 1.0e-6,
    check_every: int = 5,
) -> DataFrame:
    """Personalized (a.k.a. topic-sensitive) PageRank: teleportation
    returns to the `sources` set instead of uniformly everywhere, so
    ranks measure proximity TO the sources — the similar-items /
    related-accounts / local-community primitive on large graphs.
    Optional `weight_col` makes edges weighted (contribution
    proportional to weight / Σ out-weights; duplicate edges sum).

    Same execution discipline as pagerank: one eager localCheckpoint
    per iteration, dangling mass folded in via a broadcast 1-row cross
    join (dangling rank returns to the sources, preserving
    personalization), convergence checked every `check_every` rounds.
    `sources` is a Python sequence of node ids or a 1-column DataFrame;
    the teleport vector is uniform over it."""
    from collections.abc import Sequence as Seq

    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0,1), got {damping}")
    if check_every < 1:
        raise ValueError(f"check_every must be >= 1, got {check_every}")
    w = (
        F.col(weight_col).cast("double")
        if weight_col
        else F.lit(1.0)
    )
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst"), w.alias("w")
    ).persist()
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))

    spark = edges.sparkSession
    if isinstance(sources, Seq) and not isinstance(sources, (str, bytes)):
        src_df = spark.createDataFrame([(s,) for s in sources], ["id"])
    else:
        src_df = sources.toDF("id")
    src_df = src_df.distinct().join(nodes, "id", "left_semi").persist()
    n_src = src_df.count()
    if n_src == 0:
        raise ValueError("sources contains no node present in the graph")
    teleport = src_df.withColumn("tp", F.lit(1.0 / n_src))

    out_w = e.groupBy("src").agg(F.sum("w").alias("wt")).persist()
    ranks = (
        nodes.join(teleport, "id", "left")
        .select("id", F.coalesce(F.col("tp"), F.lit(0.0)).alias("rank"))
        .localCheckpoint()
    )
    for it in range(max_iter):
        dangling_df = (
            ranks.join(out_w, ranks["id"] == out_w["src"], "left")
            .filter(F.col("wt").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dang"))
        )
        contribs = (
            e.join(ranks, e["src"] == ranks["id"])
            .join(out_w, "src")
            .select("dst", (F.col("rank") * F.col("w") / F.col("wt")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        new_ranks = (
            nodes.join(contribs, nodes["id"] == contribs["dst"], "left")
            .join(teleport, "id", "left")
            .crossJoin(F.broadcast(dangling_df))
            .select(
                "id",
                (
                    F.lit(damping)
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0.0))
                        + F.col("__dang") * F.coalesce(F.col("tp"), F.lit(0.0))
                    )
                    + F.lit(1.0 - damping) * F.coalesce(F.col("tp"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
        converged = False
        if (it + 1) % check_every == 0 or it == max_iter - 1:
            delta = (
                new_ranks.alias("a")
                .join(ranks.alias("b"), "id")
                .agg(F.sum(F.abs(F.col("a.rank") - F.col("b.rank"))))
                .first()[0]
            )
            converged = delta is not None and delta < tol
        ranks = new_ranks
        if converged:
            break
    e.unpersist()
    nodes.unpersist()
    out_w.unpersist()
    src_df.unpersist()
    return ranks
