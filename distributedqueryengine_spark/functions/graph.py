"""Iterative graph algorithms beyond dedup.py's connected components.

PageRank here is the canonical iterative-join workload — the class the
driver's oracle deliberately can't express in one SQL text — and its
distributed discipline matches the CC implementation it sits beside:
every iteration is (join + aggregate) on the edge relation partitioned
by key, the lineage is cut with localCheckpoint each round (20
iterations of uncheckpointed joins would nest 20 plans deep and
re-execute the whole chain per action), and the ONLY driver-side data
movement is a 1-row convergence aggregate per iteration (the same
bounded contract as CC's convergence check).

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
) -> DataFrame:
    """(id, rank) over the directed edge list, ranks summing to 1.

    Stops at `max_iter` or when the L1 delta between iterations drops
    below `tol`. Self-loops count as ordinary edges; duplicate edges
    add proportional weight (multigraph semantics — dedupe upstream if
    unwanted)."""
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0,1), got {damping}")
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
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))

    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).localCheckpoint()
    base = (1.0 - damping) / n
    for _ in range(max_iter):
        with_deg = ranks.join(out_deg, ranks["id"] == out_deg["src"], "left")
        # dangling mass: ranks of nodes with no out-edges (1-row agg)
        dangling = (
            with_deg.filter(F.col("deg").isNull())
            .agg(F.sum("rank"))
            .first()[0]
            or 0.0
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
            .select(
                "id",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("contrib"), F.lit(0.0)) + F.lit(dangling / n))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
        delta = (
            new_ranks.alias("a")
            .join(ranks.alias("b"), "id")
            .agg(F.sum(F.abs(F.col("a.rank") - F.col("b.rank"))))
            .first()[0]
        )
        ranks = new_ranks
        if delta is not None and delta < tol:
            break
    e.unpersist()
    nodes.unpersist()
    return ranks
