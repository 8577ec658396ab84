"""Market-basket co-occurrence and association rules.

The reference engine stops at single-table aggregates over its
fragment tree (`QueryService.asmx.cs:161-304`); association mining is
part of the analytics extension surface. Implements the classic
support / confidence / lift readout for ITEM PAIRS — the shape that
stays tractable at scale (general frequent-itemset mining is
exponential; pairwise is Σ(basket²) and covers the recommender /
"bought-together" use).

Distributed shape:
- one distinct over (basket, item) — dedup multiplicity inside a
  basket (set semantics, the standard formulation);
- item supports: one groupBy(item) count;
- pair counts: self-join on the BASKET key with item_a < item_b — one
  hash shuffle keyed by basket; work is Σ(basket_size²), bounded by
  `max_basket_items` (in-plan raise, same discipline as
  semantic_dedup's cell guard — a mega-basket means the basket key is
  wrong, e.g. a bot user);
- readout: two broadcast joins of the small item-support table onto
  the pair counts, plus a 1-row total broadcast.

Rules are emitted in BOTH directions (a→b and b→a): confidence is
asymmetric. lift is symmetric and > 1 means positive association.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["association_rules"]


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 1,
    max_basket_items: int = 10_000,
) -> DataFrame:
    """(antecedent, consequent, n_antecedent, n_consequent, n_both,
    support, confidence, lift) per directed item pair with
    n_both >= min_pair_count.

    support    = n_both / n_baskets
    confidence = P(consequent | antecedent) = n_both / n_antecedent
    lift       = confidence / (n_consequent / n_baskets)

    NULL baskets/items are dropped (no membership semantics). Ties and
    duplicates inside a basket collapse first (set semantics).
    """
    b, it = F.col(basket_col), F.col(item_col)
    pres = (
        df.where(b.isNotNull() & it.isNotNull())
        .select(b.alias("__b"), it.alias("__i"))
        .distinct()
    )
    # in-plan basket-size guard: a pathological basket makes the pair
    # join O(size²) in one task — raise with the knob named
    sizes = pres.groupBy("__b").agg(F.count(F.lit(1)).alias("__sz"))
    guarded = pres.join(sizes, "__b").withColumn(
        "__i",
        F.when(F.col("__sz") <= max_basket_items, F.col("__i")).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("association_rules: basket "),
                    F.col("__b").cast("string"),
                    F.lit(
                        f" has > max_basket_items={max_basket_items} items; "
                        "pair join is O(size^2) per basket"
                    ),
                )
            )
        ),
    ).drop("__sz")

    n_baskets = pres.select("__b").distinct().count()
    if n_baskets == 0:
        raise ValueError("association_rules: no non-NULL (basket, item) rows")

    item_counts = pres.groupBy("__i").agg(
        F.count(F.lit(1)).alias("__n_item")
    )
    a = guarded.select(F.col("__b"), F.col("__i").alias("__ia"))
    c = guarded.select(F.col("__b"), F.col("__i").alias("__ib"))
    pairs = (
        a.join(c, "__b")
        .where(F.col("__ia") < F.col("__ib"))
        .groupBy("__ia", "__ib")
        .agg(F.count(F.lit(1)).alias("n_both"))
        .where(F.col("n_both") >= min_pair_count)
    )
    # both directions from the undirected pair counts
    directed = pairs.select(
        F.col("__ia").alias("antecedent"),
        F.col("__ib").alias("consequent"),
        "n_both",
    ).unionByName(
        pairs.select(
            F.col("__ib").alias("antecedent"),
            F.col("__ia").alias("consequent"),
            "n_both",
        )
    )
    na = item_counts.select(
        F.col("__i").alias("antecedent"), F.col("__n_item").alias("n_antecedent")
    )
    nc = item_counts.select(
        F.col("__i").alias("consequent"), F.col("__n_item").alias("n_consequent")
    )
    out = (
        directed.join(F.broadcast(na), "antecedent")
        .join(F.broadcast(nc), "consequent")
        .select(
            "antecedent",
            "consequent",
            F.col("n_antecedent").cast("bigint").alias("n_antecedent"),
            F.col("n_consequent").cast("bigint").alias("n_consequent"),
            F.col("n_both").cast("bigint").alias("n_both"),
            F.round(F.col("n_both") / F.lit(n_baskets), 6).alias("support"),
            F.round(F.col("n_both") / F.col("n_antecedent"), 6).alias(
                "confidence"
            ),
            F.round(
                (F.col("n_both") / F.col("n_antecedent"))
                / (F.col("n_consequent") / F.lit(n_baskets)),
                6,
            ).alias("lift"),
        )
    )
    return out
