"""Fragmentation-transparent views — the reference's signature feature.

The reference hardcodes a fragmentation catalog
(QueryService.asmx.cs:310-427): `customer` vertically split across
sites 1-2 rejoined on the key (:320-337), `orders` horizontally split
across sites 1-4 reassembled by UNION (:338-396). Localization rewrites
every leaf into those subtrees, then hand-written pushdown passes keep
predicates fragment-local (:604-640, with hardcoded per-fragment column
guards at :628-631).

Here fragments are ordinary DataFrames and the "localization +
pushdown" program is a view definition: Catalyst pushes filters and
prunes columns through UNION ALL and JOIN views natively
(PushProjectionThroughUnion, predicate pushdown through join), without
per-fragment special cases. tests/test_fragments.py asserts both the
semantic equality (view == base table) and the plan shape (filters
reach each fragment's scan).

At scale the horizontal layout is how a 100 TB table actually lives
(many files/partitions); the vertical layout models column-family
splits. Both reconstructions are shuffle-minimal: the union is a
partition concat, and the vertical join co-partitions on the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributedqueryengine_spark.operators.relational import union_all

N_HORIZONTAL_SITES = 4  # mirrors sites 1-4, QueryService.asmx.cs:338-396


def vertical_fragments(customer: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split customer into the two per-site column subsets.

    Mirrors site1=(id,name) / site2=(id,rank) from the reference
    (QueryService.asmx.cs:320-337, :628-631), on the fixture schema.
    """
    s1 = customer.select("c_custkey", "c_name", "c_nationkey")
    s2 = customer.select("c_custkey", "c_acctbal", "c_mktsegment")
    return s1, s2


def reconstruct_vertical(s1: DataFrame, s2: DataFrame, key: str = "c_custkey") -> DataFrame:
    """Vertical reconstruction: equi-join of fragments on the key.

    The reference emits JOIN(A.id=B.id) (QueryService.asmx.cs:333-336).
    Joining USING(key) keeps a single key column; with both fragments
    derived from the same store the join co-partitions on the key.
    """
    return s1.join(s2, on=key, how="inner")


def horizontal_fragments(df: DataFrame, key: str, n: int = N_HORIZONTAL_SITES) -> list[DataFrame]:
    """Hash-slice a table into n site fragments (orders over sites 1-4,
    QueryService.asmx.cs:338-367)."""
    return [df.filter(F.col(key) % n == i) for i in range(n)]


def reconstruct_horizontal(fragments: list[DataFrame]) -> DataFrame:
    """Horizontal reconstruction: UNION ALL of the slices
    (QueryService.asmx.cs:361; executor DataTable.Merge RPC.cs:330-342)."""
    return union_all(fragments)


def register_fragment_views(spark: SparkSession, customer: DataFrame, orders: DataFrame) -> None:
    """Register customer_v / orders_v reconstruction views in the catalog.

    Queries against the views must be indistinguishable from the base
    tables — the fragmentation-transparency contract the reference's
    localization step provides (QueryService.asmx.cs:310-427).
    """
    s1, s2 = vertical_fragments(customer)
    s1.createOrReplaceTempView("customer_s1")
    s2.createOrReplaceTempView("customer_s2")
    reconstruct_vertical(s1, s2).createOrReplaceTempView("customer_v")
    frags = horizontal_fragments(orders, "o_orderkey")
    for i, f in enumerate(frags, start=1):
        f.createOrReplaceTempView(f"orders_s{i}")
    reconstruct_horizontal(frags).createOrReplaceTempView("orders_v")
