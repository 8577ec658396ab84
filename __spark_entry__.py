"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The engine itself lives in ``distributedqueryengine_spark``; this file
only adapts it to the driver contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from distributedqueryengine_spark import queries as Q
from distributedqueryengine_spark.inventory import INVENTORY, INVENTORY_ORACLES

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q5 shape: 5-way join + agg) on sf0.001."""
    return Q.q_agg_top_nation_revenue(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Consolidated inventory (<=48 entries so the driver's 50-row
    correctness cap covers EVERY operator class — VERDICT r1 item 1).
    Building-block micro-queries stay in queries.py and are exercised
    by pytest; each driver entry is either a single-plan suite or a
    tagged union of fully-verified branches (inventory.py)."""
    return dict(INVENTORY)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query key (omitted → rows-only check)."""
    return dict(INVENTORY_ORACLES)
