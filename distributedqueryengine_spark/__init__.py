"""distributedqueryengine_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query capabilities of
liming-thu/DistributedQueryEngine (a 4-site distributed SPJ engine,
C#/.NET Remoting/MySQL — see SURVEY.md), re-expressed Spark-first:

- The reference's operator algebra (LEAF scan / SEL / PROJ / JOIN /
  UNION / exchange — reference RPC/RPC/RPC.cs:20-28) maps to the
  DataFrame API; Catalyst supplies the reference's two heuristic
  rewrites (selection pushdown, projection pushdown —
  QueryService.asmx.cs:497-506) natively.
- The reference's fragmentation catalog (vertical customer split,
  horizontal orders split — QueryService.asmx.cs:310-427) becomes
  transparent views over partitioned data (`fragments` module).
- Everything the reference lacks but an OLAP engine needs
  (aggregation, windows, set ops, scalar functions, streaming) is
  provided via Spark built-ins, wrapped as a library.
- Large-scale training-data-pipeline operators (dedup, similarity
  search, text analysis, multimodal columns) are first-class
  (`functions` package), designed partition-parallel for 100 TB.
"""

from distributedqueryengine_spark.session import get_spark, register_tables

__all__ = ["get_spark", "register_tables"]
__version__ = "0.1.0"
