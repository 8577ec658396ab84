"""DuckDB oracle SQL, one entry per query in `queries.py`.

The driver registers the parquet fixtures as DuckDB views named
region/nation/customer/supplier/part/orders/lineitem/events/documents/
embeddings and compares row count + schema + order-insensitive value
hash against the Spark result. Aliases here must match the Spark-side
aliases exactly; double aggregates are rounded identically on both
sides (floating-point summation order differs legitimately).
"""

ORACLES: dict[str, str] = {
    "leaf_scan_filter": """
        SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        FROM lineitem
        WHERE l_quantity > 30 AND l_returnflag = 'R'
    """,
    "select_project_join": """
        SELECT c_name, o_orderkey, o_totalprice
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE o_totalprice > 200000
    """,
    "fragment_vertical_join": """
        SELECT c_custkey, c_name, c_acctbal, c_mktsegment
        FROM customer WHERE c_acctbal > 1000
    """,
    "fragment_horizontal_union": """
        SELECT o_orderstatus,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS sum_price
        FROM orders GROUP BY o_orderstatus
    """,
    "union_distinct": """
        SELECT c_nationkey AS nationkey FROM customer
        UNION
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    "join_left_outer": """
        SELECT c_custkey, c_name, count(o_orderkey) AS n_orders
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey, c_name
    """,
    "join_semi": """
        SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    """,
    "join_anti": """
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
    """,
    "join_full_outer": """
        SELECT coalesce(nationkey_c, nationkey_s) AS nationkey,
               coalesce(n_cust, 0) AS n_cust,
               coalesce(n_supp, 0) AS n_supp
        FROM (SELECT c_nationkey AS nationkey_c, count(*) AS n_cust
              FROM customer GROUP BY c_nationkey) c
        FULL OUTER JOIN
             (SELECT s_nationkey AS nationkey_s, count(*) AS n_supp
              FROM supplier GROUP BY s_nationkey) s
        ON nationkey_c = nationkey_s
    """,
    "join_theta": """
        SELECT o_orderpriority, count(*) AS n_fast_lines
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         AND l_shipdate >= o_orderdate
         AND l_shipdate <= o_orderdate + INTERVAL 90 DAY
        GROUP BY o_orderpriority
    """,
    "agg_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2)                                        AS sum_qty,
               round(sum(l_extendedprice), 2)                                   AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
               round(avg(l_quantity), 2)                                        AS avg_qty,
               round(avg(l_extendedprice), 2)                                   AS avg_price,
               round(avg(l_discount), 2)                                        AS avg_disc,
               count(*)                                                         AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "agg_top_nation_revenue": """
        SELECT n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name
    """,
    "agg_distinct": """
        SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_customers
        FROM orders GROUP BY o_orderstatus
    """,
    "agg_rollup": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               count(*) AS n_rows
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "agg_cube": """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS sum_price
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    "topk_orders_per_customer": """
        SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   CAST(row_number() OVER (PARTITION BY o_custkey
                        ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rn
            FROM orders) t
        WHERE rn <= 3
    """,
    "window_running_sum": """
        SELECT o_custkey, o_orderkey,
               round(sum(o_totalprice) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate ASC, o_orderkey ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
        FROM orders
    """,
    "window_lag_lead": """
        SELECT o_custkey, o_orderkey,
               CAST(date_diff('day',
                    lag(o_orderdate) OVER (PARTITION BY o_custkey
                        ORDER BY o_orderdate ASC, o_orderkey ASC),
                    o_orderdate) AS INTEGER) AS days_since_prev
        FROM orders
    """,
    "window_rank_dense": """
        SELECT p_partkey, p_brand, p_size,
               CAST(dense_rank() OVER (PARTITION BY p_brand
                    ORDER BY p_size DESC) AS INTEGER) AS size_rank
        FROM part
    """,
    "sort_limit": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 25
    """,
    "set_intersect": """
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    "set_except": """
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT
        SELECT s_nationkey AS nationkey FROM supplier
    """,
}
