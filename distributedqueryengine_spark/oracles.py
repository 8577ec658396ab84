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

ORACLES["skyline_orders"] = """
        WITH o AS (
          SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                 CAST(floor(epoch(o_orderdate)) AS BIGINT) AS ts_epoch
          FROM orders
        )
        SELECT o_orderstatus, o_orderkey, o_custkey, o_totalprice, ts_epoch
        FROM o a
        WHERE NOT EXISTS (
          SELECT 1 FROM o b
          WHERE b.o_orderstatus = a.o_orderstatus
            AND b.o_totalprice >= a.o_totalprice
            AND b.ts_epoch <= a.ts_epoch
            AND (b.o_totalprice > a.o_totalprice OR b.ts_epoch < a.ts_epoch)
        )
    """

# Scalable drop-in for skyline_orders: identical result set (pinned by
# tests/test_skyline_oracle_equiv.py) but O(n log n) window sweeps
# instead of the quadratic NOT-EXISTS self-join. For a 2D skyline
# (maximize o_totalprice, minimize ts_epoch, per o_orderstatus) a row
# is dominated iff some row with ts <= its ts has STRICTLY higher
# price, or some row with ts STRICTLY lower has price >= its price —
# both are prefix maxima over the ts ordering. The definitional
# NOT-EXISTS stays the sf0.01 correctness-gate oracle (it encodes
# dominance directly); this one exists because DuckDB needs ~180s for
# the quadratic form at sf0.1, which poisoned the r11 baseline ratio.
ORACLES["skyline_orders_scalable"] = """
        WITH o AS (
          SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                 CAST(floor(epoch(o_orderdate)) AS BIGINT) AS ts_epoch
          FROM orders
        ), w AS (
          SELECT o_orderstatus, o_orderkey, o_custkey, o_totalprice, ts_epoch,
                 max(o_totalprice) OVER (
                   PARTITION BY o_orderstatus ORDER BY ts_epoch
                   RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS max_price_ts_le,
                 max(o_totalprice) OVER (
                   PARTITION BY o_orderstatus ORDER BY ts_epoch
                   RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ) AS max_price_ts_lt
          FROM o
        )
        SELECT o_orderstatus, o_orderkey, o_custkey, o_totalprice, ts_epoch
        FROM w
        WHERE max_price_ts_le <= o_totalprice
          AND coalesce(max_price_ts_lt, -1e308) < o_totalprice
    """

# ---- extension operators / functions / streaming ----
ORACLES["fn_string"] = r"""
        SELECT p_partkey,
               upper(p_brand) AS brand_upper,
               lower(p_type) AS type_lower,
               substr(p_name, 1, 8) AS name_prefix,
               p_brand || '#' || p_type AS brand_type,
               CAST(length(p_name) AS INTEGER) AS name_len,
               replace(p_name, 'a', '@') AS name_subst
        FROM part
    """
ORACLES["fn_date"] = r"""
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS INTEGER) AS order_year,
               CAST(month(o_orderdate) AS INTEGER) AS order_month,
               CAST(day(o_orderdate) AS INTEGER) AS order_day,
               CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
               CAST(date_diff('day', o_orderdate, TIMESTAMP '2002-01-01') AS INTEGER) AS days_to_2002
        FROM orders
    """
ORACLES["fn_math"] = r"""
        SELECT l_orderkey, l_linenumber,
               abs(l_discount - 0.05) AS abs_disc_delta,
               CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
               round(sqrt(l_quantity), 4) AS qty_sqrt,
               round(ln(l_extendedprice + 1.0), 4) AS price_ln,
               round(pow(l_tax + 1.0, 2), 6) AS tax_sq,
               CAST(l_partkey % 7 AS BIGINT) AS part_mod
        FROM lineitem
    """
ORACLES["fn_json"] = r"""
        SELECT event_type,
               count(*) AS n_events,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
               CAST(max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER) AS max_k
        FROM events GROUP BY event_type
    """
ORACLES["fn_case_when"] = r"""
        SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
                    WHEN o_totalprice < 200000 THEN 'mid'
                    ELSE 'high' END AS price_band,
               count(*) AS n_orders,
               round(avg(o_totalprice), 2) AS avg_price
        FROM orders GROUP BY 1
    """
ORACLES["text_stats"] = r"""
        WITH t AS (
            SELECT doc_id, text,
                   string_split_regex(trim(lower(text)), '\s+') AS toks
            FROM documents)
        SELECT doc_id,
               CAST(len(toks) AS INTEGER) AS n_tokens,
               CAST(length(text) AS INTEGER) AS n_chars_actual,
               round(CAST(len(list_filter(toks, x -> list_contains(['the','a','an','and','or','of','to','in','is','are','was','on','for','with','as','at','by','from','it','this'], x))) AS DOUBLE)
                     / len(toks), 4) AS stop_ratio,
               round(CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
                     / len(toks), 4) AS mean_wlen
        FROM t
    """
ORACLES["text_langid"] = r"""
        WITH t AS (
            SELECT string_split_regex(trim(lower(text)), '\s+') AS toks FROM documents),
        r AS (
            SELECT CAST(len(list_filter(toks, x -> list_contains(['the','a','an','and','or','of','to','in','is','are','was','on','for','with','as','at','by','from','it','this'], x))) AS DOUBLE)
                   / len(toks) AS ratio
            FROM t)
        SELECT CASE WHEN ratio >= 0.08 THEN 'en' ELSE 'other' END AS lang_pred,
               count(*) AS n_docs
        FROM r GROUP BY 1
    """
ORACLES["text_fingerprint"] = r"""
        SELECT doc_id,
               md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp
        FROM documents
    """
ORACLES["dedup_exact"] = r"""
        SELECT md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp,
               min(doc_id) AS canonical_id,
               count(*) AS n_copies
        FROM documents GROUP BY 1
    """
# Exact-substring dedup (functions/substr_dedup.py — ExactSubstr,
# Lee et al. 2022 at token 8-gram granularity) in SQL: identical
# tokenization (normalize + split + empty filter), identical 60-bit
# md5 gram hashes, identical (doc_id, pos) canonical rule and interval
# merge. Positions are 1-based inclusive on both engines.
_SUBSTR_CTE = r"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(
                       string_split(
                           regexp_replace(trim(lower(text)), '\s+', ' ', 'g'),
                           ' '),
                       x -> len(x) > 0) AS t
            FROM documents),
        occ AS (
            SELECT doc_id, i AS pos,
                   CAST('0x' || substr(md5(
                       array_to_string(list_slice(t, i, i + 7), ' ')
                   ), 1, 15) AS BIGINT) AS h
            FROM toks, UNNEST(range(1, len(t) - 6)) AS r(i)),
        dup AS (
            SELECT doc_id, pos,
                   count(*) OVER (PARTITION BY h) AS n_occ,
                   row_number() OVER (PARTITION BY h ORDER BY doc_id, pos)
                       = 1 AS is_canonical
            FROM occ)
"""

_SUBSTR_MERGE = r"""
        seg AS (
            SELECT doc_id, pos,
                   CASE WHEN pos > coalesce(max(pos + 7) OVER (
                            PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING), -1) + 1
                        THEN 1 ELSE 0 END AS new_seg
            FROM hits),
        seg2 AS (
            SELECT doc_id, pos,
                   sum(new_seg) OVER (PARTITION BY doc_id ORDER BY pos
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                               AND CURRENT ROW) AS seg
            FROM seg),
        spans AS (
            SELECT doc_id, min(pos) AS start_tok, max(pos) + 7 AS end_tok,
                   count(*) AS n_grams
            FROM seg2 GROUP BY doc_id, seg)
"""

ORACLES["dedup_substr_spans"] = _SUBSTR_CTE + r"""
        , hits AS (SELECT doc_id, pos FROM dup WHERE n_occ >= 2),
""" + _SUBSTR_MERGE + r"""
        SELECT doc_id AS id, start_tok, end_tok, n_grams FROM spans
    """

ORACLES["dedup_substr_strip"] = _SUBSTR_CTE + r"""
        , hits AS (SELECT doc_id, pos FROM dup
                   WHERE n_occ >= 2 AND NOT is_canonical),
""" + _SUBSTR_MERGE + r"""
        , tokpos AS (
            SELECT doc_id, i AS tpos, t[i] AS tok
            FROM toks, UNNEST(range(1, len(t) + 1)) AS r(i)),
        kept AS (
            SELECT tp.doc_id, tp.tpos, tp.tok
            FROM tokpos tp
            WHERE NOT EXISTS (
                SELECT 1 FROM spans s
                WHERE s.doc_id = tp.doc_id
                  AND tp.tpos BETWEEN s.start_tok AND s.end_tok)),
        clean AS (
            SELECT doc_id,
                   string_agg(tok, ' ' ORDER BY tpos) AS clean_text,
                   count(*) AS n_kept
            FROM kept GROUP BY doc_id),
        base AS (SELECT doc_id, len(t) AS n_tokens FROM toks)
        SELECT b.doc_id AS id,
               coalesce(clean_text, '') AS clean_text,
               n_tokens,
               n_tokens - coalesce(n_kept, 0) AS n_removed
        FROM base b LEFT JOIN clean USING (doc_id)
    """

ORACLES["sim_bruteforce_topk"] = r"""
        WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
                   FROM embeddings WHERE vec_id % 10 = 0),
             c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
                   FROM embeddings),
             s AS (SELECT query_id, neighbor_id,
                          round(list_dot_product(qv, cv)
                                / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))),
                                6) AS cos
                   FROM q JOIN c ON query_id <> neighbor_id),
             r AS (SELECT query_id, neighbor_id, cos,
                          CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, neighbor_id ASC) AS INTEGER) AS rnk
                   FROM s),
             -- 'rrf' branch: BM25 top-20 (k1=1.2, b=0.75, same Okapi
             -- math as functions/text.bm25_topk) fused with the dense
             -- cosine top-20 of query vec 0 via reciprocal-rank fusion
             -- (rank-only, engine-exact)
             base AS (
               SELECT doc_id AS id,
                      list_filter(string_split_regex(lower(trim(text)), '\s+'),
                                  t -> length(t) > 0) AS toks
               FROM documents),
             lens AS (SELECT id, CAST(len(toks) AS DOUBLE) AS dl FROM base),
             bstats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM lens),
             hits AS (
               SELECT b.id, l.dl, t.t, count(*) AS tf
               FROM base b JOIN lens l ON b.id = l.id,
                    unnest(b.toks) AS t(t)
               WHERE t.t IN ('data', 'first', 'model', 'the')
               GROUP BY 1, 2, 3),
             dfreq AS (SELECT t, count(*) AS df FROM hits GROUP BY 1),
             scored AS (
               SELECT h.id,
                      round(sum(
                        ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
                        * (h.tf * (1.2 + 1))
                        / (h.tf + 1.2 * (1.0 - 0.75 + 0.75 * h.dl / s.avgdl))
                      ), 6) AS score
               FROM hits h JOIN dfreq d ON h.t = d.t, bstats s
               GROUP BY h.id),
             lex AS (
               SELECT id, CAST(row_number() OVER (
                      ORDER BY score DESC, id ASC) AS INTEGER) AS rnk
               FROM scored QUALIFY rnk <= 20),
             d0 AS (
               SELECT neighbor_id AS id, CAST(row_number() OVER (
                      ORDER BY cos DESC, neighbor_id ASC) AS INTEGER) AS rnk
               FROM s WHERE query_id = 0 QUALIFY rnk <= 20),
             fuse AS (
               SELECT id, round(sum(contrib), 9) AS score
               FROM (SELECT id, 1.0 / (60.0 + rnk) AS contrib FROM lex
                     UNION ALL
                     SELECT id, 1.0 / (60.0 + rnk) FROM d0) u
               GROUP BY id),
             rrfb AS (
               SELECT 'rrf' AS branch, CAST(0 AS BIGINT) AS query_id,
                      id AS neighbor_id, score,
                      CAST(row_number() OVER (
                          ORDER BY score DESC, id ASC) AS INTEGER) AS rnk
               FROM fuse QUALIFY rnk <= 10),
             -- 'hardneg' branch: each query's top-1 neighbor is its
             -- known positive; negatives are the next-3 most similar
             pos1 AS (SELECT query_id, neighbor_id FROM r WHERE rnk = 1),
             hneg AS (
               SELECT 'hardneg' AS branch, s.query_id, s.neighbor_id,
                      s.cos AS score,
                      CAST(row_number() OVER (PARTITION BY s.query_id
                          ORDER BY s.cos DESC, s.neighbor_id ASC)
                          AS INTEGER) AS rnk
               FROM s ANTI JOIN pos1 p
                 ON s.query_id = p.query_id AND s.neighbor_id = p.neighbor_id
               QUALIFY rnk <= 3),
             -- 'knn' branch (r13): majority vote over the cosine top-5
             -- among the labeled train split (vec_id % 10 <> 0); vote
             -- ties break by smallest label
             ct AS (SELECT vec_id AS neighbor_id, CAST(label AS BIGINT) AS lbl,
                           CAST(embedding AS DOUBLE[]) AS cv
                    FROM embeddings WHERE vec_id % 10 <> 0),
             st AS (SELECT query_id, neighbor_id, lbl,
                           round(list_dot_product(qv, cv)
                                 / (sqrt(list_dot_product(qv, qv))
                                    * sqrt(list_dot_product(cv, cv))), 6) AS cos
                    FROM q JOIN ct ON query_id <> neighbor_id),
             rt AS (SELECT query_id, lbl, cos,
                           row_number() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, neighbor_id ASC) AS trnk
                    FROM st),
             votes AS (SELECT query_id, lbl, count(*) AS n
                       FROM rt WHERE trnk <= 5 GROUP BY 1, 2),
             knnb AS (
               SELECT 'knn' AS branch, query_id, lbl AS neighbor_id,
                      CAST(n AS DOUBLE) AS score, CAST(1 AS INTEGER) AS rnk,
                      row_number() OVER (PARTITION BY query_id
                          ORDER BY n DESC, lbl ASC) AS rn
               FROM votes QUALIFY rn = 1),
             -- 'centroid' branch (r13): nearest per-label mean vector
             -- by cosine, rounded to 6dp before the argmax
             dims AS (SELECT lbl, i, avg(cv[i]) AS m
                      FROM ct, UNNEST(range(1, len(cv) + 1)) AS rr(i)
                      GROUP BY lbl, i),
             cent AS (SELECT lbl, list(m ORDER BY i) AS centv FROM dims GROUP BY lbl),
             cs AS (SELECT query_id, lbl,
                           round(list_dot_product(qv, centv)
                                 / (sqrt(list_dot_product(qv, qv))
                                    * sqrt(list_dot_product(centv, centv))), 6) AS cos
                    FROM q CROSS JOIN cent),
             centb AS (
               SELECT 'centroid' AS branch, query_id, lbl AS neighbor_id,
                      cos AS score, CAST(1 AS INTEGER) AS rnk,
                      row_number() OVER (PARTITION BY query_id
                          ORDER BY cos DESC, lbl ASC) AS rn
               FROM cs QUALIFY rn = 1)
        SELECT 'cos' AS branch, query_id, neighbor_id, cos AS score, rnk
        FROM r WHERE rnk <= 5
        UNION ALL
        SELECT * FROM rrfb
        UNION ALL
        SELECT * FROM hneg
        UNION ALL
        SELECT branch, query_id, neighbor_id, score, rnk FROM knnb
        UNION ALL
        SELECT branch, query_id, neighbor_id, score, rnk FROM centb
    """
# Stupid-backoff trigram LM scoring (functions/lm.py, Brants 2007)
# standalone: vocab top-500 (count desc, token asc), 2xBOS+EOS
# framing, OOV -> <unk>, counts from the FULL corpus, scores over
# the doc_id %% 7 subsample. Literal arithmetic mirrors the Spark
# expression order (0.4 * 0.4 * ..., left-assoc) so doubles agree
# bit-for-bit; avg-neg-logscore rounds to 6dp BEFORE exp, as in
# score_stupid_backoff.
_LM_SQL = r"""
        WITH
             lmtok AS (
            SELECT doc_id,
                   list_filter(string_split_regex(trim(lower(text)), '\s+'),
                               t -> length(t) > 0) AS toks
            FROM documents),
             lmwc AS (
            SELECT u.w, count(*) AS c
            FROM (SELECT unnest(toks) AS w FROM lmtok) u GROUP BY u.w),
             lmvoc AS (
            SELECT w FROM lmwc
            QUALIFY row_number() OVER (ORDER BY c DESC, w ASC) <= 500),
             lmvl AS (SELECT list(w) AS vs, count(*) AS nv FROM lmvoc),
             lmframed AS (
            SELECT doc_id,
                   ['<s>', '<s>']
                   || list_transform(toks, t -> CASE WHEN list_contains(lmvl.vs, t)
                                                     THEN t ELSE '<unk>' END)
                   || ['</s>'] AS f
            FROM lmtok CROSS JOIN lmvl),
             lmtri_all AS (
            SELECT doc_id, f[i] AS w1, f[i+1] AS w2, f[i+2] AS w3
            FROM lmframed, UNNEST(range(1, len(f) - 1)) AS r(i)),
             lmtric AS (
            SELECT w1, w2, w3, count(*) AS c FROM lmtri_all GROUP BY 1, 2, 3),
             lmbic AS (
            SELECT w1, w2, count(*) AS c
            FROM (SELECT f[i] AS w1, f[i+1] AS w2
                  FROM lmframed, UNNEST(range(1, len(f))) AS r(i))
            GROUP BY 1, 2),
             lmunic AS (
            SELECT w, count(*) AS c
            FROM (SELECT unnest(f) AS w FROM lmframed) GROUP BY 1),
             lmn AS (SELECT sum(len(f)) AS n_tok FROM lmframed),
             lmsc AS (
            SELECT g.doc_id,
                   CASE WHEN t.c IS NOT NULL AND b12.c IS NOT NULL
                             THEN t.c / b12.c
                        WHEN b23.c IS NOT NULL AND u2.c IS NOT NULL
                             THEN 0.4 * b23.c / u2.c
                        ELSE 0.4 * 0.4 * (COALESCE(u3.c, 0) + 1)
                             / (lmn.n_tok + lmvl.nv + 3)
                   END AS s
            FROM (SELECT * FROM lmtri_all WHERE doc_id % 7 = 0) g
            LEFT JOIN lmtric t ON g.w1 = t.w1 AND g.w2 = t.w2 AND g.w3 = t.w3
            LEFT JOIN lmbic b12 ON g.w1 = b12.w1 AND g.w2 = b12.w2
            LEFT JOIN lmbic b23 ON g.w2 = b23.w1 AND g.w3 = b23.w2
            LEFT JOIN lmunic u2 ON g.w2 = u2.w
            LEFT JOIN lmunic u3 ON g.w3 = u3.w
            CROSS JOIN lmn CROSS JOIN lmvl),
             lmb AS (
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
                   round(-avg(ln(s)), 6) AS avg_neg_logscore
            FROM lmsc GROUP BY doc_id)
        SELECT doc_id, n_trigrams, avg_neg_logscore,
               round(exp(avg_neg_logscore), 6) AS pseudo_perplexity
        FROM lmb
    """
ORACLES["lm_backoff_scores"] = _LM_SQL

ORACLES["text_wordcount_suite"] = r"""
        WITH toks AS (
            SELECT string_split(trim(lower(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
            FROM documents),
             uni AS (
            SELECT u.tok, count(*) AS n_tok
            FROM (SELECT unnest(t) AS tok FROM toks) u GROUP BY u.tok),
             nu AS (SELECT sum(n_tok) AS nu FROM uni),
             unib AS (
            SELECT 'unigram' AS branch, tok AS term, n_tok AS n,
                   round(n_tok / nu, 6) AS score,
                   row_number() OVER (ORDER BY n_tok DESC, tok ASC) AS rn
            FROM uni CROSS JOIN nu QUALIFY rn <= 20),
             -- 'pmi' branch (r13): top-20 adjacent bigrams by pointwise
             -- mutual information (min count 5), PMI rounded to 6dp
             -- BEFORE ranking so a 1-ulp ln() spread cannot flip the
             -- rank-k boundary; residual ties break lexicographically
             pairs AS (
            SELECT t[i] AS a, t[i+1] AS b
            FROM toks, UNNEST(range(1, len(t))) AS r(i)
            WHERE len(t) >= 2),
             big AS (SELECT a, b, count(*) AS n_ab FROM pairs GROUP BY a, b),
             nb AS (SELECT sum(n_ab) AS nb FROM big),
             pmib AS (
            SELECT 'pmi' AS branch, big.a || ' ' || big.b AS term,
                   n_ab AS n,
                   round(ln((n_ab / nb.nb) / ((ua.n_tok / nu.nu) * (ub.n_tok / nu.nu))), 6) AS score
            FROM big
            JOIN uni ua ON ua.tok = big.a
            JOIN uni ub ON ub.tok = big.b
            CROSS JOIN nb CROSS JOIN nu
            WHERE n_ab >= 5
            QUALIFY row_number() OVER (ORDER BY score DESC, term ASC) <= 20),
             -- 'diff' branch (r14): dataset_diff — old snapshot = docs
             -- with doc_id % 7 != 0, planted ' extra tail' edit on
             -- doc_id % 5 == 0; change detection by md5 of normalized
             -- text, token counts blank-guarded like pack_sequences
             oldd AS (
            SELECT doc_id, source,
                   CASE WHEN doc_id % 5 = 0 THEN text || ' extra tail'
                        ELSE text END AS text
            FROM documents WHERE doc_id % 7 <> 0),
             po AS (
            SELECT doc_id, source,
                   md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp,
                   CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(string_split_regex(trim(lower(text)), '\s+'))
                   END AS nt
            FROM oldd),
             pn AS (
            SELECT doc_id, source,
                   md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp,
                   CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(string_split_regex(trim(lower(text)), '\s+'))
                   END AS nt
            FROM documents),
             dj AS (
            SELECT COALESCE(pn.source, po.source) AS grp,
                   CASE WHEN po.fp IS NULL THEN 'added'
                        WHEN pn.fp IS NULL THEN 'removed'
                        WHEN po.fp = pn.fp THEN 'unchanged'
                        ELSE 'changed' END AS status,
                   COALESCE(pn.nt, 0) - COALESCE(po.nt, 0) AS dt
            FROM po FULL OUTER JOIN pn USING (doc_id)),
             dagg AS (
            SELECT grp,
                   sum(CASE WHEN status = 'added' THEN 1 ELSE 0 END) AS n_added,
                   sum(CASE WHEN status = 'removed' THEN 1 ELSE 0 END) AS n_removed,
                   sum(CASE WHEN status = 'changed' THEN 1 ELSE 0 END) AS n_changed,
                   sum(CASE WHEN status = 'unchanged' THEN 1 ELSE 0 END) AS n_unchanged,
                   sum(dt) AS tok_delta
            FROM dj GROUP BY grp),
             diffb AS (
            SELECT 'diff' AS branch, grp || '|added' AS term,
                   CAST(n_added AS BIGINT) AS n,
                   CAST(NULL AS DOUBLE) AS score FROM dagg
            UNION ALL
            SELECT 'diff', grp || '|removed', CAST(n_removed AS BIGINT),
                   NULL FROM dagg
            UNION ALL
            SELECT 'diff', grp || '|changed', CAST(n_changed AS BIGINT),
                   NULL FROM dagg
            UNION ALL
            SELECT 'diff', grp || '|unchanged', CAST(n_unchanged AS BIGINT),
                   NULL FROM dagg
            UNION ALL
            SELECT 'diff', grp || '|tok_delta', CAST(tok_delta AS BIGINT),
                   NULL FROM dagg),
             -- 'clf_pos'/'clf_neg' branches (r14): explain_hashed_logreg
             -- over the deterministic synthetic model
             -- w[b] = ((b·2654435761) mod 2048 − 1024)/1024 (exact in
             -- doubles, bijective over buckets → tie-free weights).
             -- Grams = nonempty unigrams + adjacent bigrams; bucket =
             -- portable 60-bit md5 hash mod 1024; collision context =
             -- distinct grams per bucket
             cg AS (
            SELECT tok AS gram, n_tok AS n_occ FROM uni WHERE tok <> ''
            UNION ALL
            SELECT a || ' ' || b AS gram, n_ab FROM big),
             cgb AS (
            SELECT gram, n_occ,
                   CAST('0x' || substr(md5(gram), 1, 15) AS BIGINT) % 1024 AS bucket
            FROM cg),
             cgw AS (
            SELECT gram, n_occ, bucket,
                   ((bucket * 2654435761) % 2048 - 1024) / 1024.0 AS w,
                   count(*) OVER (PARTITION BY bucket) AS n_in_bucket
            FROM cgb),
             clfp AS (
            SELECT 'clf_pos' AS branch,
                   gram || '|' || CAST(bucket AS VARCHAR) || '|'
                        || CAST(n_in_bucket AS VARCHAR) AS term,
                   n_occ AS n, w AS score
            FROM cgw WHERE w > 0
            QUALIFY row_number() OVER (ORDER BY w DESC, gram ASC) <= 20),
             clfn AS (
            SELECT 'clf_neg' AS branch,
                   gram || '|' || CAST(bucket AS VARCHAR) || '|'
                        || CAST(n_in_bucket AS VARCHAR) AS term,
                   n_occ AS n, w AS score
            FROM cgw WHERE w < 0
            QUALIFY row_number() OVER (ORDER BY w ASC, gram ASC) <= 20)
        SELECT branch, term, n, score FROM unib
        UNION ALL
        SELECT branch, term, n, score FROM pmib
        UNION ALL
        SELECT branch, term, n, score FROM diffb
        UNION ALL
        SELECT branch, term, n, score FROM clfp
        UNION ALL
        SELECT branch, term, n, score FROM clfn
        UNION ALL
        SELECT 'lm' AS branch, CAST(doc_id AS VARCHAR) AS term,
               n_trigrams AS n, avg_neg_logscore AS score
        FROM (
""" + _LM_SQL + """
        ) lmq
    """
ORACLES["multimodal_features"] = r"""
        SELECT doc_id AS media_id,
               CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
               sha256(text) AS digest
        FROM documents
    """
ORACLES["sample_hash_split"] = r"""
        WITH d AS (
            SELECT n_chars,
                   CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
                        WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
                        ELSE 'test' END AS split
            FROM documents)
        SELECT split, count(*) AS n, round(avg(n_chars), 2) AS avg_chars
        FROM d GROUP BY split
    """
ORACLES["sample_budget"] = r"""
        WITH t AS (
            SELECT doc_id, lang,
                   string_split_regex(trim(lower(text)), '\s+') AS toks,
                   -- blank-text guard (mirrors Spark token_count = 0;
                   -- split('') is [''] len 1 in BOTH engines, so the
                   -- stop/word-len ratio terms below need no guard)
                   CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(string_split_regex(trim(lower(text)), '\s+'))
                   END AS nt
            FROM documents),
        s AS (
            SELECT doc_id, lang,
                   CAST(nt AS BIGINT) AS n_tokens,
                   round((least(nt / 50.0, 1.0)
                          + least(5.0 * CAST(len(list_filter(toks, x -> list_contains(['the','a','an','and','or','of','to','in','is','are','was','on','for','with','as','at','by','from','it','this'], x))) AS DOUBLE) / len(toks), 1.0)
                          + CASE WHEN CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks) BETWEEN 3.0 AND 10.0
                                 THEN 1.0 ELSE 0.3 END) / 3.0, 4) AS quality
            FROM t),
        c AS (
            SELECT doc_id, lang, quality,
                   sum(n_tokens) OVER (ORDER BY quality DESC, doc_id ASC
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                                AND CURRENT ROW) AS cum_tokens
            FROM s)
        SELECT doc_id, lang, quality, cum_tokens
        FROM c WHERE cum_tokens <= 8000
    """
ORACLES["sample_stratified"] = r"""
        WITH r AS (
            SELECT doc_id, lang,
                   row_number() OVER (PARTITION BY lang
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
            FROM documents)
        SELECT doc_id, lang FROM r WHERE rn % 10 = 1
    """
ORACLES["sample_mixture"] = r"""
        WITH r AS (
            SELECT doc_id, source,
                   row_number() OVER (PARTITION BY source
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
                   count(*) OVER (PARTITION BY source) AS n_src,
                   CASE WHEN CAST(substring(source, 4) AS INT) % 2 = 0
                        THEN 0.2 ELSE 0.6 END AS rate
            FROM documents)
        SELECT doc_id, source FROM r WHERE rn <= ceil(rate * n_src)
    """

# Per-language budget selection (sampling.select_until_budget_grouped):
# identical scoring to sample_budget, per-lang running totals, 'en'
# budget 6000 / others 1500 — the multilingual budget form
ORACLES["sample_budget_grouped"] = r"""
        WITH t AS (
            SELECT doc_id, lang,
                   string_split_regex(trim(lower(text)), '\s+') AS toks,
                   CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(string_split_regex(trim(lower(text)), '\s+'))
                   END AS nt
            FROM documents),
        s AS (
            SELECT doc_id, lang,
                   CAST(nt AS BIGINT) AS n_tokens,
                   round((least(nt / 50.0, 1.0)
                          + least(5.0 * CAST(len(list_filter(toks, x -> list_contains(['the','a','an','and','or','of','to','in','is','are','was','on','for','with','as','at','by','from','it','this'], x))) AS DOUBLE) / len(toks), 1.0)
                          + CASE WHEN CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks) BETWEEN 3.0 AND 10.0
                                 THEN 1.0 ELSE 0.3 END) / 3.0, 4) AS quality
            FROM t),
        c AS (
            SELECT doc_id, lang, quality,
                   sum(n_tokens) OVER (PARTITION BY lang
                                       ORDER BY quality DESC, doc_id ASC
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                                AND CURRENT ROW) AS cum
            FROM s)
        SELECT doc_id, lang, quality, cum
        FROM c
        WHERE (lang = 'en' AND cum <= 6000)
           OR (lang = 'zh' AND cum <= 1500)
    """

# apply_mixture_rates ∘ temperature_mixture_rates (functions/
# sampling.py) at T = 0.5: rate_g = round(least((n²/Σn²)·Σn/n, 1), 6)
# — pow(n, 2) is exact in doubles and the divisions follow the same
# operand order as the Spark expression, so the rounded rates match
# bit-for-bit; membership = md5-rank quota ceil(rate·n) per source
# with the seed-0 '0§' key prefix (concat_ws mirror)
ORACLES["sample_mixture_applied"] = r"""
        WITH s AS (SELECT source, count(*) AS n_src
                   FROM documents GROUP BY source),
        z AS (SELECT sum(pow(n_src, 2.0)) AS z, sum(n_src) AS tot FROM s),
        rt AS (SELECT source,
                      round(least((pow(n_src, 2.0) / z.z) * z.tot / n_src,
                                  1.0), 6) AS rate
               FROM s CROSS JOIN z),
        d AS (SELECT doc_id, dd.source, rate,
                     row_number() OVER (PARTITION BY dd.source
                         ORDER BY md5('0§' || CAST(doc_id AS VARCHAR)),
                                  doc_id) AS rn,
                     count(*) OVER (PARTITION BY dd.source) AS n_src
              FROM documents dd JOIN rt USING (source))
        SELECT doc_id, source FROM d WHERE rn <= ceil(rate * n_src)
    """

# distributed_global_rank over orders: the oracle IS the global
# window the Spark side refuses to plan (DuckDB can afford it at
# sf0.01/0.1); thinned to every 37th rank to bound the compare
ORACLES["global_rank_orders"] = r"""
        SELECT o_orderkey, o_custkey, o_totalprice, g_rnk
        FROM (SELECT o_orderkey, o_custkey, o_totalprice,
                     row_number() OVER (ORDER BY o_totalprice ASC,
                                        o_orderkey ASC) AS g_rnk
              FROM orders)
        WHERE (g_rnk - 1) % 37 = 0
    """

# DSIR (functions/dsir.py) — the full hashed-ngram importance pipeline
# in SQL: identical tokenize (normalize + split + empty filter),
# identical 60-bit md5 buckets mod 1024, identical add-one smoothing,
# and for the selection branch the identical md5-derived Gumbel keys.
# Target = English subset, source = the whole corpus.
_DSIR_SCORES_CTE = r"""
        WITH toks AS (
            SELECT doc_id, lang,
                   list_filter(
                       string_split(
                           regexp_replace(trim(lower(text)), '\s+', ' ', 'g'),
                           ' '),
                       x -> len(x) > 0) AS t
            FROM documents),
        grams AS (
            SELECT doc_id, unnest(t) AS g FROM toks
            UNION ALL
            SELECT doc_id, t[i] || ' ' || t[i+1] AS g
            FROM toks, UNNEST(range(1, len(t))) AS r(i)
        ),
        feats AS (
            SELECT doc_id,
                   CAST('0x' || substr(md5(g), 1, 15) AS BIGINT) % 1024 AS bucket,
                   count(*) AS cnt
            FROM grams GROUP BY 1, 2),
        tstats AS (
            SELECT bucket, sum(cnt) AS t_cnt FROM feats
            WHERE doc_id IN (SELECT doc_id FROM documents WHERE lang = 'en')
            GROUP BY 1),
        tt AS (SELECT sum(t_cnt) AS t_tot FROM tstats),
        sstats AS (SELECT bucket, sum(cnt) AS s_cnt FROM feats GROUP BY 1),
        st AS (SELECT sum(s_cnt) AS s_tot FROM sstats),
        ratios AS (
            SELECT s.bucket,
                   ln((coalesce(t_cnt, 0) + 1.0) / (t_tot + 1024.0))
                   - ln((s_cnt + 1.0) / (s_tot + 1024.0)) AS lr
            FROM sstats s LEFT JOIN tstats USING (bucket), tt, st),
        scores AS (
            SELECT f.doc_id AS id,
                   sum(cnt) AS n_grams,
                   sum(cnt * lr) / sum(cnt) AS score
            FROM feats f JOIN ratios USING (bucket)
            GROUP BY 1),
        scored AS (
            SELECT s.id, d.lang, s.n_grams, s.score
            FROM scores s JOIN documents d ON s.id = d.doc_id)
"""

ORACLES["dsir_scores"] = _DSIR_SCORES_CTE + r"""
        SELECT id, lang, n_grams,
               round(score, 4) + 0.0 AS score  -- -0.0 -> +0.0, as Spark
        FROM scored
    """

ORACLES["dsir_select"] = _DSIR_SCORES_CTE + r"""
        , keyed AS (
            -- round(gkey, 6) before ranking, ties by id: mirrors
            -- gumbel_topk's quantize=6 so a 1-ulp libm ln() spread
            -- between engines cannot flip the rank-k boundary
            SELECT id, lang, n_grams,
                   round(score / 1.0 - ln(-ln(
                       (CAST(CAST('0x' || substr(
                            md5('7:' || CAST(id AS VARCHAR)), 1, 15)
                        AS BIGINT) AS DOUBLE) + 0.5)
                       / 1152921504606846976.0)), 6) AS gkey
            FROM scored)
        SELECT id, lang, n_grams
        FROM keyed ORDER BY gkey DESC, id ASC LIMIT 300
    """
ORACLES["agg_regression"] = r"""
        SELECT l_returnflag,
               round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
               round(regr_intercept(l_extendedprice, l_quantity), 2) AS intercept,
               round(regr_r2(l_extendedprice, l_quantity), 4) AS r2,
               regr_count(l_extendedprice, l_quantity) AS n_pairs
        FROM lineitem GROUP BY l_returnflag
    """
ORACLES["agg_bitwise"] = r"""
        SELECT l_returnflag,
               bit_or(CAST(l_linenumber AS BIGINT)) AS bits_or,
               bit_and(CAST(l_linenumber AS BIGINT)) AS bits_and,
               bit_xor(CAST(l_linenumber AS BIGINT)) AS bits_xor
        FROM lineitem GROUP BY l_returnflag
    """
ORACLES["histogram_bucket"] = r"""
        WITH b AS (
            SELECT o_totalprice,
                   CAST(CASE WHEN o_totalprice < 0 THEN 0
                             WHEN o_totalprice >= 600000 THEN 21
                             ELSE floor(o_totalprice / 30000.0) + 1 END AS BIGINT) AS bucket
            FROM orders)
        SELECT bucket, count(*) AS n,
               round(min(o_totalprice), 2) AS lo,
               round(max(o_totalprice), 2) AS hi
        FROM b GROUP BY bucket
    """
ORACLES["multimodal_resize"] = r"""
        SELECT doc_id AS media_id,
               32 AS width,
               16 AS height,
               CAST(CASE WHEN octet_length(encode(text)) = 0
                         THEN 0 ELSE 32 * 16 END AS INTEGER) AS n_out
        FROM documents
    """
ORACLES["multimodal_frames"] = r"""
        WITH d AS (SELECT doc_id, octet_length(encode(text)) AS nb FROM documents),
             f AS (SELECT doc_id, nb,
                          unnest(range(least(CAST(ceil(nb / 256.0) AS BIGINT), 4))) AS i
                   FROM d WHERE nb > 0)
        SELECT doc_id AS media_id,
               CAST(i AS INTEGER) AS frame_idx,
               CAST(least(256, nb - i * 256) AS INTEGER) AS n_frame_bytes
        FROM f
    """
ORACLES["stream_tumbling"] = r"""
        SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 AS window_start,
               event_type,
               count(*) AS n,
               round(sum(value), 2) AS sum_value
        FROM events GROUP BY 1, 2
    """
ORACLES["stream_sliding"] = r"""
        WITH e AS (SELECT CAST(floor(epoch(ts)) AS BIGINT) AS es, value FROM events),
             x AS (SELECT unnest([(es // 3600) * 3600, (es // 3600) * 3600 - 3600]) AS window_start,
                          value
                   FROM e)
        SELECT window_start, count(*) AS n, round(sum(value), 2) AS sum_value
        FROM x GROUP BY 1
    """
ORACLES["stream_session"] = r"""
        WITH e AS (
            SELECT user_id, ts,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS new_s
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        s AS (
            SELECT user_id, ts,
                   sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
            FROM e)
        SELECT CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start,
               CAST(floor(epoch(max(ts))) AS BIGINT) + 1800 AS session_end,
               user_id,
               count(*) AS n_events
        FROM s GROUP BY user_id, sid
    """
ORACLES["asof_join"] = r"""
        SELECT l.event_id, l.user_id,
               CAST(floor(epoch(l.ts)) AS BIGINT) AS click_epoch,
               CAST(floor(epoch(r.ts)) AS BIGINT) AS purchase_epoch,
               round(r.value, 4) AS purchase_value
        FROM (SELECT * FROM events WHERE event_type = 'click') l
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
          ON l.user_id = r.user_id AND l.ts >= r.ts
    """
ORACLES["range_join"] = r"""
        SELECT s_suppkey, count(*) AS n_matches
        FROM supplier JOIN customer
          ON c_acctbal >= s_acctbal AND c_acctbal < s_acctbal + 500
        GROUP BY s_suppkey
    """

# ---- pivot / stats / SQL-API ----
ORACLES["pivot_events"] = r"""
        SELECT user_id,
               count(*) FILTER (WHERE event_type = 'click')    AS n_click,
               count(*) FILTER (WHERE event_type = 'view')     AS n_view,
               count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
               count(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
               count(*) FILTER (WHERE event_type = 'error')    AS n_error
        FROM events GROUP BY user_id
    """
ORACLES["unpivot_events"] = r"""
        WITH wide AS (
            SELECT user_id,
                   count(*) FILTER (WHERE event_type = 'click')    AS n_click,
                   count(*) FILTER (WHERE event_type = 'view')     AS n_view,
                   count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
                   count(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
                   count(*) FILTER (WHERE event_type = 'error')    AS n_error
            FROM events GROUP BY user_id)
        SELECT user_id, 'n_click' AS metric, n_click AS n FROM wide
        UNION ALL SELECT user_id, 'n_view', n_view FROM wide
        UNION ALL SELECT user_id, 'n_purchase', n_purchase FROM wide
        UNION ALL SELECT user_id, 'n_signup', n_signup FROM wide
        UNION ALL SELECT user_id, 'n_error', n_error FROM wide
    """
ORACLES["agg_grouping_sets"] = r"""
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS sum_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """
ORACLES["agg_stats"] = r"""
        SELECT l_returnflag,
               round(stddev_samp(l_quantity), 4) AS sd_qty,
               round(var_samp(l_discount), 6) AS var_disc,
               round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
               round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price,
               round(avg(l_tax), 6) AS avg_tax
        FROM lineitem GROUP BY l_returnflag
    """
ORACLES["agg_percentiles"] = r"""
        SELECT o_orderstatus,
               round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
               round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
               round(quantile_cont(o_totalprice, 0.99), 4) AS p99
        FROM orders GROUP BY o_orderstatus
    """
ORACLES["fn_array_explode"] = r"""
        WITH toks AS (
            SELECT unnest(string_split_regex(trim(lower(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS token
            FROM documents)
        SELECT token, count(*) AS n
        FROM toks GROUP BY token
        ORDER BY n DESC, token ASC
        LIMIT 20
    """
ORACLES["sql_cte_subquery"] = r"""
        WITH big_spenders AS (
            SELECT o_custkey, round(sum(o_totalprice), 2) AS total_spent
            FROM orders GROUP BY o_custkey
        )
        SELECT c.c_custkey, c.c_name, b.total_spent
        FROM customer c JOIN big_spenders b ON c.c_custkey = b.o_custkey
        WHERE b.total_spent > (SELECT avg(total_spent) FROM big_spenders)
    """
ORACLES["window_ntile"] = r"""
        SELECT o_orderkey, o_orderstatus,
               CAST(ntile(4) OVER (PARTITION BY o_orderstatus
                    ORDER BY o_totalprice ASC, o_orderkey ASC) AS INTEGER) AS quartile
        FROM orders
    """

# ---- tpch q3 / grouped map / regexp / json struct / arrays ----
ORACLES["tpch_q3_shipping_priority"] = r"""
        SELECT l_orderkey, o_orderdate, o_orderpriority,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01'
          AND l_shipdate > TIMESTAMP '1996-01-01'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey ASC
        LIMIT 10
    """
ORACLES["grouped_zscore"] = r"""
        SELECT c_nationkey, c_custkey,
               round(CASE WHEN sd IS NULL OR sd = 0 THEN 0.0
                          ELSE (c_acctbal - mu) / sd END, 4) AS z
        FROM (
            SELECT c_nationkey, c_custkey, c_acctbal,
                   avg(c_acctbal) OVER (PARTITION BY c_nationkey) AS mu,
                   stddev_samp(c_acctbal) OVER (PARTITION BY c_nationkey) AS sd
            FROM customer) t
    """
ORACLES["fn_regexp"] = r"""
        SELECT p_partkey,
               regexp_extract(p_type, '^(\w+)', 1) AS type_head,
               regexp_extract(p_name, '(\d+)', 1) AS first_digits,
               regexp_matches(p_name, 'part') AS has_part
        FROM part
    """
ORACLES["fn_json_struct"] = r"""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
               (CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 = 0) AS k_is_round
        FROM events
    """
ORACLES["fn_array_ops"] = r"""
        SELECT vec_id,
               CAST(len(embedding) AS INTEGER) AS dim,
               round(CAST(embedding[1] AS DOUBLE), 5) AS first_val,
               round(CAST(embedding[-1] AS DOUBLE), 5) AS last_val,
               round(CAST(list_max(embedding) AS DOUBLE), 5) AS max_val,
               round(CAST(list_min(embedding) AS DOUBLE), 5) AS min_val
        FROM embeddings
    """

# ---- tpch q4/q10/q14 ----
ORACLES["tpch_q4_order_priority"] = r"""
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate >= TIMESTAMP '1996-06-01')
        GROUP BY o_orderpriority
    """
ORACLES["tpch_q10_returned_items"] = r"""
        SELECT c_custkey, c_name, n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey ASC
        LIMIT 20
    """
ORACLES["tpch_q14_promo_effect"] = r"""
        SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                      THEN l_extendedprice * (1 - l_discount)
                                      ELSE 0.0 END)
                     / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1997-07-01'
    """

ORACLES["window_range_frame"] = r"""
        SELECT o_custkey, o_orderkey,
               count(*) OVER w AS n_near,
               round(sum(o_totalprice) OVER w, 2) AS sum_near
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice ASC
                     RANGE BETWEEN 10000 PRECEDING AND 10000 FOLLOWING)
"""

ORACLES["source_csv_roundtrip"] = r"""
        SELECT n_regionkey, count(*) AS n_nations, min(n_name) AS first_name
        FROM nation GROUP BY n_regionkey
"""
ORACLES["sink_partitioned_roundtrip"] = r"""
        SELECT l_returnflag, count(*) AS n_rows,
               round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem WHERE l_returnflag = 'R'
        GROUP BY l_returnflag
"""

ORACLES["dedup_embedding"] = r"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             s AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                          round(list_dot_product(a.v, b.v)
                                / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))),
                                6) AS cos
                   FROM e a JOIN e b ON a.vec_id < b.vec_id)
        SELECT id_a, id_b, cos FROM s WHERE cos >= 0.45
"""
ORACLES["time_rollup"] = r"""
        WITH ev AS (
            SELECT user_id, event_id,
                   CAST(floor(epoch(ts)) AS BIGINT) AS sec,
                   value
            FROM events),
        m AS (
            SELECT *, CASE WHEN lag(sec) OVER w IS NULL
                            OR sec - lag(sec) OVER w > 1800
                       THEN 1 ELSE 0 END AS ns
            FROM ev
            WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)
        ), r AS (
            SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY sec, event_id
                                    ROWS UNBOUNDED PRECEDING) AS sn
            FROM m
        ), s AS (
            SELECT sec - sec % 3600 AS hour_bucket,
                   sec - sec % 86400 AS day_bucket,
                   value,
                   CAST(user_id AS VARCHAR) || ':' ||
                   CAST(min(sec) OVER (PARTITION BY user_id, sn) AS VARCHAR)
                     AS session_key
            FROM r
        )
        SELECT hour_bucket, day_bucket,
               count(*) AS n,
               round(sum(value), 2) AS sum_value,
               count(DISTINCT session_key) AS n_sessions
        FROM s
        GROUP BY GROUPING SETS ((hour_bucket), (day_bucket))
"""

ORACLES["window_first_last"] = r"""
        SELECT o_custkey, o_orderkey,
               first_value(o_orderkey) OVER w AS first_order,
               last_value(o_orderkey) OVER w AS last_order,
               nth_value(o_orderkey, 2) OVER w AS second_order
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate ASC, o_orderkey ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""
ORACLES["set_intersect_all"] = r"""
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT ALL
        SELECT s_nationkey AS nationkey FROM supplier
"""
ORACLES["fn_conditional_null"] = r"""
        SELECT o_orderkey,
               coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_norm,
               greatest(o_totalprice, 100000.0) AS price_floor100k,
               least(o_totalprice, 300000.0) AS price_cap300k,
               (nullif(o_orderpriority, o_orderpriority) IS NULL) AS always_true
        FROM orders
"""
ORACLES["fn_bitwise"] = r"""
        SELECT l_orderkey, l_linenumber,
               l_orderkey & 255 AS and255,
               l_orderkey | 1 AS or1,
               xor(l_orderkey, l_partkey) AS xor_part,
               CAST(l_linenumber << 3 AS INTEGER) AS shl3,
               l_orderkey >> 2 AS shr2
        FROM lineitem
"""

ORACLES["fn_map_ops"] = r"""
        SELECT l_orderkey, l_linenumber,
               l_quantity AS qty_from_map,
               l_tax AS tax_from_map,
               3 AS map_size
        FROM lineitem
"""
ORACLES["fn_higher_order"] = r"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        SELECT vec_id,
               round(v[1] * 2.0, 5) AS first_doubled,
               CAST(len(list_filter(v, x -> x > 0)) AS INTEGER) AS n_positive,
               round(list_sum(v), 5) AS sum_elems
        FROM e
"""

ORACLES["join_cross"] = r"""
        SELECT r_regionkey, r_name, n_nationkey, n_name
        FROM region CROSS JOIN nation
"""
ORACLES["sort_limit_offset"] = r"""
        SELECT o_orderkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 10 OFFSET 10
"""
ORACLES["argmax_latest_event"] = r"""
        SELECT user_id, event_id,
               CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch,
               event_type
        FROM (
            SELECT *, row_number() OVER (PARTITION BY user_id
                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events) t
        WHERE rn = 1
"""

ORACLES["dedup_exact_rows"] = r"""
        SELECT doc_id, lang, source, n_chars
        FROM documents
        WHERE doc_id IN (
            SELECT min(doc_id)
            FROM documents
            GROUP BY md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')))
"""

ORACLES["fragment_transparent_join"] = r"""
        SELECT c_name, c_mktsegment, o_orderkey, o_totalprice
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE o_totalprice > 150000
"""

ORACLES["tpch_q12_priority_class"] = r"""
        SELECT l_linestatus,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY l_linestatus
        ORDER BY l_linestatus
    """

ORACLES["tpch_q19_disjunctive_revenue"] = r"""
        SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               count(*) AS n_lines
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11 AND p_size <= 5)
           OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20 AND p_size <= 10)
           OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 30 AND p_size <= 15)
    """

ORACLES["tpch_q16_supplier_variety"] = r"""
        SELECT p_brand, p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_size IN (1, 4, 9, 16, 25)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_size
    """

ORACLES["fn_string_distance"] = r"""
        SELECT p_partkey,
               levenshtein(lower(p_name), lower(p_type)) AS name_type_dist,
               levenshtein('standard', lower(p_type)) AS std_dist
        FROM part
    """

ORACLES["text_tokens_regex"] = r"""
        WITH t AS (
            SELECT doc_id,
                   len(regexp_extract_all(lower(text),
                       '''(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9\s]')) AS n_bpe,
                   len(string_split_regex(trim(lower(text)), '\s+')) AS n_ws
            FROM documents)
        SELECT doc_id,
               CAST(n_bpe AS INTEGER) AS n_bpe_tokens,
               CAST(n_ws AS INTEGER) AS n_ws_tokens,
               round(CAST(n_bpe AS DOUBLE) / greatest(n_ws, 1), 4) AS fertility
        FROM t
    """

ORACLES["stream_interval_join"] = r"""
        WITH c AS (SELECT user_id, event_id AS click_id, ts FROM events WHERE event_type = 'click'),
             p AS (SELECT user_id, event_id AS purchase_id, ts, value FROM events WHERE event_type = 'purchase')
        SELECT c.user_id,
               c.click_id,
               p.purchase_id,
               CAST(floor(epoch(CAST(c.ts AS TIMESTAMP))) AS BIGINT) AS click_epoch,
               CAST(floor(epoch(CAST(p.ts AS TIMESTAMP))) AS BIGINT) AS purchase_epoch,
               round(p.value, 2) AS purchase_value
        FROM c JOIN p ON c.user_id = p.user_id
                     AND p.ts >= c.ts
                     AND p.ts <= c.ts + INTERVAL 1 HOUR
    """

ORACLES["window_percentiles_rank"] = r"""
        SELECT o_orderkey, o_orderpriority,
               round(percent_rank() OVER w, 6) AS pct_rank,
               round(cume_dist() OVER w, 6) AS cume
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    """

ORACLES["agg_string_collect"] = r"""
        SELECT r_name,
               string_agg(n_name, ',' ORDER BY n_name) AS nations,
               count(*) AS n_nations
        FROM nation JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """

ORACLES["agg_mode"] = r"""
        WITH c AS (
            SELECT l_returnflag, l_quantity, count(*) AS cnt
            FROM lineitem GROUP BY 1, 2),
        r AS (
            SELECT *, row_number() OVER (PARTITION BY l_returnflag
                                         ORDER BY cnt DESC, l_quantity) AS rn
            FROM c)
        SELECT l_returnflag, l_quantity AS mode_qty, cnt AS mode_n
        FROM r WHERE rn = 1
    """

ORACLES["pipeline_clean_corpus"] = r"""
        WITH t AS (
            SELECT doc_id, text,
                   string_split_regex(trim(lower(text)), '\s+') AS toks
            FROM documents),
        s AS (
            SELECT doc_id,
                   CAST(len(toks) AS INTEGER) AS n_tokens,
                   round((least(len(toks) / 50.0, 1.0)
                          + least(5.0 * CAST(len(list_filter(toks, x -> list_contains(['the','a','an','and','or','of','to','in','is','are','was','on','for','with','as','at','by','from','it','this'], x))) AS DOUBLE) / len(toks), 1.0)
                          + CASE WHEN CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks) BETWEEN 3.0 AND 10.0
                                 THEN 1.0 ELSE 0.3 END) / 3.0, 4) AS quality,
                   CASE WHEN CAST(len(list_filter(toks, x -> list_contains(['the','a','an','and','or','of','to','in','is','are','was','on','for','with','as','at','by','from','it','this'], x))) AS DOUBLE) / len(toks) >= 0.08
                        THEN 'en' ELSE 'other' END AS lang_pred,
                   md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp
            FROM t)
        SELECT doc_id, n_tokens, quality, fp
        FROM s
        WHERE quality >= 0.5 AND lang_pred = 'en'
        QUALIFY row_number() OVER (PARTITION BY fp ORDER BY doc_id) = 1
    """

ORACLES["fn_datetime_extract"] = r"""
        SELECT o_orderkey,
               CAST(quarter(o_orderdate) AS INTEGER) AS q,
               CAST(weekofyear(o_orderdate) AS INTEGER) AS iso_week,
               CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow_sun1,
               CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
               CAST(last_day(o_orderdate) AS DATE) AS month_end,
               CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3m
        FROM orders
    """

ORACLES["sql_recursive_cte"] = r"""
        WITH RECURSIVE months(m) AS (
            SELECT CAST('1997-01-01' AS DATE)
            UNION ALL
            SELECT m + INTERVAL 1 MONTH FROM months WHERE m < CAST('1997-12-01' AS DATE)
        )
        SELECT CAST(m AS DATE) AS month_start,
               count(o_orderkey) AS n_orders,
               round(coalesce(sum(o_totalprice), 0.0), 2) AS revenue
        FROM months LEFT JOIN orders
          ON CAST(date_trunc('month', o_orderdate) AS DATE) = m
        GROUP BY m
        ORDER BY m
    """

ORACLES["fn_variant"] = r"""
        SELECT event_type,
               count(*) AS n,
               CAST(max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER) AS max_k,
               CAST(sum(CASE WHEN json_extract_string(props, '$.k') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_k
        FROM events GROUP BY event_type
    """

ORACLES["sql_lateral_topk"] = r"""
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM orders
                 WHERE o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) t
    """

ORACLES["agg_conditional"] = r"""
        SELECT l_linestatus,
               count(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
               bool_and(l_quantity > 0) AS all_positive_qty,
               bool_or(l_returnflag = 'R') AS any_returned,
               count(*) AS n
        FROM lineitem GROUP BY l_linestatus
    """

ORACLES["join_null_safe"] = r"""
        WITH a AS (SELECT event_id AS a_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
                   FROM events WHERE event_type = 'click'),
             b AS (SELECT event_id AS b_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
                   FROM events WHERE event_type = 'error')
        SELECT a.a_id, b.b_id, a.k
        FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    """

ORACLES["text_chunking"] = r"""
        WITH n AS (SELECT doc_id, text,
                CASE WHEN length(text) <= 200 THEN 1
                     ELSE CAST(ceil((length(text) - 200) / 150.0) AS BIGINT) + 1 END AS nc
              FROM documents),
        e AS (SELECT doc_id, text, unnest(generate_series(0, nc - 1)) AS ci FROM n)
        SELECT doc_id, CAST(ci AS BIGINT) AS chunk_idx,
               substring(text, CAST(ci*150 + 1 AS INT), 200) AS chunk,
               CAST(length(substring(text, CAST(ci*150 + 1 AS INT), 200)) AS BIGINT) AS chunk_chars
        FROM e
    """

ORACLES["pack_sequences"] = r"""
        WITH t AS (SELECT doc_id,
                CASE WHEN length(trim(text)) = 0 THEN 0
                     ELSE len(string_split_regex(trim(lower(text)), '\s+')) END AS nt
              FROM documents),
        o AS (SELECT doc_id, nt,
                CAST(COALESCE(SUM(nt) OVER (ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
              FROM t)
        SELECT doc_id,
               CAST(nt AS BIGINT) AS n_tokens,
               off AS tok_offset,
               CAST(floor(off / 512.0) AS BIGINT) AS seq_first,
               CAST(floor((off + greatest(nt, 1) - 1) / 512.0) AS BIGINT) AS seq_last,
               CAST(floor((off + greatest(nt, 1) - 1) / 512.0)
                    - floor(off / 512.0) + 1 AS BIGINT) AS n_seqs
        FROM o
    """

ORACLES["sink_zonemap_roundtrip"] = r"""
        SELECT o_orderstatus,
               count(*) AS n_rows,
               round(sum(o_totalprice), 2) AS sum_price
        FROM orders
        WHERE o_totalprice BETWEEN 50000.0 AND 150000.0
        GROUP BY o_orderstatus
"""
