"""Generated DuckDB oracle for the fused multi-index ANN suite.

`multi_ann_topk` is deterministic end-to-end: hyperplanes come from a
seeded splitmix hash, the IVF quantizer trains on the (file-ordered)
query matrix with unrolled spherical k-means, and all scoring is exact
cosine rounded to 6 decimals with (cos DESC, neighbor_id ASC) tie
order. Every one of those steps is expressible in DuckDB SQL:

- the plane matrix is embedded as literals generated from the SAME
  `_hyperplane` constants the Spark side uses;
- signed-projection buckets are SUM((dot >= 0) << plane) per table;
- Hamming-1 multi-probe is xor(bucket, 1 << j);
- k-means is unrolled to `n_iter` CTE stages — argmax assignment
  (ORDER BY sim DESC, cell — numpy argmax first-index semantics),
  element-wise member means via an index explode, and the
  empty-cell reseed (the sample whose best similarity is worst,
  ties to the lowest sample position — numpy argmin semantics);
- candidates, exact cosine, and the per-(method, query) top-k mirror
  the brute-force oracle's conventions.

Float caveat (accepted across this repo's oracles): summation order
differs between numpy matmuls and DuckDB's list_dot_product in the
last ulps, so sign/argmax decisions could in principle flip on exact
ties — continuous random embeddings make that measure-zero, and the
6-decimal rounding removes it from the scored output.
"""

from __future__ import annotations

NORM = "list_transform({v}, x -> x / greatest(sqrt(list_dot_product({v}, {v})), 1e-12))"


def _plane_values(dim: int, n_planes: int, n_tables: int, seed: int) -> str:
    from distributedqueryengine_spark.functions.similarity import _hyperplane

    rows = []
    for t in range(n_tables):
        for p in range(n_planes):
            vec = _hyperplane(seed + t, p, dim)
            lit = "[" + ", ".join(repr(x) for x in vec) + "]"
            rows.append(f"({t}, {p}, CAST({lit} AS DOUBLE[]))")
    return ",\n               ".join(rows)


def kmeans_ctes(
    dim: int, n_cells: int, n_iter: int, sample_cte: str = "samp"
) -> list[str]:
    """Unrolled spherical k-means as DuckDB CTEs, ending in `centf`
    (cell, normalized centroid vector).

    `sample_cte` must provide (vec_id, v [normalized DOUBLE[]],
    rn [1-based row_number over a deterministic order]). The semantics
    mirror `similarity._train_centroids_kmeans`'s ≤64-cell branch
    statement by statement: init = first n_cells sample rows, argmax
    assignment with first-index tie order (ORDER BY sim DESC, cell),
    element-wise member means, empty-cell reseed from the sample whose
    best similarity is worst (numpy argmin first-index ties → lowest
    rn). Shared by the fused-ANN oracle and the semantic-dedup oracle."""
    s = sample_cte
    ctes = [
        f"cent0 AS MATERIALIZED (SELECT rn - 1 AS cell, v FROM {s} WHERE rn <= {n_cells})",
    ]
    prev = "cent0"
    for it in range(1, n_iter + 1):
        ctes += [
            f"""sims{it} AS MATERIALIZED (SELECT s.vec_id, s.rn, s.v AS sv, cc.cell,
                    list_dot_product(s.v, {NORM.format(v='cc.v')}) AS sim
             FROM {s} s, {prev} cc)""",
            f"""assign{it} AS MATERIALIZED (SELECT vec_id, rn, sv, cell FROM sims{it}
             QUALIFY row_number() OVER (PARTITION BY vec_id
                     ORDER BY sim DESC, cell) = 1)""",
            f"""worst{it} AS MATERIALIZED (SELECT s.sv AS v FROM assign{it} s
             JOIN (SELECT vec_id, max(sim) AS ms FROM sims{it} GROUP BY vec_id) m
               USING (vec_id)
             ORDER BY m.ms ASC, s.rn ASC LIMIT 1)""",
            f"""newc{it} AS MATERIALIZED (SELECT cell, list(x ORDER BY i) AS v FROM (
                 SELECT a.cell, ix.i, avg(a.sv[ix.i]) AS x
                 FROM assign{it} a, (SELECT unnest(range(1, {dim + 1})) AS i) ix
                 GROUP BY a.cell, ix.i) GROUP BY cell)""",
            f"""cent{it} AS MATERIALIZED (SELECT cells.cell,
                    COALESCE(n.v, (SELECT v FROM worst{it})) AS v
             FROM (SELECT unnest(range(0, {n_cells})) AS cell) cells
             LEFT JOIN newc{it} n USING (cell))""",
        ]
        prev = f"cent{it}"
    ctes.append(
        f"centf AS MATERIALIZED (SELECT cell, {NORM.format(v='v')} AS v FROM {prev})"
    )
    return ctes


def sim_ann_oracle_sql(
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 8,
    seed: int = 42,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 6,
    n_iter: int = 8,
) -> str:
    nv = NORM.format(v="v")
    ctes = [
        "q AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id % 10 = 0)",
        "c AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)",
        f"qn AS MATERIALIZED (SELECT vec_id, {nv} AS v FROM q)",
        f"cn AS MATERIALIZED (SELECT vec_id, {nv} AS v FROM c)",
        "planes(tbl, pl, vec) AS (VALUES "
        + _plane_values(dim, n_planes, n_tables, seed)
        + ")",
        # ---- LSH: home buckets (sign is normalization-invariant) ----
        """cbuck AS MATERIALIZED (SELECT c.vec_id, p.tbl,
                 CAST(sum(CASE WHEN list_dot_product(c.v, p.vec) >= 0
                               THEN 1 << p.pl ELSE 0 END) AS BIGINT) AS bkt
          FROM c, planes p GROUP BY c.vec_id, p.tbl)""",
        """qhome AS MATERIALIZED (SELECT q.vec_id, p.tbl,
                 CAST(sum(CASE WHEN list_dot_product(q.v, p.vec) >= 0
                               THEN 1 << p.pl ELSE 0 END) AS BIGINT) AS bkt
          FROM q, planes p GROUP BY q.vec_id, p.tbl)""",
        f"""qprobe AS MATERIALIZED (SELECT vec_id, tbl, bkt FROM qhome
            UNION ALL
            SELECT vec_id, tbl, xor(bkt, CAST(1 << j AS BIGINT))
            FROM qhome, (SELECT unnest(range(0, {n_planes})) AS j))""",
        """lsh_cand AS MATERIALIZED (SELECT DISTINCT qp.vec_id AS query_id, cb.vec_id AS neighbor_id
            FROM qprobe qp JOIN cbuck cb ON qp.tbl = cb.tbl AND qp.bkt = cb.bkt
            WHERE qp.vec_id <> cb.vec_id)""",
        """lsh_top AS MATERIALIZED (SELECT query_id, neighbor_id, cos,
                   CAST(row_number() OVER (PARTITION BY query_id
                        ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rnk
            FROM (SELECT l.query_id, l.neighbor_id,
                         round(list_dot_product(a.v, b.v), 6) AS cos
                  FROM lsh_cand l
                  JOIN qn a ON a.vec_id = l.query_id
                  JOIN cn b ON b.vec_id = l.neighbor_id) s
            QUALIFY rnk <= %d)""" % k,
        # ---- IVF: query-trained spherical k-means, unrolled ----
        "samp AS MATERIALIZED (SELECT vec_id, v, row_number() OVER (ORDER BY vec_id) AS rn FROM qn)",
    ]
    ctes += kmeans_ctes(dim, n_cells, n_iter, sample_cte="samp")
    ctes += [
        f"""qcell AS MATERIALIZED (SELECT vec_id, cell FROM (
                SELECT q.vec_id, cc.cell, list_dot_product(q.v, cc.v) AS sim
                FROM qn q, centf cc) s
            QUALIFY row_number() OVER (PARTITION BY vec_id
                    ORDER BY sim DESC, cell) <= {n_probe})""",
        """ccell AS MATERIALIZED (SELECT vec_id, cell FROM (
                SELECT n.vec_id, cc.cell, list_dot_product(n.v, cc.v) AS sim
                FROM cn n, centf cc) s
            QUALIFY row_number() OVER (PARTITION BY vec_id
                    ORDER BY sim DESC, cell) = 1)""",
        """ivf_cand AS MATERIALIZED (SELECT DISTINCT qp.vec_id AS query_id, cc.vec_id AS neighbor_id
            FROM qcell qp JOIN ccell cc USING (cell)
            WHERE qp.vec_id <> cc.vec_id)""",
        """ivf_top AS MATERIALIZED (SELECT query_id, neighbor_id, cos,
                   CAST(row_number() OVER (PARTITION BY query_id
                        ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rnk
            FROM (SELECT l.query_id, l.neighbor_id,
                         round(list_dot_product(a.v, b.v), 6) AS cos
                  FROM ivf_cand l
                  JOIN qn a ON a.vec_id = l.query_id
                  JOIN cn b ON b.vec_id = l.neighbor_id) s
            QUALIFY rnk <= %d)""" % k,
    ]
    final = """
SELECT 'lsh' AS variant, CAST(query_id AS BIGINT) AS query_id,
       CAST(neighbor_id AS BIGINT) AS neighbor_id,
       CAST(cos AS DOUBLE) AS cos, CAST(rnk AS INTEGER) AS rnk
FROM lsh_top
UNION ALL
SELECT 'ivf' AS variant, CAST(query_id AS BIGINT) AS query_id,
       CAST(neighbor_id AS BIGINT) AS neighbor_id,
       CAST(cos AS DOUBLE) AS cos, CAST(rnk AS INTEGER) AS rnk
FROM ivf_top"""
    return "WITH\n" + ",\n".join(ctes) + final


def semdedup_oracle_sql(
    dim: int = 64,
    n_cells: int = 8,
    n_iter: int = 4,
    n_sample: int = 256,
    threshold: float = 0.5,
) -> str:
    """DuckDB oracle for `semdedup.semantic_dedup` over the embeddings
    table: the SAME deterministic pipeline as the Spark side — sample =
    first `n_sample` vectors by vec_id, unrolled spherical k-means
    (shared `kmeans_ctes`), nearest-cell assignment (argmax, lowest
    cell on ties), and the min-id keep rule: a vector is dropped iff
    some LOWER-id vector in its cell has round(cos, 6) >= threshold.

    Emits (vec_id, cell, kept) for every corpus vector, so the driver
    hash-checks both the cluster assignment and every keep/drop
    decision."""
    nv = NORM.format(v="CAST(embedding AS DOUBLE[])")
    ctes = [
        f"cn AS MATERIALIZED (SELECT vec_id, {nv} AS v FROM embeddings)",
        f"""samp AS MATERIALIZED (SELECT * FROM (
             SELECT vec_id, v, row_number() OVER (ORDER BY vec_id) AS rn
             FROM cn) WHERE rn <= {n_sample})""",
    ]
    ctes += kmeans_ctes(dim, n_cells, n_iter, sample_cte="samp")
    ctes += [
        """acell AS MATERIALIZED (SELECT vec_id, cell, v FROM (
             SELECT c.vec_id, cc.cell, c.v,
                    list_dot_product(c.v, cc.v) AS sim
             FROM cn c, centf cc) s
           QUALIFY row_number() OVER (PARTITION BY vec_id
                   ORDER BY sim DESC, cell) = 1)""",
        f"""dropped AS MATERIALIZED (SELECT DISTINCT b.vec_id
             FROM acell a JOIN acell b
               ON a.cell = b.cell AND a.vec_id < b.vec_id
             WHERE round(list_dot_product(a.v, b.v), 6) >= {threshold})""",
    ]
    final = """
SELECT CAST(a.vec_id AS BIGINT) AS vec_id,
       CAST(a.cell AS INTEGER) AS cell,
       CAST(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS INTEGER) AS kept
FROM acell a LEFT JOIN dropped d ON a.vec_id = d.vec_id"""
    return "WITH\n" + ",\n".join(ctes) + final
