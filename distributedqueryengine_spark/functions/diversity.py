"""Diversity-aware selection (MMR re-ranking).

Maximal Marginal Relevance (Carbonell & Goldstein, SIGIR'98): greedily
pick the item maximizing ``lam * relevance - (1 - lam) * max cosine to
anything already picked``. The standard diversification pass over a
retrieval candidate list, and — run per cluster cell over a corpus —
the standard "keep a diverse high-quality subset" primitive for
training-data curation. The reference engine has no retrieval surface
at all (its algebra is scan/sel/proj/join/union, RPC.cs:248-375); this
is part of the LLM-pipeline extension surface.

Semantics
---------
Greedy and deterministic: the first pick is the max-relevance item;
each later pick maximizes the MMR score over the remainder; every
argmax tie-breaks by (score desc, id asc). Cosine is computed on the
raw vectors (normalized internally), all math in float64. Selection is
inherently sequential within a group, so this operator is NOT
SQL-expressible as one declarative query — it is pinned against a pure
python reference implementation in tests/test_diversity.py instead of
a DuckDB oracle.

Scale shape (100 TB story)
--------------------------
MMR over n candidates costs O(k * n * d) after one O(n * d) normalize —
fine for per-query candidate lists (n = overfetched top-k', hundreds)
and per-cell corpus shards, ruinous over a raw corpus. So the operator
is GROUPED: `by` (query id, cluster cell, ...) hash-partitions groups
across executors and each group runs in one Arrow batch via
applyInPandas; an in-batch `max_group_rows` guard raises before a
pathological group melts an executor. The ungrouped path exists for
bounded candidate sets only: a driver count guard (same discipline as
operators/skyline.py) refuses more than `max_group_rows` rows rather
than silently funneling a corpus through one task. Compose with
`similarity.brute_force_topk` / `probe_*_index` (per-query candidates)
or `semdedup.assign_cells`-style clustering (per-cell curation) so the
quadratic stays inside small groups.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _mmr_pick_pdf(
    pdf: pd.DataFrame,
    k: int,
    lam: float,
    id_col: str,
    vec_col: str,
    rel_col: str,
    out_cols: list[str],
    max_group_rows: int,
) -> pd.DataFrame:
    n = len(pdf)
    if n == 0:
        out = pdf[out_cols].copy()
        out["relevance"] = pd.Series(dtype="float64")
        out["mmr_score"] = pd.Series(dtype="float64")
        out["rnk"] = pd.Series(dtype="int32")
        return out
    if n > max_group_rows:
        raise ValueError(
            f"mmr_select: group has {n} rows > max_group_rows={max_group_rows}; "
            "MMR is O(k*n*d) per group — shard with by= (query id / cluster "
            "cell) or prune candidates first"
        )
    if pdf[rel_col].isna().any() or pdf[id_col].isna().any():
        raise ValueError(f"mmr_select: NULL in {rel_col!r}/{id_col!r}")
    try:
        vecs = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
    except ValueError as e:
        raise ValueError(
            f"mmr_select: ragged or NULL {vec_col!r} vectors in group"
        ) from e
    norms = np.linalg.norm(vecs, axis=1)
    if (norms == 0).any():
        raise ValueError(f"mmr_select: zero-norm {vec_col!r} vector in group")
    unit = vecs / norms[:, None]

    rel = pdf[rel_col].to_numpy(dtype=np.float64)
    ids = pdf[id_col].to_numpy()
    # (score desc, id asc) argmax via lexicographic key, NaN-free by guard.
    order_key = np.lexsort((ids, -rel))
    first = order_key[0]
    picked = [first]
    max_sim = unit @ unit[first]
    remaining = np.ones(n, dtype=bool)
    remaining[first] = False
    scores = [lam * rel[first]]
    while len(picked) < min(k, n):
        mmr = lam * rel - (1.0 - lam) * max_sim
        mmr_masked = np.where(remaining, mmr, -np.inf)
        best_score = mmr_masked.max()
        cand = np.flatnonzero(mmr_masked == best_score)
        nxt = cand[np.argmin(ids[cand])] if len(cand) > 1 else int(cand[0])
        picked.append(int(nxt))
        scores.append(float(best_score))
        remaining[nxt] = False
        max_sim = np.maximum(max_sim, unit @ unit[nxt])

    out = pdf.iloc[picked][out_cols].reset_index(drop=True)
    out["relevance"] = rel[picked]
    out["mmr_score"] = np.asarray(scores, dtype=np.float64)
    out["rnk"] = np.arange(1, len(picked) + 1, dtype=np.int32)
    return out


def mmr_select(
    candidates: DataFrame,
    k: int,
    lam: float = 0.5,
    by: str | Sequence[str] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rel_col: str = "cos",
    max_group_rows: int = 100_000,
) -> DataFrame:
    """Greedy MMR top-`k` per group of `candidates`.

    candidates: rows with an id, an embedding array, and a relevance
        score (typically the cosine from a prior retrieval pass).
    lam: relevance/diversity trade-off in [0, 1] — 1.0 is pure
        relevance (plain top-k), 0.0 pure diversity after the seed.
    by: group column(s) — query id for retrieval re-ranking, cluster
        cell for corpus curation. None = one global selection over a
        BOUNDED candidate set (driver count guard).
    Output: by-cols + id_col + relevance + mmr_score (lam*rel for
        rnk 1, the greedy objective after) + rnk (1..k).
    """
    if k < 1:
        raise ValueError(f"mmr_select: k must be >= 1, got {k}")
    if not (0.0 <= lam <= 1.0):
        raise ValueError(f"mmr_select: lam must be in [0, 1], got {lam}")
    by_cols = [by] if isinstance(by, str) else list(by or [])
    out_cols = by_cols + [id_col]

    in_fields = {f.name: f for f in candidates.schema.fields}
    for c in out_cols + [vec_col, rel_col]:
        if c not in in_fields:
            raise ValueError(f"mmr_select: column {c!r} not in candidates")
    schema = T.StructType(
        [in_fields[c] for c in out_cols]
        + [
            T.StructField("relevance", T.DoubleType()),
            T.StructField("mmr_score", T.DoubleType()),
            T.StructField("rnk", T.IntegerType()),
        ]
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        return _mmr_pick_pdf(
            pdf, k, lam, id_col, vec_col, rel_col, out_cols, max_group_rows
        )

    slim = candidates.select(*out_cols, vec_col, rel_col)
    if by_cols:
        return slim.groupBy(*by_cols).applyInPandas(run, schema=schema)

    # Ungrouped: one sequential greedy pass is unavoidable — refuse
    # unbounded inputs instead of hiding a corpus in one task.
    n = slim.count()
    if n > max_group_rows:
        raise ValueError(
            f"mmr_select: ungrouped input has {n} rows > "
            f"max_group_rows={max_group_rows}; prune candidates or pass by="
        )
    return (
        slim.coalesce(1)
        .mapInPandas(lambda it: (run(pd.concat(list(it) or [
            pd.DataFrame(columns=out_cols + [vec_col, rel_col])])),), schema=schema)
    )
