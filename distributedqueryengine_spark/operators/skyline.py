"""Skyline (Pareto-frontier) selection.

The data-selection primitive behind "keep the documents that are not
strictly worse than some other document on every axis" — e.g. maximize
information density while minimizing length/toxicity. The reference
engine has no skyline operator (its algebra is scan/sel/proj/join/union,
RPC.cs:248-375); this is part of the training-data-pipeline extension
surface, implemented Spark-first.

Semantics
---------
Row B *dominates* row A iff B >= A on every `maximize` column, B <= A
on every `minimize` column, and B is strictly better on at least one.
``skyline`` returns exactly the input rows (all columns preserved) that
no other row dominates. Identical points do not dominate each other, so
exact ties on every criterion are all kept — the result is deterministic
with no hidden tie-break. With ``by=[...]`` dominance is evaluated only
between rows sharing the group key (group-wise frontier).

Scale shape (100 TB story)
--------------------------
Classic two-phase distributed skyline:

1. **Local prune** (mapInPandas, zero shuffle): each partition computes
   its own skyline. A locally dominated point is globally dominated
   (strict dominance is a strict partial order, so every dominated point
   has an *un*dominated dominator in the same partition — transitivity),
   hence the local pass is a sound filter. Random-data skyline size is
   O(log^(d-1) n), so survivors are typically tiny.
2. **Global pass**: grouped skylines repartition by the group key and
   re-run the local pass — exact in one extra shuffle of survivors only.
   Ungrouped skylines coalesce survivors to one partition for the final
   scan, guarded by ``global_limit``: if more than that many rows
   survive phase 1 the operator raises instead of silently funneling an
   anti-correlated frontier through one task.

The per-partition scan sorts by the criterion sum (strict dominance
implies a strictly greater sum, so dominators always precede dominated
rows) and compares each candidate only against already-kept frontier
points — O(n·s) with s = local skyline size.

NULL/NaN policy: criteria columns must be non-NULL and non-NaN;
``on_null='raise'`` (default) fails lazily inside the local pass with
the offending partition's count (query construction stays job-free),
``on_null='drop'`` excludes those rows from both sides of the
comparison (they can neither win nor dominate).
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _local_skyline_pdf(
    pdf: pd.DataFrame, maximize: Sequence[str], minimize: Sequence[str]
) -> pd.DataFrame:
    """Exact skyline of one in-memory block; returns the surviving rows."""
    if len(pdf) == 0:
        return pdf
    parts = [pdf[c].to_numpy(dtype=np.float64) for c in maximize]
    parts += [-pdf[c].to_numpy(dtype=np.float64) for c in minimize]
    vals = np.column_stack(parts)
    if np.isnan(vals).any():
        # NULL criterion values arrive as NaN through Arrow; the check
        # runs HERE (distributed, lazily) so merely constructing the
        # query stays job-free — no driver-side pre-count.
        n_bad = int(np.isnan(vals).any(axis=1).sum())
        raise ValueError(
            f"skyline: {n_bad} rows with NULL/NaN in criterion columns "
            f"{list(maximize) + list(minimize)} in one partition; pass "
            "on_null='drop' to exclude those rows"
        )
    # Dominators have strictly greater coordinate sums; a stable
    # descending-sum order lets one forward scan see every potential
    # dominator before its victims. Equal-sum rows cannot dominate
    # each other (strict dominance => strictly greater sum).
    order = np.argsort(-vals.sum(axis=1), kind="stable")
    vals = vals[order]
    n, d = vals.shape
    kept_rows: list[int] = []
    kept_list: list[np.ndarray] = []
    # Chunked scan: each block is screened against the accumulated
    # frontier in ONE vectorized broadcast (block × frontier × d), so
    # the python loop only touches block rows that survive it — on
    # random data that's ~the frontier size, not n. Worst case
    # (anti-correlated, everything survives) degrades to the O(n·s)
    # loop, which the ungrouped global_limit guard already bounds.
    # The comparison frontier stores UNIQUE points only: exact ties are
    # kept in the OUTPUT but add nothing to dominance comparisons, so a
    # heavily duplicated input can't quadratically inflate the scan.
    block = 1024
    for start in range(0, n, block):
        chunk = vals[start : start + block]
        if kept_list:
            frontier = np.asarray(kept_list)
            ge = (frontier[None, :, :] >= chunk[:, None, :]).all(axis=2)
            gt = (frontier[None, :, :] > chunk[:, None, :]).any(axis=2)
            dominated = np.any(ge & gt, axis=1)
            tied = np.any(ge & ~gt, axis=1)  # equal to a frontier point
        else:
            dominated = np.zeros(len(chunk), dtype=bool)
            tied = dominated
        kept_rows.extend((start + j) for j in np.flatnonzero(tied & ~dominated))
        base = len(kept_list)
        for j in np.flatnonzero(~dominated & ~tied):
            v = chunk[j]
            # Only the frontier points added WITHIN this chunk can still
            # dominate v (sum-descending order ⇒ dominators precede).
            new = kept_list[base:]
            if new:
                nk = np.asarray(new)
                ge1 = (nk >= v).all(axis=1)
                gt1 = (nk > v).any(axis=1)
                if bool(np.any(ge1 & gt1)):
                    continue
                if bool(np.any(ge1 & ~gt1)):  # tie with an in-chunk point
                    kept_rows.append(start + j)
                    continue
            kept_rows.append(start + j)
            kept_list.append(v)
    kept_rows.sort()
    return pdf.iloc[order[kept_rows]]


def skyline(
    df: DataFrame,
    maximize: Sequence[str] = (),
    minimize: Sequence[str] = (),
    by: Sequence[str] = (),
    on_null: str = "raise",
    global_limit: int = 200_000,
) -> DataFrame:
    """Rows of `df` not dominated by any other row (per `by` group).

    maximize/minimize: numeric criterion columns (at least one total).
    by: optional group columns — dominance is evaluated within groups.
    on_null: 'raise' (default) or 'drop' for NULL/NaN criterion values.
    global_limit: ungrouped only — max phase-1 survivors allowed into
        the single-partition final pass; exceeded => ValueError naming
        the count (an anti-correlated frontier that large should be
        reformulated, not hidden in one task).
    """
    maximize, minimize, by = list(maximize), list(minimize), list(by)
    crit = maximize + minimize
    if not crit:
        raise ValueError("skyline: need at least one maximize/minimize column")
    if on_null not in ("raise", "drop"):
        raise ValueError(f"skyline: on_null must be 'raise' or 'drop', got {on_null!r}")

    if on_null == "drop":
        bad = None
        for c in crit:
            isbad = F.col(c).isNull() | F.isnan(F.col(c).cast("double"))
            bad = isbad if bad is None else (bad | isbad)
        clean = df.filter(~bad)
    else:
        # 'raise' is enforced inside the local pass (lazily, per
        # partition) so query construction never launches a job.
        clean = df

    schema = clean.schema

    def local_pass(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            if by:
                out = pdf.groupby(by, dropna=False, sort=False, group_keys=False).apply(
                    lambda g: _local_skyline_pdf(g, maximize, minimize)
                )
                yield out.reset_index(drop=True)
            else:
                yield _local_skyline_pdf(pdf, maximize, minimize)

    survivors = clean.mapInPandas(local_pass, schema=schema)

    if by:
        # Exact: applyInPandas hands each group to the scan as ONE whole
        # pandas frame (mapInPandas would re-chunk a co-located group into
        # Arrow batches and compute per-batch "skylines" — not global once
        # a group's survivors exceed maxRecordsPerBatch). The per-group
        # guard bounds the one-task memory the whole-group contract costs.
        def group_pass(pdf: pd.DataFrame) -> pd.DataFrame:
            if len(pdf) > global_limit:
                key = {c: pdf[c].iloc[0] for c in by}
                raise ValueError(
                    f"skyline: group {key} has {len(pdf)} phase-1 survivors, "
                    f"exceeding global_limit={global_limit}; the per-group "
                    "frontier is too large for an exact single-task pass"
                )
            return _local_skyline_pdf(pdf, maximize, minimize)

        return survivors.groupBy(*by).applyInPandas(group_pass, schema=schema)

    # Ungrouped: bounded single-partition final scan over survivors.
    survivors = survivors.localCheckpoint(eager=True)
    n = survivors.count()
    if n > global_limit:
        raise ValueError(
            f"skyline: {n} phase-1 survivors exceed global_limit={global_limit}; "
            "the frontier is too large for a single final pass — add criteria "
            "correlation, raise the limit, or use by= to shard the frontier"
        )

    def final_pass(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Concatenate the FULL iterator before scanning: mapInPandas
        # chunks even a coalesce(1) partition into Arrow batches, and a
        # per-batch scan would silently keep rows dominated by a point
        # in another batch. Survivor count is already <= global_limit,
        # so the concat is bounded.
        chunks = [pdf for pdf in it if len(pdf)]
        if not chunks:
            return
        whole = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        yield _local_skyline_pdf(whole, maximize, minimize)

    return survivors.coalesce(1).mapInPandas(final_pass, schema=schema)
