"""Exact-substring deduplication (ExactSubstr).

Public method (Lee et al. 2022, "Deduplicating Training Data Makes
Language Models Better"): find substrings that occur more than once
across a training corpus and remove every occurrence but one — unlike
document-level near-dup (MinHash, `functions/dedup.py`), this catches
the boilerplate/licence/quote passages that repeat INSIDE otherwise
unique documents. The paper builds a corpus-wide suffix array over
bytes; that is a driver-shaped construction. The Spark-first
re-expression works at token k-gram granularity:

- every token k-gram position is hashed (the winnowing substrate,
  `dedup.positional_ngram_hashes`) — one explode, whole-stage codegen;
- a k-gram is DUPLICATED when its hash occurs >= min_count times
  corpus-wide (one hash-keyed AGGREGATION with map-side partial
  combine + a join back — never a per-hash window, which would
  co-locate every occurrence of a hot boilerplate gram in one
  partition; the join side gets AQE skew splitting);
- per document, duplicated positions merge into maximal token spans
  (one window partitioned BY DOCUMENT — no cross-doc skew);
- stripping keeps the corpus-FIRST occurrence of each duplicated
  k-gram (min (id, pos) — deterministic, engine-portable) and deletes
  the token ranges the non-canonical occurrences cover.

Granularity caveat (deliberate deviation from the paper's byte-level
suffix array): matches shorter than k tokens are invisible, and a
token adjacent to a duplicated region is removed if every k-gram
covering it is duplicated — span edges are k-gram-rounded. At the
paper's recommended match length (50 BPE tokens ≈ k) this is the same
operating point; the win is that every stage is a scan, a hash
aggregation, or a per-document window — all linear, all shuffle-lean,
nothing driver-sided at 100 TB.

100 TB shape: explode (rows ∝ corpus tokens) → count by hash
(shuffle carries (h) pairs, never text) → per-doc window → interval
merge. The strip's token reconstruction is a per-doc anti range-join
(spans per doc are few) + ordered re-agg; text bytes shuffle at most
twice (explode locality keeps the first pass map-side).

Positions are 1-based token indices over NORMALIZED tokens
(text.normalize_text: lowercase, collapsed whitespace), inclusive on
both ends — chosen so the DuckDB oracle SQL (list indexing is
1-based) mirrors the arithmetic literally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from distributedqueryengine_spark.functions.dedup import (
    positional_ngram_hashes,
)
from distributedqueryengine_spark.functions.text import normalize_text

__all__ = [
    "duplicated_ngram_occurrences",
    "duplicated_spans",
    "strip_duplicated_spans",
]


def duplicated_ngram_occurrences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    min_count: int = 2,
    portable: bool = False,
) -> DataFrame:
    """(id, pos, h, n_occ, is_canonical) for every k-gram occurrence
    whose hash repeats >= min_count times corpus-wide (same-document
    repeats count). pos is the 1-based token index of the gram start;
    is_canonical marks the corpus-first occurrence (min (id, pos)) —
    the one copy ExactSubstr keeps."""
    if min_count < 2:
        raise ValueError(f"min_count must be >= 2, got {min_count}")
    occ = positional_ngram_hashes(
        df, id_col, text_col, k, portable=portable
    ).select("id", (F.col("pos") + 1).alias("pos"), "h")
    # Hash aggregation + join back, NOT a per-hash window: a window
    # partitioned by h must co-locate every occurrence of a hash — a
    # boilerplate gram duplicated millions of times is one straggler
    # partition at 100 TB. The agg gets map-side partial combine, the
    # join gets AQE skew splitting, and min(struct(id,pos)) IS the
    # row_number()==1 canonical (struct ordering is lexicographic).
    dup = (
        occ.groupBy("h")
        .agg(
            F.count(F.lit(1)).alias("n_occ"),
            F.min(F.struct("id", "pos")).alias("first_occ"),
        )
        .filter(F.col("n_occ") >= min_count)
    )
    return occ.join(dup, "h").select(
        "id", "pos", "h", "n_occ",
        (F.struct("id", "pos") == F.col("first_occ")).alias("is_canonical"),
    )


def _merge_spans(occ: DataFrame, k: int) -> DataFrame:
    """Merge gram-start positions into maximal token intervals per
    document: [pos, pos+k-1] intervals that overlap or touch coalesce.
    Classic window segmentation — a new segment starts where pos
    exceeds the running max end of everything before it."""
    prev = (
        Window.partitionBy("id").orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    run = (
        Window.partitionBy("id").orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    prev_end = F.max(F.col("pos") + (k - 1)).over(prev)
    new_seg = F.when(
        prev_end.isNull() | (F.col("pos") > prev_end + 1), 1
    ).otherwise(0)
    return (
        occ.select("id", "pos", F.sum(new_seg).over(run).alias("seg"))
        .groupBy("id", "seg")
        .agg(
            F.min("pos").alias("start_tok"),
            (F.max("pos") + (k - 1)).alias("end_tok"),
            F.count(F.lit(1)).alias("n_grams"),
        )
        .select("id", "start_tok", "end_tok", "n_grams")
    )


def duplicated_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    min_count: int = 2,
    portable: bool = False,
    occurrences: DataFrame | None = None,
) -> DataFrame:
    """(id, start_tok, end_tok, n_grams): maximal token spans covered
    by corpus-duplicated k-grams — EVERY occurrence, canonical
    included (the reporting view: 'which passages of this document
    appear elsewhere'). Token indices are 1-based inclusive over
    normalized tokens. Pass `occurrences` (a — typically persisted —
    duplicated_ngram_occurrences result for the SAME df/k/min_count)
    to share the corpus-sized detection pass with a sibling strip."""
    occ = occurrences if occurrences is not None else duplicated_ngram_occurrences(
        df, id_col, text_col, k, min_count, portable=portable
    )
    return _merge_spans(occ, k)


def strip_duplicated_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    min_count: int = 2,
    portable: bool = False,
    occurrences: DataFrame | None = None,
) -> DataFrame:
    """(id, clean_text, n_tokens, n_removed): the corpus with every
    duplicated passage removed EXCEPT its corpus-first occurrence
    (ExactSubstr's keep-one rule, deterministic via min (id, pos)).
    clean_text is the surviving normalized tokens re-joined with
    single spaces; documents with nothing to remove pass through with
    n_removed=0 (normalized). `occurrences` shares the detection pass
    as in duplicated_spans."""
    occ = occurrences if occurrences is not None else duplicated_ngram_occurrences(
        df, id_col, text_col, k, min_count, portable=portable
    )
    rm_spans = _merge_spans(occ.filter(~F.col("is_canonical")), k)

    # Reconstruction stays ARRAY-shaped: the removable spans collect
    # to a tiny per-doc array (few intervals), join once on id, and a
    # higher-order filter drops covered token positions in place. The
    # alternative — explode every token, anti-range-join, re-aggregate
    # sorted by position — shuffles the corpus's full token volume
    # twice; measured 121s vs 103s at 100x replication and slower at
    # sf0.1 too. The HOF is interpreted but runs ONE pass per token
    # (the repetition-battery lesson was re-evaluation, not HOFs per
    # se), and spans-per-token is a handful of interval checks.
    rm_arr = rm_spans.groupBy("id").agg(
        F.collect_list(F.struct("start_tok", "end_tok")).alias("spans")
    )
    toks = F.filter(
        F.split(normalize_text(text_col), " "), lambda t: F.length(t) > 0
    )
    base = df.select(F.col(id_col).alias("id"), toks.alias("t")).join(
        rm_arr, "id", "left"
    )
    spans = F.coalesce(F.col("spans"), F.array())
    # sequence(1, 0) DESCENDS in Spark — an empty token array must map
    # to an empty index list, not [1, 0]
    idx = F.when(
        F.size("t") > 0, F.sequence(F.lit(1), F.size("t"))
    ).otherwise(F.expr("array()").cast("array<int>"))
    keep_pos = F.filter(
        idx,
        lambda p: ~F.exists(
            spans, lambda s: (p >= s["start_tok"]) & (p <= s["end_tok"])
        ),
    )
    kept_toks = F.transform(keep_pos, lambda p: F.element_at(F.col("t"), p))
    return base.select(
        "id",
        F.concat_ws(" ", kept_toks).alias("clean_text"),
        F.size("t").alias("n_tokens"),
        (F.size("t") - F.size(keep_pos)).alias("n_removed"),
    )
