"""Streaming duplicated-passage flagging: annotate arriving documents
that contain a passage already known to be duplicated in the corpus.

The batch operator (functions/substr_dedup.py) detects corpus-wide
duplicated k-grams in one pass; ingestion needs the complementary
guard — "does this NEW document carry one of the known duplicated
passages (boilerplate, licence block, copied quote)?" — at per-record
latency. Design mirrors streaming/decontam.py exactly (stateless,
per-row, stream-static):

1. The reference corpus's duplicated k-gram hashes are collapsed
   batch-side into ONE row holding the collected hash array
   (`duplicated_gram_array`) — bounded by the corpus's boilerplate
   volume, with an explicit `max_grams` cap keeping the most-repeated
   grams first (the broadcast contract; a cap trades recall on the
   rarest duplicated passages, never precision).
2. Each arriving document's k-gram hashes are computed as one array
   column (transform over arrays_zip slices — interpreted HOFs,
   acceptable on per-batch new rows, the same trade decontam makes).
3. The stream cross-joins the broadcast 1-row static side and emits
   `dup_gram_hits` (how many known-duplicated grams the doc carries)
   and `has_duplicated_passage` — append mode, no watermark, no state
   store; a refreshed index is picked up per micro-batch.

Emitting a flag + hit count (rather than stripping in-stream) lets the
sink route flagged rows to the batch keep-first strip while clean rows
flow straight to the corpus — stripping needs the corpus-wide
canonical rule, which is a batch decision by construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from distributedqueryengine_spark.functions.dedup import portable_hash64
from distributedqueryengine_spark.functions.substr_dedup import (
    duplicated_ngram_occurrences,
)
from distributedqueryengine_spark.functions.text import normalize_text

__all__ = ["duplicated_gram_array", "stream_flag_duplicated_passages"]


def _gram_hash_array(text_col: str, k: int, portable: bool) -> Column:
    """array<bigint> of distinct k-gram hashes for one row — per-row
    equivalent of substr_dedup's positional explode (positions are
    irrelevant for flagging; distinct membership is the signal)."""
    toks = F.filter(
        F.split(normalize_text(text_col), " "), lambda t: F.length(t) > 0
    )
    n_grams = F.greatest(F.size(toks) - k + 1, F.lit(0))
    zipped = F.arrays_zip(
        *[F.slice(toks, i + 1, n_grams).alias(f"t{i}") for i in range(k)]
    )

    def gram(z: Column) -> Column:
        g = F.concat_ws(" ", *[z[f"t{i}"] for i in range(k)])
        return portable_hash64(g) if portable else F.xxhash64(g)

    return F.array_distinct(F.transform(zipped, gram))


def duplicated_gram_array(
    corpus_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_count: int = 2,
    portable: bool = False,
    max_grams: int | None = 1_000_000,
) -> DataFrame:
    """1-row static side: (dgrams array<bigint>) — the corpus's
    duplicated k-gram hashes collected into one array. Persist it and
    refresh on corpus compaction. `max_grams` keeps the MOST-repeated
    grams (order by occurrence count desc, hash asc — deterministic):
    under a cap the flag loses recall on the rarest duplicated
    passages only, never flags a clean document."""
    occ = duplicated_ngram_occurrences(
        corpus_df, id_col, text_col, k, min_count, portable=portable
    )
    hashes = occ.groupBy("h").agg(F.max("n_occ").alias("n_occ"))
    if max_grams is not None:
        hashes = hashes.orderBy(
            F.col("n_occ").desc(), F.col("h").asc()
        ).limit(int(max_grams))
    return hashes.agg(F.collect_set("h").alias("dgrams"))


def stream_flag_duplicated_passages(
    stream_docs: DataFrame,
    dup_grams: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    portable: bool = False,
) -> DataFrame:
    """Arriving documents annotated with `dup_gram_hits` (int) and
    `has_duplicated_passage` (int 0/1): how many / whether any of the
    corpus's known duplicated k-grams appear in the document.

    Stateless stream-static plan: per-row gram-hash array, broadcast
    1-row cross join, array_intersect size. Works identically on a
    batch DataFrame (pytest pins flagged ids ≡ the docs the batch
    operator reports spans for)."""
    return (
        stream_docs.withColumn(
            "_ghashes", _gram_hash_array(text_col, k, portable)
        )
        .crossJoin(F.broadcast(dup_grams))
        .select(
            F.col(id_col),
            F.col(text_col),
            F.coalesce(
                F.size(F.array_intersect("_ghashes", "dgrams")), F.lit(0)
            ).alias("dup_gram_hits"),
        )
        .withColumn(
            "has_duplicated_passage",
            (F.col("dup_gram_hits") > 0).cast("int"),
        )
    )
