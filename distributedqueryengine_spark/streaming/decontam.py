"""Streaming benchmark decontamination: flag arriving documents that
share an n-gram with a held-out eval set, without state.

The batch operator (functions/decontam.py) anti-joins the corpus once;
ingestion needs the same guard per arriving document. Design mirrors
streaming/dedup.py's discipline — everything per-row and stateless:

1. Each document's distinct word-n-gram md5 fingerprints are computed
   as ONE array column (transform over arrays_zip slices — higher-order
   fns are interpreted, acceptable on per-batch new rows).
2. The eval set is collapsed batch-side into a single row holding the
   collected gram set (`eval_gram_array`) — the decontamination
   contract is that the eval set is broadcast-small, exactly as in the
   batch operator.
3. The stream cross-joins that 1-row static side (broadcast nested
   loop over one row — constant per record) and flags
   `arrays_overlap(doc_grams, eval_grams)`. Append mode, no watermark,
   no state store; a refreshed eval table is picked up per micro-batch.

Emitting a flag rather than dropping lets the sink route clean rows to
the corpus and contaminated rows to a quarantine table in the same
foreachBatch — both sides of the batch operator's train/quarantine
split, at ingestion latency.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from distributedqueryengine_spark.functions.decontam import doc_ngram_fingerprints
from distributedqueryengine_spark.functions.text import normalize_text


def _gram_array(text_col: str, n: int) -> Column:
    """array<string> of distinct word-n-gram md5 fingerprints for one
    row — per-row equivalent of decontam.doc_ngram_fingerprints."""
    toks = F.split(normalize_text(text_col), " ")
    n_grams = F.greatest(F.size(toks) - n + 1, F.lit(0))
    zipped = F.arrays_zip(
        *[F.slice(toks, i + 1, n_grams).alias(f"t{i}") for i in range(n)]
    )

    def gram(z: Column) -> Column:
        return F.md5(F.concat_ws(" ", *[z[f"t{i}"] for i in range(n)]))

    return F.array_distinct(F.transform(zipped, gram))


def eval_gram_array(
    eval_df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 5
) -> DataFrame:
    """1-row static side: (egrams array<string>) — the eval set's
    distinct n-gram fingerprints collected into one array. Persist it;
    size is bounded by the eval set (the broadcast contract shared with
    the batch operator's `contaminated_ids`)."""
    g = doc_ngram_fingerprints(eval_df, id_col, text_col, n)
    return g.agg(F.collect_set("g").alias("egrams"))


def stream_decontaminate(
    stream_docs: DataFrame,
    eval_grams: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Arriving documents annotated with `contaminated` (int 0/1):
    1 ⇔ the document shares ≥1 word n-gram with the eval set.

    Stateless stream-static plan: per-row gram array, broadcast 1-row
    cross join, arrays_overlap. Works identically on a batch DataFrame
    (pytest pins flagged ids ≡ the batch operator's contaminated_ids).
    """
    return (
        stream_docs.withColumn("_grams", _gram_array(text_col, n))
        .crossJoin(F.broadcast(eval_grams))
        .select(
            F.col(id_col),
            F.col(text_col),
            F.coalesce(
                F.arrays_overlap("_grams", "egrams"), F.lit(False)
            ).cast("int").alias("contaminated"),
        )
    )
