"""Ingestion-side curation front: the streaming mirror of
`pipeline.curate_corpus`'s stateless/bounded-state stages.

A production corpus is not curated only in batch — the crawl ARRIVES
continuously, and the cheap front of the pipeline (quality heuristics,
in-window exact dedup, eval-contamination flagging) belongs at
ingestion so the lake never accumulates obvious junk. The heavy tiers
(near-dup VERIFICATION + clustering, ExactSubstr, classifier training,
mixture, packing) stay batch: they need corpus-global state and run on
the landed table — exactly the split the batch/stream tier docs in
streaming/dedup.py describe. The near-dup CANDIDATE tier, though, is
stream-shaped (stateless band-bucket join against a batch-built
index): `curate_stream_with_neardup` adds it as a second output
stream (r15).

Stage shapes (all existing, composition adds no new state):
- quality/language filter — stateless per-row expressions
  (functions/text.quality_score, lang_id), fused into the scan;
- exact dedup — content fingerprint → watermark →
  dropDuplicatesWithinWatermark (state bounded by arrival rate ×
  delay; a duplicate arriving after eviction re-emits and is caught
  by the batch tier — the documented trade);
- decontamination — stateless broadcast arrays_overlap FLAG (0/1),
  not a drop: at ingestion the eval set may still be growing, so the
  flag lets the training-set builder decide with the final eval list.

Output: (id, time, text, quality, fp, contaminated) — the columns the
batch tiers consume, stream≡batch pinned in
tests/test_streaming_pipeline.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["curate_stream", "curate_stream_with_neardup"]


def curate_stream(
    stream_docs: DataFrame,
    eval_grams: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    time_col: str = "ts",
    min_quality: float = 0.5,
    lang: str | None = "en",
    dedup_delay: str = "10 minutes",
    decontam_n: int = 5,
) -> DataFrame:
    """Compose the ingestion curation front over a streaming frame.

    `eval_grams` is the broadcastable 1-row (egrams array) frame from
    streaming.decontam.eval_gram_array — built ONCE from the eval
    suite, reused across batches. Works identically on a batch frame
    (the stream≡batch test runs both)."""
    from pyspark.sql.window import Window

    from distributedqueryengine_spark.functions.text import (
        fingerprint,
        lang_id,
        quality_score,
    )
    from distributedqueryengine_spark.streaming.decontam import _gram_array

    pred = quality_score(text_col) >= min_quality
    if lang is not None:
        pred = pred & (lang_id(text_col) == lang)
    cleaned = stream_docs.filter(pred).select(
        F.col(id_col),
        F.col(time_col),
        F.col(text_col),
        quality_score(text_col).alias("quality"),
        fingerprint(text_col).alias("fp"),
    )
    is_streaming = cleaned.isStreaming
    deduped = (
        cleaned.withWatermark(time_col, dedup_delay)
        .dropDuplicatesWithinWatermark(["fp"])
        if is_streaming
        # batch mirror: first-arrival-wins ≡ min event time per content
        # (ties by id) — what the engine's keep-first state does
        else cleaned.withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("fp").orderBy(
                    F.col(time_col).asc(), F.col(id_col).asc()
                )
            ),
        ).filter(F.col("__rn") == 1).drop("__rn")
    )
    return (
        deduped.withColumn("_grams", _gram_array(text_col, decontam_n))
        .crossJoin(F.broadcast(eval_grams))
        .select(
            F.col(id_col),
            F.col(time_col),
            F.col(text_col),
            "quality",
            "fp",
            F.coalesce(
                F.arrays_overlap("_grams", "egrams"), F.lit(False)
            ).cast("int").alias("contaminated"),
        )
    )


def curate_stream_with_neardup(
    stream_docs: DataFrame,
    eval_grams: DataFrame,
    index_path: str,
    candidate_handler,
    id_col: str = "doc_id",
    text_col: str = "text",
    time_col: str = "ts",
    min_quality: float = 0.5,
    lang: str | None = "en",
    dedup_delay: str = "10 minutes",
    decontam_n: int = 5,
    ngram: int = 3,
    num_perm: int = 32,
    bands: int = 8,
    portable: bool = False,
) -> tuple[DataFrame, DataFrame, object]:
    """The curation front PLUS the near-dup candidate tier (r15):
    returns (curated, neardup_src, neardup_handler).

    `curated` is exactly :func:`curate_stream`'s output (one state
    operator — the watermarked exact-dedup; pinned). `neardup_src` is
    the quality-filtered stream and `neardup_handler` the
    foreachBatch function for it — start the second sink as::

        neardup_src.writeStream.foreachBatch(neardup_handler).start()

    Per micro-batch the handler re-reads the band index saved at
    ``index_path`` (streaming.dedup.save_band_index layout) and hands
    (epoch_id, candidate pairs) to ``candidate_handler`` for batch
    verification (exact Jaccard) — candidates are the part that must
    be low-latency; verification needs the corpus shingle table.

    Why foreachBatch and not a stream-static join: a static join
    side's file listing is FIXED at query start (REFRESH TABLE does
    not reach a running stream — verified r15), so a static join can
    only ever see the index snapshot from stream start. The
    foreachBatch re-read builds a fresh DataFrame per epoch, so
    out-of-band `append_to_band_index` appends are picked up on the
    NEXT micro-batch with no restart (pinned over two micro-batches
    with an append in between in tests/test_streaming_dedup.py);
    `band_index_staleness` reports when accumulated appends deserve a
    rebuild instead."""
    from distributedqueryengine_spark.functions.text import (
        lang_id,
        quality_score,
    )
    from distributedqueryengine_spark.streaming.dedup import (
        neardup_candidates_foreach_batch,
    )

    curated = curate_stream(
        stream_docs, eval_grams, id_col, text_col, time_col,
        min_quality, lang, dedup_delay, decontam_n,
    )
    pred = quality_score(text_col) >= min_quality
    if lang is not None:
        pred = pred & (lang_id(text_col) == lang)
    neardup_src = stream_docs.filter(pred)
    handler = neardup_candidates_foreach_batch(
        index_path, candidate_handler, id_col, text_col,
        ngram, num_perm, bands, portable=portable,
    )
    return curated, neardup_src, handler
