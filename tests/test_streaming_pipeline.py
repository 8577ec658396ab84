"""Streaming curation front (streaming/pipeline.curate_stream):
quality filter + in-window exact dedup + decontamination flag composed
over the real microbatch engine, stream ≡ batch.

Within one microbatch the engine's dropDuplicatesWithinWatermark keeps
the first PROCESSED row of a fingerprint (partition order, not event
time), so the stream/batch comparison pins what is deterministic: the
surviving fingerprint set, the exact rows for unique content, one
survivor per duplicate group, and the contamination flags."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributedqueryengine_spark.functions import text as T
from distributedqueryengine_spark.session import load_table
from distributedqueryengine_spark.streaming import decontam as SDC
from distributedqueryengine_spark.streaming import windows as W
from distributedqueryengine_spark.streaming.pipeline import curate_stream

SF_DIR = "/root/testdata/sf0.001"
N = 3


def _with_ts(df):
    return df.withColumn(
        "ts", F.timestamp_seconds(F.lit(1_700_000_000) + F.col("doc_id") % 997)
    )


def test_curate_stream_matches_batch(spark):
    docs = load_table(spark, SF_DIR, "documents")
    eval_df = docs.filter(F.col("doc_id") % 97 == 0)
    base = docs.filter(F.col("doc_id") % 97 != 0)
    eg = SDC.eval_gram_array(eval_df, n=N).persist()
    eg.count()

    stream = _with_ts(
        W.stream_from_table(spark, SF_DIR, "documents").filter(
            F.col("doc_id") % 97 != 0
        )
    )
    out = curate_stream(stream, eg, time_col="ts", decontam_n=N)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("curate_out")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql(
        "SELECT doc_id, fp, contaminated FROM curate_out"
    ).collect()

    ref = curate_stream(_with_ts(base), eg, time_col="ts", decontam_n=N)
    exp = ref.select("doc_id", "fp", "contaminated").collect()

    # one output row per surviving fingerprint, same fp set both ways
    got_fps = [r.fp for r in got]
    exp_fps = [r.fp for r in exp]
    assert len(got_fps) == len(set(got_fps))
    assert set(got_fps) == set(exp_fps) and got_fps

    # members per fingerprint among the CLEANED input (the only rows
    # eligible to survive); stream may keep a different member than
    # the batch mirror's (ts, id) rule when a batch has no order
    clean_pred = (T.quality_score("text") >= 0.5) & (T.lang_id("text") == "en")
    members: dict = {}
    for r in base.filter(clean_pred).select(
        "doc_id", T.fingerprint("text").alias("fp")
    ).collect():
        members.setdefault(r.fp, set()).add(r.doc_id)
    for r in got:
        assert r.doc_id in members[r.fp], (r.doc_id, r.fp)
    # unique-content rows are forced: identical ids both ways
    uniq = {fp for fp, m in members.items() if len(m) == 1}
    assert {r.doc_id for r in got if r.fp in uniq} == {
        r.doc_id for r in exp if r.fp in uniq
    }
    # flags are a pure function of content — equal per fingerprint
    flag_exp = {r.fp: r.contaminated for r in exp}
    for r in got:
        assert r.contaminated == flag_exp[r.fp], r.fp
    assert any(r.contaminated == 1 for r in got)
    assert any(r.contaminated == 0 for r in got)
    # quality filter actually dropped something
    assert len(set(got_fps)) < base.count()
    eg.unpersist()


def test_curate_stream_dedup_state_is_bounded(spark):
    """The only stateful operator is the watermarked dedup — state rows
    are fingerprints within the delay window, not the corpus."""
    docs = load_table(spark, SF_DIR, "documents")
    eg = SDC.eval_gram_array(docs.limit(5), n=N).persist()
    eg.count()
    stream = _with_ts(W.stream_from_table(spark, SF_DIR, "documents"))
    out = curate_stream(stream, eg, time_col="ts", decontam_n=N)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("curate_state")
        .start()
    )
    q.processAllAvailable()
    progress = q.lastProgress
    q.stop()
    ops = (progress or {}).get("stateOperators") or []
    assert len(ops) == 1, ops  # exactly the dedup, nothing else
    n_clean = curate_stream(
        _with_ts(docs), eg, time_col="ts", decontam_n=N
    ).count()
    assert ops[0]["numRowsTotal"] <= docs.count()
    assert ops[0]["numRowsTotal"] >= n_clean
    eg.unpersist()
