"""Streaming decontamination (streaming/decontam.py): flagged ids must
equal the batch operator's contaminated_ids, end-to-end through the
microbatch engine, with a stateless plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributedqueryengine_spark.functions import decontam as DC
from distributedqueryengine_spark.session import load_table
from distributedqueryengine_spark.streaming import decontam as SDC
from distributedqueryengine_spark.streaming import windows as W

SF_DIR = "/root/testdata/sf0.001"
N = 3  # 3-grams: the synthetic corpus has almost no 5-gram collisions


def test_batch_form_matches_batch_operator(spark):
    """Run on a batch DataFrame, the streaming formulation's flagged
    ids must equal contaminated_ids, and unflagged ids the decontam
    survivors."""
    docs = load_table(spark, SF_DIR, "documents")
    eval_df = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    eg = SDC.eval_gram_array(eval_df, n=N)
    out = SDC.stream_decontaminate(train, eg, n=N)
    flagged = {r.doc_id for r in out.filter("contaminated = 1").collect()}
    expect = {
        r.doc_id for r in DC.contaminated_ids(train, eval_df, n=N).collect()
    }
    assert flagged == expect
    assert flagged, "fixture produced no contamination — lower n"
    clean = {r.doc_id for r in out.filter("contaminated = 0").collect()}
    survivors = {r.doc_id for r in DC.decontaminate(train, eval_df, n=N).select("doc_id").collect()}
    assert clean == survivors


def test_stream_flags_match_batch(spark):
    """Through the real microbatch engine: streamed flags must equal
    the batch run row-for-row, and the plan must be stateless."""
    docs = load_table(spark, SF_DIR, "documents")
    eval_df = docs.filter(F.col("doc_id") % 97 == 0)
    eg = SDC.eval_gram_array(eval_df, n=N).persist()
    eg.count()

    stream = W.stream_from_table(spark, SF_DIR, "documents").filter(
        F.col("doc_id") % 97 != 0
    )
    out = SDC.stream_decontaminate(stream, eg, n=N).select("doc_id", "contaminated")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("sdecon_out")
        .start()
    )
    q.processAllAvailable()
    progress = q.lastProgress
    assert progress is None or not progress.get("stateOperators")
    q.stop()

    got = {
        (r.doc_id, r.contaminated)
        for r in spark.sql("SELECT * FROM sdecon_out").collect()
    }
    batch = SDC.stream_decontaminate(
        docs.filter(F.col("doc_id") % 97 != 0), eg, n=N
    ).select("doc_id", "contaminated")
    expect = {(r.doc_id, r.contaminated) for r in batch.collect()}
    assert got == expect
    assert any(c == 1 for _, c in got) and any(c == 0 for _, c in got)
    eg.unpersist()
