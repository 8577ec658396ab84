"""Streaming duplicated-passage flagging (streaming/substr.py):
flagged ids must line up with the batch ExactSubstr operator's span
report, end-to-end through the microbatch engine, statelessly."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributedqueryengine_spark.functions import substr_dedup as SD
from distributedqueryengine_spark.session import load_table
from distributedqueryengine_spark.streaming import substr as SS
from distributedqueryengine_spark.streaming import windows as W

SF_DIR = "/root/testdata/sf0.001"
K = 4  # short grams: the tiny fixture needs collisions to flag


def test_batch_form_matches_batch_operator(spark):
    """Against the SAME corpus the index was built from, the flagged
    set must equal exactly the docs the batch operator reports
    duplicated spans for (a doc has a span ⇔ it carries ≥1 duplicated
    gram)."""
    docs = load_table(spark, SF_DIR, "documents")
    idx = SS.duplicated_gram_array(docs, k=K, portable=True)
    out = SS.stream_flag_duplicated_passages(docs, idx, k=K, portable=True)
    flagged = {
        r.doc_id for r in out.filter("has_duplicated_passage = 1").collect()
    }
    spans = SD.duplicated_spans(docs, "doc_id", "text", k=K, min_count=2,
                                portable=True)
    expect = {r.id for r in spans.select("id").distinct().collect()}
    assert flagged == expect
    assert flagged, "fixture produced no duplicated grams — lower K"
    # hit counts: per doc, the number of DISTINCT duplicated gram
    # hashes it carries (cross-check one doc against the raw operator)
    occ = SD.duplicated_ngram_occurrences(
        docs, "doc_id", "text", k=K, min_count=2, portable=True
    )
    exp_hits = {
        r.id: r.n
        for r in occ.groupBy("id")
        .agg(F.countDistinct("h").alias("n"))
        .collect()
    }
    got_hits = {
        r.doc_id: r.dup_gram_hits
        for r in out.filter("dup_gram_hits > 0").collect()
    }
    assert got_hits == exp_hits


def test_new_documents_flagged_against_reference_corpus(spark):
    """The ingestion use case: an index built from a reference corpus
    flags NEW docs carrying a known duplicated passage, passes clean
    ones, and a capped index only loses recall, never precision."""
    passage = "all rights reserved redistribution permitted only with attribution"
    corpus = spark.createDataFrame(
        [(1, "intro words " + passage), (2, passage + " outro text"),
         (3, "entirely unique content about nothing shared whatsoever")],
        "doc_id long, text string",
    )
    idx = SS.duplicated_gram_array(corpus, k=K, portable=True).persist()
    arriving = spark.createDataFrame(
        [(10, "prefix " + passage + " suffix"),     # carries the passage
         (11, "completely fresh never seen text about novel things"),
         (12, "")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.has_duplicated_passage
        for r in SS.stream_flag_duplicated_passages(
            arriving, idx, k=K, portable=True
        ).collect()
    }
    assert got == {10: 1, 11: 0, 12: 0}
    # cap to ONE gram: doc 10 may lose the flag (recall) but doc 11/12
    # can never gain one (precision)
    idx1 = SS.duplicated_gram_array(corpus, k=K, portable=True, max_grams=1)
    got1 = {
        r.doc_id: r.has_duplicated_passage
        for r in SS.stream_flag_duplicated_passages(
            arriving, idx1, k=K, portable=True
        ).collect()
    }
    assert got1[11] == 0 and got1[12] == 0
    idx.unpersist()


def test_stream_flags_match_batch(spark):
    """Through the real microbatch engine: streamed flags equal the
    batch run row-for-row, and the plan is stateless."""
    docs = load_table(spark, SF_DIR, "documents")
    idx = SS.duplicated_gram_array(docs, k=K, portable=True).persist()
    idx.count()

    stream = W.stream_from_table(spark, SF_DIR, "documents")
    out = SS.stream_flag_duplicated_passages(
        stream, idx, k=K, portable=True
    ).select("doc_id", "dup_gram_hits", "has_duplicated_passage")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("ssubstr_out")
        .start()
    )
    q.processAllAvailable()
    progress = q.lastProgress
    assert progress is None or not progress.get("stateOperators")
    q.stop()

    got = {
        (r.doc_id, r.dup_gram_hits, r.has_duplicated_passage)
        for r in spark.sql("SELECT * FROM ssubstr_out").collect()
    }
    expect = {
        (r.doc_id, r.dup_gram_hits, r.has_duplicated_passage)
        for r in SS.stream_flag_duplicated_passages(
            docs, idx, k=K, portable=True
        ).collect()
    }
    assert got == expect
    assert any(f == 1 for _, _, f in got) and any(f == 0 for _, _, f in got)
    idx.unpersist()
