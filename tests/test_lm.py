"""Bigram LM training + perplexity scoring: full DuckDB differential
over the documents fixture, plus fluency-ordering sanity."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    return con


def test_bigram_lm_matches_duckdb(spark, tables, duck):
    """Train on the documents corpus and score the SAME corpus; every
    per-doc (n_bigrams, avg_neg_logprob) must equal the DuckDB mirror
    of the identical vocab cutoff / unk mapping / add-one math."""
    from distributedqueryengine_spark.functions.lm import (
        score_perplexity,
        train_bigram_lm,
    )

    docs = tables["documents"].select("doc_id", "text")
    lm = train_bigram_lm(docs, "text", vocab_size=200)
    got = sorted(
        (r.doc_id, r.n_bigrams, r.avg_neg_logprob)
        for r in score_perplexity(docs, "text", lm).collect()
    )
    v = lm["v"]
    expect = sorted(
        tuple(r)
        for r in duck.execute(
            f"""
            WITH tok AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                 t -> length(t) > 0) AS toks
              FROM documents
            ), vocab AS (
              SELECT w FROM (
                SELECT unnest(toks) AS w FROM tok
              ) GROUP BY w ORDER BY count(*) DESC, w ASC LIMIT 200
            ), vocab_list AS (
              SELECT list(w) AS vs FROM vocab
            ), framed AS (
              SELECT doc_id,
                     ['<s>'] ||
                     list_transform(toks,
                        t -> CASE WHEN list_contains(vs, t) THEN t
                                  ELSE '<unk>' END) ||
                     ['</s>'] AS toks
              FROM tok, vocab_list
            ), pairs AS (
              SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2
              FROM framed, unnest(range(1, len(toks))) AS t(i)
            ), bigrams AS (
              SELECT w1, w2, count(*) AS cb FROM pairs GROUP BY 1, 2
            ), unigrams AS (
              SELECT w1 AS w, count(*) AS cu FROM pairs GROUP BY 1
            )
            SELECT p.doc_id,
                   count(*) AS n_bigrams,
                   round(-avg(ln((b.cb + 1.0) / (u.cu + {v}))), 6) AS nlp
            FROM pairs p
            JOIN bigrams b USING (w1, w2)
            JOIN unigrams u ON p.w1 = u.w
            GROUP BY p.doc_id
            """
        ).fetchall()
    )
    assert [g[:2] for g in got] == [e[:2] for e in expect]
    assert all(abs(g[2] - e[2]) <= 1e-6 for g, e in zip(got, expect))


def test_perplexity_orders_fluency(spark, tables):
    """A model trained on real documents scores a sentence built from
    common corpus phrases lower (more fluent) than shuffled gibberish
    of unseen tokens; empty text degrades gracefully."""
    from distributedqueryengine_spark.functions.lm import (
        score_perplexity,
        train_bigram_lm,
    )

    docs = tables["documents"].select("doc_id", "text")
    lm = train_bigram_lm(docs, "text", vocab_size=500)
    # pull a real phrase from the corpus so bigrams are in-model
    sample_text = docs.first().text
    phrase = " ".join(sample_text.lower().split()[:12])
    probes = spark.createDataFrame(
        [
            (1, phrase),
            (2, "zqx vnm plk wrt qqj xxo zzb yyp qwv jjk"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in score_perplexity(probes, "text", lm).collect()}
    assert got[1].perplexity < got[2].perplexity
    assert got[3].n_bigrams == 1  # <s> -> </s> only
    assert all(got[i].avg_neg_logprob > 0 for i in (1, 2, 3))
