"""Benchmark decontamination (functions/decontam.py): n-gram overlap
semantics on hand-built contaminated/clean fixtures, plus equivalence
of the inventory suite against an independent brute-force computation.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributedqueryengine_spark.functions import decontam as DC

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus(spark):
    # doc 1 contains the eval 5-gram verbatim; doc 2 shares only 4 of
    # the 5 words in order; doc 3 is disjoint; doc 4 is shorter than n.
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over a lazy dog"),
            (2, "quick brown fox jumps high above everything"),
            (3, "completely unrelated text about query engines"),
            (4, "too short"),
        ],
        "doc_id long, text string",
    )
    eval_df = spark.createDataFrame(
        [(100, "watch the quick brown fox jumps today")],
        "doc_id long, text string",
    )
    return train, eval_df


def test_contaminated_ids_exact_overlap_only(corpus):
    train, eval_df = corpus
    bad = sorted(
        r.doc_id for r in DC.contaminated_ids(train, eval_df, n=5).collect()
    )
    assert bad == [1]


def test_decontaminate_drops_contaminated_rows(corpus):
    train, eval_df = corpus
    kept = sorted(r.doc_id for r in DC.decontaminate(train, eval_df, n=5).collect())
    assert kept == [2, 3, 4]


def test_smaller_n_catches_partial_overlap(corpus):
    train, eval_df = corpus
    # At n=4 the shared "quick brown fox jumps" window contaminates
    # doc 2 as well.
    bad = sorted(
        r.doc_id for r in DC.contaminated_ids(train, eval_df, n=4).collect()
    )
    assert bad == [1, 2]


def test_normalization_is_applied(spark):
    train = spark.createDataFrame(
        [(1, "  The   QUICK brown\tfox JUMPS over ")], "doc_id long, text string"
    )
    eval_df = spark.createDataFrame(
        [(9, "the quick brown fox jumps")], "doc_id long, text string"
    )
    assert [r.doc_id for r in DC.contaminated_ids(train, eval_df, n=5).collect()] == [1]


def test_suite_matches_bruteforce(spark):
    """The inventory suite's contaminated set == a driver-side brute
    force over python sets, at n=3 on the real sf0.001 documents."""
    from distributedqueryengine_spark.session import load_table

    d = load_table(spark, SF_DIR, "documents")
    rows = d.select("doc_id", F.lower(F.trim("text")).alias("t")).collect()

    def grams(s: str, n: int = 3) -> set[tuple[str, ...]]:
        toks = " ".join(s.split()).split(" ")
        return {tuple(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    ev_grams = set()
    for r in rows:
        if r.doc_id % 97 == 0:
            ev_grams |= grams(r.t)
    expect = sorted(
        r.doc_id for r in rows if r.doc_id % 97 != 0 and grams(r.t) & ev_grams
    )

    train = d.filter(F.col("doc_id") % 97 != 0)
    ev = d.filter(F.col("doc_id") % 97 == 0)
    got = sorted(
        r.doc_id for r in DC.contaminated_ids(train, ev, n=3).collect()
    )
    assert got == expect
