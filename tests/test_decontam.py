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


def test_semantic_contaminated_ids_matches_exact_crossjoin(spark, tables):
    """mapInPandas BLAS screening == an exact JVM cross-join cosine
    computation on a fixture-sized slice, at two thresholds; planted
    exact copies of eval vectors must always flag with max_cos ~ 1."""
    from pyspark.sql import functions as F

    from distributedqueryengine_spark.functions.decontam import (
        semantic_contaminated_ids,
    )

    emb = tables["embeddings"].select("vec_id", "embedding").limit(300)
    ev = tables["embeddings"].select("vec_id", "embedding").filter(
        F.col("vec_id") % 29 == 0
    ).limit(20)
    planted = {r.vec_id for r in ev.select("vec_id").collect()} & {
        r.vec_id for r in emb.select("vec_id").collect()
    }
    assert planted, "fixture slice must contain eval copies"

    v = F.col("embedding").cast("array<double>")
    norm = lambda c: F.sqrt(F.aggregate(c, F.lit(0.0), lambda a, x: a + x * x))  # noqa: E731
    a = emb.select(F.col("vec_id").alias("id"), v.alias("va"))
    b = ev.select(v.alias("vb"))
    dot = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cos = dot / (norm(F.col("va")) * norm(F.col("vb")))
    exact = (
        a.crossJoin(b)
        .select("id", cos.alias("c"))
        .groupBy("id")
        .agg(F.max("c").alias("max_cos"))
    )
    for tau in (0.99, 0.8):
        expect = {
            r.id: round(r.max_cos, 4)
            for r in exact.filter(F.col("max_cos") >= tau).collect()
        }
        got = {
            r.id: round(r.max_cos, 4)
            for r in semantic_contaminated_ids(
                emb, ev, tau=tau, id_col="vec_id"
            ).collect()
        }
        assert got == expect, f"tau={tau}: {got.keys() ^ expect.keys()}"
        assert planted <= set(got), "exact eval copies must flag"


def test_semantic_decontaminate_drops_only_flagged(spark, tables):
    from pyspark.sql import functions as F

    from distributedqueryengine_spark.functions.decontam import (
        semantic_contaminated_ids,
        semantic_decontaminate,
    )

    emb = tables["embeddings"].select("vec_id", "embedding").limit(300)
    ev = emb.filter(F.col("vec_id") % 41 == 0).limit(10)
    flagged = {
        r.id
        for r in semantic_contaminated_ids(emb, ev, 0.99, id_col="vec_id").collect()
    }
    kept = {
        r.vec_id
        for r in semantic_decontaminate(
            emb, emb, ev, 0.99, id_col="vec_id"
        ).collect()
    }
    all_ids = {r.vec_id for r in emb.select("vec_id").collect()}
    assert kept == all_ids - flagged
    assert flagged, "eval copies must be flagged"


def test_semantic_contaminated_empty_eval_flags_nothing(spark, tables):
    from distributedqueryengine_spark.functions.decontam import (
        semantic_contaminated_ids,
    )

    emb = tables["embeddings"].select("vec_id", "embedding").limit(50)
    empty = emb.limit(0)
    assert semantic_contaminated_ids(emb, empty, 0.5, id_col="vec_id").count() == 0


def test_semantic_contaminated_ids_string_ids(spark):
    """The output id column follows the corpus id type: string doc ids
    pass through the Arrow conversion unchanged."""
    from distributedqueryengine_spark.functions.decontam import (
        semantic_contaminated_ids,
    )

    corpus = spark.createDataFrame(
        [("doc-a", [1.0, 0.0]), ("doc-b", [0.0, 1.0]), ("doc-c", [0.9, 0.1])],
        "doc_id string, embedding array<double>",
    )
    evals = spark.createDataFrame(
        [("e1", [1.0, 0.0])], "doc_id string, embedding array<double>"
    )
    got = {r.id: r.max_cos for r in semantic_contaminated_ids(corpus, evals, tau=0.9).collect()}
    assert set(got) == {"doc-a", "doc-c"}
    assert got["doc-a"] == 1.0


def test_bloom_prefiltered_decontam_parity(spark, tables):
    """use_bloom=True returns EXACTLY the same contaminated ids (the
    bloom has no false negatives; the exact semi join removes the
    false positives)."""
    from distributedqueryengine_spark.functions.decontam import (
        contaminated_ids,
    )

    docs = tables["documents"]
    train = docs.where(F.col("doc_id") % 97 != 0)
    ev = docs.where(F.col("doc_id") % 97 == 0)
    plain = sorted(
        r.doc_id for r in contaminated_ids(train, ev, n=3).collect()
    )
    bloomed = sorted(
        r.doc_id
        for r in contaminated_ids(train, ev, n=3, use_bloom=True).collect()
    )
    assert plain == bloomed and plain


def test_contamination_report_evidence(spark):
    """r15: the report names WHICH eval doc each contaminated train
    doc leaks, with the shared-gram count and the lexicographically
    first gram; disjoint pairs are absent."""
    from distributedqueryengine_spark.functions.decontam import (
        contaminated_ids,
        contamination_report,
    )

    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "completely different words only here now"),
            (3, "alpha beta gamma something else entirely"),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon eta"),
         (200, "nothing shared at all whatsoever today")],
        "doc_id long, text string",
    )
    rep = {
        (r.train_id, r.eval_id): (r.n_shared_grams, r.example_gram)
        for r in contamination_report(train, ev, n=3).collect()
    }
    # doc 1 shares 3-grams 'alpha beta gamma', 'beta gamma delta',
    # 'gamma delta epsilon' with eval 100; doc 3 shares only the first
    assert rep[(1, 100)] == (3, "alpha beta gamma"), rep
    assert rep[(3, 100)] == (1, "alpha beta gamma"), rep
    assert not any(e == 200 for _, e in rep), rep
    assert set(rep) == {(1, 100), (3, 100)}
    # evidence set == drop list
    bad = {r.doc_id for r in contaminated_ids(train, ev, n=3).collect()}
    assert bad == {t for t, _ in rep}


def test_stop_grams_and_frequent_grams(spark):
    """r15: a boilerplate gram in stop_grams no longer contaminates;
    frequent_grams surfaces exactly the grams above the doc-frac bar."""
    from distributedqueryengine_spark.functions.decontam import (
        contaminated_ids,
        frequent_grams,
    )

    boiler = "all rights reserved worldwide"
    train = spark.createDataFrame(
        [
            (1, f"{boiler} plus unique alpha content"),
            (2, f"{boiler} and other unique beta content"),
            (3, "genuine leak of the secret eval answer text"),
            (4, "nothing shared here at all"),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, f"{boiler} eval question one"),
         (200, "the secret eval answer text appears")],
        "doc_id long, text string",
    )
    plain = {r.doc_id for r in contaminated_ids(train, ev, n=4).collect()}
    assert plain == {1, 2, 3}
    stops = spark.createDataFrame([(boiler,)], "gram string")
    with_stops = {
        r.doc_id
        for r in contaminated_ids(train, ev, n=4, stop_grams=stops).collect()
    }
    assert with_stops == {3}, with_stops
    freq = {r.gram: r.n_docs for r in frequent_grams(
        train, n=4, min_doc_frac=0.5).collect()}
    assert freq == {boiler: 2}, freq


def test_frequent_grams_null_ids_consistent(spark):
    """r16 ADVICE: NULL ids are dropped before gram counting, so the
    doc_frac numerator and the countDistinct denominator see the same
    id set and doc_frac never exceeds 1.0."""
    from distributedqueryengine_spark.functions.decontam import (
        frequent_grams,
    )

    txt = "alpha beta gamma delta"
    rows = [(1, txt), (2, txt), (None, txt), (None, txt)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = frequent_grams(df, n=3, min_doc_frac=0.5).collect()
    assert out, "gram present in all non-null docs must survive"
    for r in out:
        assert r["n_docs"] == 2 and r["doc_frac"] == 1.0, r
