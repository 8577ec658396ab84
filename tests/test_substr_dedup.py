"""Exact-substring dedup (ExactSubstr, Lee et al. 2022 re-expressed at
token k-gram granularity): duplicated-span detection and keep-first
stripping.

Verification: a pure-python reference of the identical semantics
(portable md5 k-gram hashes, corpus-wide occurrence counts, (id, pos)
canonical rule, interval merge), run over planted and randomized
corpora; plus behavioral pins — a passage pasted into many documents
survives in exactly one of them, unique text is never touched, and
sub-k documents are invisible to the operator."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F  # noqa: F401

from distributedqueryengine_spark.functions import substr_dedup as SD
from distributedqueryengine_spark.functions.substr_dedup import (
    duplicated_ngram_occurrences,
    duplicated_spans,
    strip_duplicated_spans,
)


def _toks(text: str) -> list[str]:
    return [t for t in " ".join(text.lower().split()).split(" ") if t]


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_occurrences(docs: dict[int, str], k: int, min_count: int):
    """[(id, pos, h, n_occ, is_canonical)] — 1-based gram positions."""
    occ = []
    for i in sorted(docs):
        t = _toks(docs[i])
        for p in range(len(t) - k + 1):
            occ.append((i, p + 1, _h60(" ".join(t[p : p + k]))))
    counts: dict[int, int] = {}
    for _, _, h in occ:
        counts[h] = counts.get(h, 0) + 1
    first: dict[int, tuple] = {}
    for i, p, h in sorted(occ):
        first.setdefault(h, (i, p))
    return [
        (i, p, h, counts[h], first[h] == (i, p))
        for i, p, h in occ
        if counts[h] >= min_count
    ]


def _py_merge(positions: list[int], k: int) -> list[tuple[int, int, int]]:
    """[(start, end, n_grams)] from sorted 1-based gram positions."""
    out = []
    for p in sorted(positions):
        if out and p <= out[-1][1] + 1:
            s, e, n = out.pop()
            out.append((s, max(e, p + k - 1), n + 1))
        else:
            out.append((p, p + k - 1, 1))
    return out


def _py_spans(docs, k, min_count, removable_only=False):
    occ = _py_occurrences(docs, k, min_count)
    per_doc: dict[int, list[int]] = {}
    for i, p, _, _, canon in occ:
        if removable_only and canon:
            continue
        per_doc.setdefault(i, []).append(p)
    return {
        i: _py_merge(ps, k) for i, ps in per_doc.items()
    }


def _py_strip(docs, k, min_count):
    spans = _py_spans(docs, k, min_count, removable_only=True)
    out = {}
    for i in sorted(docs):
        t = _toks(docs[i])
        rm = set()
        for s, e, _ in spans.get(i, []):
            rm.update(range(s, e + 1))
        kept = [tok for p, tok in enumerate(t, start=1) if p not in rm]
        out[i] = (" ".join(kept), len(t), len(t) - len(kept))
    return out


PASSAGE = "copyright notice all rights reserved redistribution permitted only with attribution"
K = 4


@pytest.fixture(scope="module")
def planted(spark):
    uniq = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "one two three four five six seven eight nine ten eleven",
        "red orange yellow green blue indigo violet ultraviolet",
    ]
    rows = [
        (1, uniq[0] + " " + PASSAGE),
        (2, PASSAGE + " " + uniq[1]),
        (3, uniq[2] + " " + PASSAGE + " tail words here"),
        (4, "solo unique words appearing nowhere else at all today"),
        (5, "too short"),      # sub-k, invisible
        (6, ""),               # empty
    ]
    return rows, spark.createDataFrame(rows, "doc_id long, text string")


def test_occurrences_match_python(spark, planted):
    rows, df = planted
    got = {
        (r.id, r.pos, r.h, r.n_occ, r.is_canonical)
        for r in duplicated_ngram_occurrences(
            df, "doc_id", "text", k=K, min_count=2, portable=True
        ).collect()
    }
    exp = set(_py_occurrences({i: t for i, t in rows}, K, 2))
    assert got == exp and got  # non-empty: the passage IS detected


def test_spans_match_python_and_cover_passage(spark, planted):
    rows, df = planted
    got: dict[int, list] = {}
    for r in duplicated_spans(
        df, "doc_id", "text", k=K, min_count=2, portable=True
    ).collect():
        got.setdefault(r.id, []).append((r.start_tok, r.end_tok, r.n_grams))
    exp = _py_spans({i: t for i, t in rows}, K, 2)
    assert {i: sorted(v) for i, v in got.items()} == {
        i: sorted(v) for i, v in exp.items()
    }
    # every doc carrying the passage reports a span as wide as it
    plen = len(PASSAGE.split())
    for i in (1, 2, 3):
        assert any(e - s + 1 >= plen for s, e, _ in got[i]), i
    assert 4 not in got and 5 not in got and 6 not in got


def test_strip_keeps_exactly_one_occurrence(spark, planted):
    rows, df = planted
    got = {
        r.id: (r.clean_text, r.n_tokens, r.n_removed)
        for r in strip_duplicated_spans(
            df, "doc_id", "text", k=K, min_count=2, portable=True
        ).collect()
    }
    exp = _py_strip({i: t for i, t in rows}, K, 2)
    assert got == exp
    assert set(got) == {1, 2, 3, 4, 5, 6}  # every doc present
    # keep-one rule: the passage survives in doc 1 (corpus-first) only
    survivors = [i for i in (1, 2, 3) if PASSAGE in got[i][0]]
    assert survivors == [1]
    assert got[1][2] == 0  # canonical doc loses nothing
    # unique / sub-k / empty docs untouched
    assert got[4] == (" ".join(_toks(rows[3][1])), 9, 0)
    assert got[5][2] == 0 and got[6] == ("", 0, 0)


def test_randomized_differential(spark):
    """5 seeded corpora: random vocab docs with pasted shared chunks,
    same-doc internal repetition, and varying k/min_count — Spark must
    match the python reference on occurrences, spans, and strip."""
    import random

    for seed in range(5):
        rng = random.Random(seed * 31337 + 5)
        vocab = [f"w{j}" for j in range(40)]
        chunk = " ".join(rng.choice(vocab) for _ in range(9))
        docs = {}
        for i in range(14):
            n = rng.choice([0, 2, 5, 10, 20])
            body = [rng.choice(vocab) for _ in range(n)]
            if rng.random() < 0.5:
                at = rng.randint(0, len(body))
                body[at:at] = chunk.split()
            if rng.random() < 0.2:  # same-doc repetition
                body += chunk.split()
            docs[i] = " ".join(body)
        k = rng.choice([3, 4, 6])
        mc = rng.choice([2, 3])
        df = spark.createDataFrame(
            list(docs.items()), "doc_id long, text string"
        )
        got_spans: dict[int, list] = {}
        for r in duplicated_spans(
            df, "doc_id", "text", k=k, min_count=mc, portable=True
        ).collect():
            got_spans.setdefault(r.id, []).append(
                (r.start_tok, r.end_tok, r.n_grams)
            )
        exp_spans = _py_spans(docs, k, mc)
        assert {i: sorted(v) for i, v in got_spans.items()} == {
            i: sorted(v) for i, v in exp_spans.items()
        }, f"seed={seed} k={k} mc={mc}"
        got_strip = {
            r.id: (r.clean_text, r.n_tokens, r.n_removed)
            for r in strip_duplicated_spans(
                df, "doc_id", "text", k=k, min_count=mc, portable=True
            ).collect()
        }
        assert got_strip == _py_strip(docs, k, mc), f"seed={seed}"


def test_min_count_validation(spark, planted):
    _, df = planted
    with pytest.raises(ValueError):
        duplicated_ngram_occurrences(df, "doc_id", "text", min_count=1)


def test_randomized_cross_engine_oracle_differential(spark):
    """The driver checks the oracle SQL on the documents fixture only;
    this runs the SAME pinned SQL (k=8, min_count=2, portable md5)
    against 4 GENERATED corpora in DuckDB and compares with the Spark
    operators value-for-value — shared pasted chunks, same-doc
    repetition, empty docs, mixed casing/whitespace."""
    import random

    import duckdb
    import pandas as pd

    from distributedqueryengine_spark.oracles import ORACLES

    for seed in range(4):
        rng = random.Random(seed * 52361 + 11)
        vocab = [f"word{j}" for j in range(60)]
        chunk = " ".join(rng.choice(vocab) for _ in range(11))  # > k=8
        docs = []
        for i in range(30):
            n = rng.choice([0, 3, 9, 15, 30])
            body = [rng.choice(vocab) for _ in range(n)]
            if rng.random() < 0.5:
                at = rng.randint(0, len(body))
                body[at:at] = chunk.upper().split() if rng.random() < 0.3 else chunk.split()
            text = "  ".join(body) if rng.random() < 0.2 else " ".join(body)
            docs.append((i, text))
        pdf = pd.DataFrame(docs, columns=["doc_id", "text"])
        con = duckdb.connect()
        con.register("documents", pdf)
        df = spark.createDataFrame(docs, "doc_id long, text string")

        got_spans = {
            tuple(r)
            for r in SD.duplicated_spans(
                df, "doc_id", "text", k=8, min_count=2, portable=True
            ).select("id", "start_tok", "end_tok", "n_grams").collect()
        }
        exp_spans = {tuple(r) for r in con.execute(ORACLES["dedup_substr_spans"]).fetchall()}
        assert got_spans == exp_spans, f"seed={seed} spans"

        got_strip = {
            tuple(r)
            for r in SD.strip_duplicated_spans(
                df, "doc_id", "text", k=8, min_count=2, portable=True
            ).select("id", "clean_text", "n_tokens", "n_removed").collect()
        }
        exp_strip = {tuple(r) for r in con.execute(ORACLES["dedup_substr_strip"]).fetchall()}
        assert got_strip == exp_strip, f"seed={seed} strip"
        con.close()
