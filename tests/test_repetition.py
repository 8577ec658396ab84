"""Within-document repetition battery (functions/text.repetition_profile)
vs a pure-Python reference implementing the same definitions."""

from __future__ import annotations

import re
from collections import Counter

import pytest

from distributedqueryengine_spark.functions.text import repetition_profile


def _ref_profile(text: str, top_ns=(2, 3, 4), dup_ns=(5, 10)) -> dict:
    tc = max(len(text), 1)
    out: dict[str, float] = {}

    def unit_fracs(units):
        if not units:
            return 0.0, 0.0
        cnt = Counter(units)
        total = len(units)
        dist = len(cnt)
        tchars = sum(len(u) * c for u, c in cnt.items())
        dchars = sum(len(u) * c for u, c in cnt.items() if c > 1)
        return 1.0 - dist / total, (dchars / tchars if tchars else 0.0)

    lines = [l.strip() for l in text.split("\n") if l.strip()]
    out["dup_line_frac"], out["dup_line_char_frac"] = unit_fracs(lines)
    paras = [p.strip() for p in re.split(r"\n{2,}", text) if p.strip()]
    out["dup_para_frac"], out["dup_para_char_frac"] = unit_fracs(paras)

    toks = [t for t in re.split(r"\s+", text.lower()) if t]
    for n in sorted(set(top_ns) | set(dup_ns)):
        grams = [
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        ]
        cnt = Counter(grams)
        if n in top_ns:
            if cnt:
                mc = max(cnt.values())
                cl = max(c * len(g) for g, c in cnt.items() if c == mc)
            else:
                cl = 0
            out[f"top_{n}gram_char_frac"] = cl / tc
        if n in dup_ns:
            dchars = sum(c * len(g) for g, c in cnt.items() if c > 1)
            out[f"dup_{n}gram_char_frac"] = min(dchars / tc, 1.0)
    return {k: round(v, 6) for k, v in out.items()}


DOCS = [
    (1, "the cat sat on the mat\nthe cat sat on the mat\nunique line"),
    (2, "spam spam spam spam spam spam spam spam spam spam"),
    (3, "para one here\n\npara one here\n\npara two differs"),
    (4, "all words unique in this quite ordinary sentence of text"),
    (5, ""),
    (6, "   \n \n  "),  # whitespace-only
    (7, "one two one two one two one two one two one two"),
    (8, "Line A\nline a\nLINE A"),  # lines keep case; grams lowercase
]


def test_repetition_profile_matches_reference(spark):
    df = spark.createDataFrame(
        [{"doc_id": i, "text": t} for i, t in DOCS]
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in repetition_profile(df, "doc_id", "text").collect()
    }
    assert set(got) == {i for i, _ in DOCS}  # blank docs survive as zeros
    for i, t in DOCS:
        want = _ref_profile(t)
        for k, v in want.items():
            assert got[i][k] == pytest.approx(v, abs=1e-6), (i, k, got[i][k], v)


def test_repetition_profile_flags_the_stuffed_doc(spark):
    df = spark.createDataFrame([{"doc_id": i, "text": t} for i, t in DOCS])
    prof = {r["doc_id"]: r for r in repetition_profile(df, "doc_id", "text").collect()}
    # the pure-spam doc is saturated on every n-gram signal
    assert prof[2]["top_2gram_char_frac"] > 0.8
    assert prof[2]["dup_5gram_char_frac"] > 0.8
    # the clean doc: zero on every DUPLICATION metric; the top-gram
    # coverage is nonzero by definition (a count-1 gram still covers
    # its own characters) but small
    clean = prof[4].asDict()
    for k in ("dup_line_frac", "dup_line_char_frac", "dup_para_frac",
              "dup_para_char_frac", "dup_5gram_char_frac",
              "dup_10gram_char_frac"):
        assert clean[k] == 0.0, (k, clean[k])
    assert clean["top_2gram_char_frac"] < 0.5
    # duplicated lines caught case-sensitively, grams case-insensitively
    assert prof[8]["dup_line_frac"] == 0.0
    assert prof[8]["top_2gram_char_frac"] > 0.3


def test_repetition_profile_custom_ns(spark):
    df = spark.createDataFrame([{"doc_id": 1, "text": "a b a b a b"}])
    out = repetition_profile(df, "doc_id", "text", top_ns=(2,), dup_ns=(3,))
    cols = set(out.columns)
    assert "top_2gram_char_frac" in cols and "dup_3gram_char_frac" in cols
    assert "top_3gram_char_frac" not in cols


def test_repetition_profile_randomized(spark):
    """Randomized docs with planted duplicate lines/paragraphs and
    n-gram stuffing must match the reference on every metric."""
    import random

    rng = random.Random(1117)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]
    docs = []
    for i in range(40):
        lines = []
        for _ in range(rng.randint(1, 12)):
            line = " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 9)))
            lines.append(line)
            if rng.random() < 0.4:  # planted duplicate line
                lines.append(line)
        sep = "\n\n" if rng.random() < 0.5 else "\n"
        text = sep.join(lines)
        if rng.random() < 0.3:  # planted n-gram stuffing
            text += "\n" + " ".join(["spam ham"] * rng.randint(3, 10))
        docs.append({"doc_id": i, "text": text})

    df = spark.createDataFrame(docs).repartition(4)
    got = {
        r["doc_id"]: r.asDict()
        for r in repetition_profile(df, "doc_id", "text").collect()
    }
    for d in docs:
        want = _ref_profile(d["text"])
        for k, v in want.items():
            assert got[d["doc_id"]][k] == pytest.approx(v, abs=1e-6), (
                d["doc_id"], k, got[d["doc_id"]][k], v)
