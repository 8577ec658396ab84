"""BPE vocabulary induction + application (functions/bpe.py).

Verification: a NAIVE pure-python reference (full pair recount every
merge — no inverted index, no heap) must produce the identical merge
table on planted and randomized corpora; application is pinned by
lossless invertibility and by consistency with the learner's own
final segmentations."""

from __future__ import annotations

import pytest

from distributedqueryengine_spark.functions.bpe import (
    END,
    apply_bpe,
    bpe_segment_word,
    learn_bpe,
    learn_bpe_from_counts,
    word_type_counts,
)


def _naive_learn(counts: dict[str, int], n_merges: int, min_frequency: int = 2):
    """Textbook BPE: recount every pair from scratch each iteration."""
    vocab = {tuple(list(w) + [END]): c for w, c in counts.items() if w}
    merges = []
    for _ in range(n_merges):
        pairs: dict[tuple, int] = {}
        for seq, c in vocab.items():
            for p in zip(seq, seq[1:]):
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        best_c = max(pairs.values())
        if best_c < min_frequency:
            break
        best = min(p for p, c in pairs.items() if c == best_c)
        merges.append(best)
        out = {}
        for seq, c in vocab.items():
            seq = list(seq)
            new, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and (seq[i], seq[i + 1]) == best:
                    new.append(seq[i] + seq[i + 1])
                    i += 2
                else:
                    new.append(seq[i])
                    i += 1
            out[tuple(new)] = out.get(tuple(new), 0) + c
        vocab = out
    return merges


def test_learner_matches_naive_reference_planted():
    counts = {
        "low": 5, "lower": 2, "newest": 6, "widest": 3, "new": 2,
        "a": 7, "": 3,
    }
    for n in (1, 5, 10, 40):
        assert learn_bpe_from_counts(counts, n) == _naive_learn(counts, n)


def test_learner_matches_naive_reference_randomized():
    import random

    for seed in range(8):
        rng = random.Random(seed * 7919 + 3)
        alpha = "abcdef"
        counts = {}
        for _ in range(rng.randint(5, 60)):
            w = "".join(rng.choice(alpha) for _ in range(rng.randint(1, 9)))
            counts[w] = counts.get(w, 0) + rng.randint(1, 30)
        n = rng.choice([3, 10, 25, 80])
        mf = rng.choice([2, 3, 5])
        got = learn_bpe_from_counts(counts, n, min_frequency=mf)
        exp = _naive_learn(counts, n, min_frequency=mf)
        assert got == exp, f"seed={seed} n={n} mf={mf}"


def test_segmentation_invertible_and_consistent():
    counts = {"banana": 8, "bandana": 4, "anagram": 3, "nab": 5}
    merges = learn_bpe_from_counts(counts, 12)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in counts:
        seg = bpe_segment_word(w, ranks)
        assert "".join(seg) == w + END  # lossless
        # applying the ranked merges reproduces the learner's own
        # final segmentation of its training words
        assert seg == _final_segmentation(counts, merges)[w]


def _final_segmentation(counts, merges):
    vocab = {w: list(w) + [END] for w in counts if w}
    for a, b in merges:
        for w, seq in vocab.items():
            new, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    new.append(a + b)
                    i += 2
                else:
                    new.append(seq[i])
                    i += 1
            vocab[w] = new
    return vocab


def test_min_frequency_stops_early():
    counts = {"ab": 3, "cd": 1}
    merges = learn_bpe_from_counts(counts, 100, min_frequency=2)
    # only pairs with count >= 2 merge: a+b (3), ab+</w> (3); the cd
    # word's pairs are frequency 1 and never merge
    assert merges == [("a", "b"), ("ab", END)]


def test_distributed_word_counts_and_learn(spark, tables):
    docs = tables["documents"].limit(300)
    wc = {r.word: r.cnt for r in word_type_counts(docs, "text").collect()}
    # differential vs python counting on the same rows
    py: dict[str, int] = {}
    for r in docs.select("text").collect():
        for w in " ".join((r.text or "").lower().split()).split(" "):
            if w:
                py[w] = py.get(w, 0) + 1
    assert wc == py
    # capped table keeps the top-N by (count desc, word asc)
    top = word_type_counts(docs, "text", max_word_types=20).collect()
    exp_top = sorted(py.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert sorted((r.word, r.cnt) for r in top) == sorted(exp_top)
    # end-to-end induction == driver reference over the same counts
    assert learn_bpe(docs, "text", 30) == learn_bpe_from_counts(py, 30)


def test_apply_bpe_distributed(spark):
    rows = [
        (1, "lower lowest newest"),
        (2, "the newest lower newest"),
        (3, ""),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = learn_bpe(df, "text", 20, min_frequency=2)
    got = {r.id: (r.tokens, r.n_tokens)
           for r in apply_bpe(df, "doc_id", "text", merges).collect()}
    ranks = {p: i for i, p in enumerate(merges)}
    for i, text in rows:
        exp = []
        for w in " ".join((text or "").lower().split()).split(" "):
            if w:
                exp.extend(bpe_segment_word(w, ranks))
        assert got[i] == (exp, len(exp)), i
    # invertibility: tokens reconstruct the normalized text
    toks, _ = got[2 - 1]
    assert "".join(toks).replace(END, " ").strip() == "lower lowest newest"


def test_empty_merge_table_is_character_level(spark):
    df = spark.createDataFrame([(1, "ab ba")], "doc_id long, text string")
    got = apply_bpe(df, "doc_id", "text", []).collect()[0]
    assert got.tokens == ["a", "b", END, "b", "a", END]


def test_learn_bpe_rejects_nothing_gracefully():
    assert learn_bpe_from_counts({}, 10) == []
    assert learn_bpe_from_counts({"": 5}, 10) == []
    with pytest.raises(Exception):
        # a non-int merge budget should fail loudly, not loop forever
        learn_bpe_from_counts({"ab": 3}, "many")  # type: ignore[arg-type]
