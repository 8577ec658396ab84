"""BPE vocabulary induction and application (subword tokenization).

Public method (Sennrich et al. 2016, "Neural Machine Translation of
Rare Words with Subword Units"): learn a merge table by repeatedly
merging the most frequent adjacent symbol pair over the corpus's
WORD-TYPE frequency table, then tokenize text by replaying the merges
in rank order. `functions/text.py` already counts GPT-2-style
pre-tokens; this module learns an actual vocabulary from the corpus —
what a from-scratch tokenizer build over training data needs.

Spark-first decomposition (the same split the original algorithm
implies): the CORPUS-SIZED work is exactly one scan — word-type
counting (explode + hash aggregation, map-side combined) — because BPE
learning never looks at the corpus again, only at the (word, count)
table, whose size is the VOCABULARY of the corpus, not its volume.
That table is capped (`max_word_types`, top by count — a TakeOrdered,
documented lossy knob) and collected as model-sized driver state, the
same contract as k-means centroids (`similarity.train_ivf_centroids`)
or the Misra-Gries monitors. The merge loop itself is the standard
incremental-update algorithm (pair→words inverted index, only words
containing the merged pair are retouched). Application is distributed
again: the ranked merge table broadcasts to an Arrow-batched pandas
UDF with per-batch word memoization (Zipf makes the hit rate high).

Determinism: ties on pair count break to the lexicographically
smallest pair — the induced merge table is a pure function of the
(word, count) table on any engine or cluster layout.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type hints resolve in globals
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from distributedqueryengine_spark.functions.text import normalize_text

__all__ = [
    "word_type_counts",
    "learn_bpe_from_counts",
    "learn_bpe",
    "apply_bpe",
    "bpe_segment_word",
]

END = "</w>"  # end-of-word marker: keeps merges word-internal


def word_type_counts(
    df: DataFrame,
    text_col: str,
    max_word_types: int | None = None,
) -> DataFrame:
    """(word, cnt): corpus word-type frequencies over normalized
    whitespace tokens — the ONLY corpus-sized pass BPE learning needs.
    `max_word_types` keeps the top-N types by count (ties to the
    lexicographically smaller word — deterministic); rare tail types
    barely move merge statistics but dominate table size under Zipf."""
    toks = F.filter(
        F.split(normalize_text(text_col), " "), lambda t: F.length(t) > 0
    )
    counts = (
        df.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    if max_word_types is not None:
        counts = counts.orderBy(
            F.col("cnt").desc(), F.col("word").asc()
        ).limit(int(max_word_types))
    return counts


def learn_bpe_from_counts(
    counts: dict[str, int],
    n_merges: int,
    min_frequency: int = 2,
) -> list[tuple[str, str]]:
    """The merge table from a (word -> count) dict — pure python,
    incremental-update (Sennrich's algorithm): a pair→words inverted
    index means each merge retouches only the words containing the
    merged pair. Stops early when no pair reaches min_frequency.
    Deterministic: max count, ties to the lexicographically smallest
    pair."""
    import heapq
    from collections import defaultdict

    words = []  # symbol sequences
    freqs = []
    for w in sorted(counts):
        if not w:
            continue
        words.append(list(w) + [END])
        freqs.append(int(counts[w]))

    pair_counts: dict[tuple[str, str], int] = defaultdict(int)
    pair_words: dict[tuple[str, str], set[int]] = defaultdict(set)
    # Lazy max-heap over (-count, pair): every count CHANGE pushes a
    # fresh entry; pops discard entries whose count is stale. Finding
    # the best pair is then O(log) amortized instead of a full
    # pair-table scan per merge. (-count, pair) ordering realizes the
    # tie rule: max count, then lexicographically smallest pair.
    heap: list[tuple[int, tuple[str, str]]] = []

    def add_word(wi: int, sign: int) -> None:
        seq = words[wi]
        for a, b in zip(seq, seq[1:]):
            c = pair_counts[(a, b)] = pair_counts[(a, b)] + sign * freqs[wi]
            if c > 0:
                heapq.heappush(heap, (-c, (a, b)))
            if sign > 0:
                pair_words[(a, b)].add(wi)

    for wi in range(len(words)):
        add_word(wi, +1)

    merges: list[tuple[str, str]] = []
    for _ in range(int(n_merges)):
        best, best_c = None, 0
        while heap:
            neg_c, p = heapq.heappop(heap)
            if pair_counts.get(p, 0) == -neg_c:
                best, best_c = p, -neg_c
                break
        if best is None or best_c < min_frequency:
            break
        merges.append(best)
        merged = best[0] + best[1]
        for wi in list(pair_words[best]):
            seq = words[wi]
            if best not in set(zip(seq, seq[1:])):
                continue  # stale index entry from an earlier rewrite
            add_word(wi, -1)
            out, i = [], 0
            while i < len(seq):
                if (
                    i + 1 < len(seq)
                    and seq[i] == best[0]
                    and seq[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            words[wi] = out
            add_word(wi, +1)
        pair_counts.pop(best, None)
        pair_words.pop(best, None)
    return merges


def learn_bpe(
    df: DataFrame,
    text_col: str,
    n_merges: int,
    min_frequency: int = 2,
    max_word_types: int = 1_000_000,
) -> list[tuple[str, str]]:
    """End-to-end BPE induction: one distributed word-count scan, then
    the driver-side merge loop over the capped (word, count) table.
    Returns the ranked merge list (model-sized — n_merges pairs)."""
    rows = word_type_counts(df, text_col, max_word_types).collect()
    return learn_bpe_from_counts(
        {r["word"]: r["cnt"] for r in rows}, n_merges, min_frequency
    )


def bpe_segment_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Tokenize ONE word by replaying merges in rank order (lowest
    rank first) — the standard BPE encoder."""
    seq = list(word) + [END]
    while len(seq) > 1:
        best_i, best_r = -1, None
        for i, p in enumerate(zip(seq, seq[1:])):
            r = ranks.get(p)
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_r is None:
            break
        seq[best_i : best_i + 2] = [seq[best_i] + seq[best_i + 1]]
    return seq


def apply_bpe(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """(id, tokens, n_tokens): BPE-tokenize every document with the
    learned merge table. Arrow-batched pandas UDF; the merge table
    broadcasts inside the closure (n_merges pairs — model-sized), and
    a per-batch word→segmentation memo exploits Zipf (most tokens in a
    batch are repeats). Tokens carry the </w> marker on word-final
    subwords, so the segmentation is losslessly invertible."""
    from pyspark.sql.functions import pandas_udf

    ranks = {tuple(p): i for i, p in enumerate(merges)}

    @pandas_udf("array<string>")
    def seg(texts: pd.Series) -> pd.Series:
        memo: dict[str, list[str]] = {}

        def one(text):
            if text is None:
                return []
            out: list[str] = []
            for w in " ".join(str(text).lower().split()).split(" "):
                if not w:
                    continue
                got = memo.get(w)
                if got is None:
                    got = memo[w] = bpe_segment_word(w, ranks)
                out.extend(got)
            return out

        return texts.map(one)

    return df.select(
        F.col(id_col).alias("id"), seg(F.col(text_col)).alias("tokens")
    ).withColumn("n_tokens", F.size("tokens"))
