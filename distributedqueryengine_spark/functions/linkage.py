"""Record linkage: edit-distance pairs via FastSS deletion blocking.

Entity resolution over names/titles/codes needs pairs within SMALL
edit distance — a different regime from the token-based near-dup
families in dedup.py (MinHash needs shared shingles; one typo in a
short string destroys most of its 3-grams). The classic exact-recall
blocking for ed <= d is FastSS (Bocek et al. 2007): two strings within
edit distance d share at least one common variant in their
up-to-d-deletions neighborhoods, so candidates come from an equi-join
on deletion variants and an exact levenshtein filter keeps true pairs
— never an O(n²) all-pairs stage.

Scale shape: variant generation is a narrow per-row explode (O(L)
variants at d=1, O(L²) at d=2 — guarded: this operator is for SHORT
strings, and rows beyond max_len raise rather than silently exploding
the blocking index); the self-join shuffles 8-byte xxhash64 variant
keys, not variant text; hash collisions only ever ADD candidates,
which the levenshtein verification removes — recall is unaffected.
Everything is JVM expressions (split/slice/transform + built-in
levenshtein); no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _chars(c: Column) -> Column:
    # split('abc', '') -> ['a','b','c'] in Spark
    return F.split(c, "")


def deletion_variants(col: Column | str, max_dist: int) -> Column:
    """array<string>: the string plus every variant from deleting up
    to `max_dist` characters (distinct). max_dist in {1, 2}."""
    if max_dist not in (1, 2):
        raise ValueError(f"max_dist must be 1 or 2, got {max_dist}")
    c = F.col(col) if isinstance(col, str) else col
    chars = _chars(c)
    L = F.size(chars)
    seq = F.sequence(F.lit(1), F.greatest(L, F.lit(1)))

    def del1(i):
        return F.array_join(
            F.concat(F.slice(chars, 1, i - 1), F.slice(chars, i + 1, L - i)), ""
        )

    v1 = F.transform(seq, del1)

    parts = [F.array(c), v1]
    if max_dist == 2:

        def del2(i, j):
            # i < j on original indices: three untouched spans
            return F.when(
                j > i,
                F.array_join(
                    F.concat(
                        F.slice(chars, 1, i - 1),
                        F.slice(chars, i + 1, j - i - 1),
                        F.slice(chars, j + 1, L - j),
                    ),
                    "",
                ),
            )

        v2 = F.array_compact(
            F.flatten(F.transform(seq, lambda i: F.transform(seq, lambda j: del2(i, j))))
        )
        parts.append(v2)
    return F.array_distinct(F.concat(*parts))


def edit_distance_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_dist: int = 1,
    max_len: int = 64,
) -> DataFrame:
    """(id_a, id_b, dist): all pairs with levenshtein(text) <= max_dist
    (id_a < id_b). Exact recall by the FastSS guarantee; candidates
    come from an equi-join on hashed deletion variants, so the shuffle
    carries (variant_hash, id) rows only. Rows longer than `max_len`
    raise — the O(L^d) blocking index is for short strings (names,
    titles, codes); chunk or fingerprint longer text with dedup.py's
    families instead."""
    too_long = df.filter(F.length(text_col) > max_len).limit(1).count()
    if too_long:
        raise ValueError(
            f"{text_col} exceeds max_len={max_len}; FastSS blocking is "
            "for short strings — use dedup.py near-dup families for documents"
        )
    base = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("s"))
    variants = base.select(
        "id", "s", F.explode(deletion_variants("s", max_dist)).alias("v")
    ).select("id", "s", F.xxhash64("v").alias("vh"))
    a, b = variants.alias("a"), variants.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.vh") == F.col("b.vh")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.s").alias("s_a"),
            F.col("b.s").alias("s_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn("dist", F.levenshtein("s_a", "s_b"))
        .filter(F.col("dist") <= max_dist)
        .select("id_a", "id_b", F.col("dist").cast("int").alias("dist"))
    )
