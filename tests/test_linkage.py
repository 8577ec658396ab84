"""FastSS edit-distance linkage tests: exact-set equality with a
brute-force levenshtein scan over a typo-planted name corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributedqueryengine_spark.functions.linkage import (
    deletion_variants,
    edit_distance_pairs,
)


def _lev(a: str, b: str) -> int:
    m, n = len(a), len(b)
    dp = list(range(n + 1))
    for i in range(1, m + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, n + 1):
            prev, dp[j] = dp[j], min(
                dp[j] + 1, dp[j - 1] + 1, prev + (a[i - 1] != b[j - 1])
            )
    return dp[n]


@pytest.fixture(scope="module")
def names(spark):
    base = [
        "john smith", "jon smith", "john smyth", "johnsmith",
        "mary johnson", "mary jonson", "marie johnson",
        "acme corp", "acme corp.", "acme co",
        "wilhelmina vanderbilt", "wilhelmina vanderbild",
        "x", "y", "xy", "",
        "data engine", "data engines", "date engine", "data enginee",
    ] + [f"unique entity {i:03d}" for i in range(60)]
    return spark.createDataFrame(
        [(i, s) for i, s in enumerate(base)], "id long, s string"
    ).persist()


@pytest.mark.parametrize("d", [1, 2])
def test_edit_distance_pairs_match_bruteforce(spark, names, d):
    rows = {r.id: r.s for r in names.collect()}
    expect = {
        (a, b, _lev(rows[a], rows[b]))
        for a in rows
        for b in rows
        if a < b and _lev(rows[a], rows[b]) <= d
    }
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in edit_distance_pairs(names, "id", "s", max_dist=d).collect()
    }
    assert got == expect, f"d={d}: missing={expect - got} extra={got - expect}"
    assert len(got) >= (8 if d == 1 else 12)  # planted typos found


def test_deletion_variants_counts(spark):
    df = spark.createDataFrame([("abcd",)], "s string")
    v1 = df.select(deletion_variants("s", 1).alias("v")).first().v
    assert set(v1) == {"abcd", "bcd", "acd", "abd", "abc"}
    v2 = df.select(deletion_variants("s", 2).alias("v")).first().v
    # original + 4 single deletions + C(4,2)=6 double deletions
    assert set(v2) == set(v1) | {"cd", "bd", "bc", "ad", "ac", "ab"}


def test_edit_distance_pairs_rejects_long_strings(spark):
    df = spark.createDataFrame([(1, "x" * 100)], "id long, s string")
    with pytest.raises(ValueError, match="max_len"):
        edit_distance_pairs(df, "id", "s", max_dist=1)
