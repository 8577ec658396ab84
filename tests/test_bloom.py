"""Bloom-filter sketch: no false negatives, merge ≡ direct build,
DuckDB bit-identity in portable mode, broadcast-only probe plan, and
bloom_prefilter_semi_join ≡ plain LEFT SEMI."""
from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from distributedqueryengine_spark.functions.bloom import (
    bloom_build,
    bloom_merge,
    bloom_prefilter_semi_join,
    bloom_probe,
    bloom_size,
)

N_BITS, K = 4096, 5


@pytest.fixture(scope="module")
def members(spark):
    return spark.createDataFrame(
        [(i * 13 + 1,) for i in range(60)], "v int"
    )


@pytest.fixture(scope="module")
def state(members):
    return bloom_build(members, "v", N_BITS, K).localCheckpoint()


def test_bloom_size_formula():
    n_bits, k = bloom_size(1000, 0.01)
    assert n_bits % 32 == 0
    assert 9000 <= n_bits <= 10100  # -n ln p / ln2^2 ≈ 9585
    assert k == 7
    with pytest.raises(ValueError):
        bloom_size(0)
    with pytest.raises(ValueError):
        bloom_size(10, 1.5)


def test_no_false_negatives_and_low_fp(spark, state, members):
    probe = spark.createDataFrame([(i,) for i in range(2000)], "v int")
    out = bloom_probe(state, probe, "v", N_BITS, K)
    member_vals = {r.v for r in members.collect()}
    passed = {r.v for r in out.where("bloom_pass").collect()}
    assert member_vals <= passed, "false negative — structurally impossible"
    # fp rate at n=60, m=4096, k=5: (1-e^{-kn/m})^k ≈ 3e-6; allow 1%
    fps = passed - member_vals
    assert len(fps) <= 0.01 * 2000 + 2


def test_null_probe_values_fail_closed(spark, state):
    probe = spark.createDataFrame([(None,), (1,)], "v int")
    rows = {r.v: r.bloom_pass for r in
            bloom_probe(state, probe, "v", N_BITS, K).collect()}
    assert rows[None] is False
    assert rows[1] is True  # 1 = 0*13+1 is a member


def test_nulls_skipped_in_build(spark):
    st = bloom_build(
        spark.createDataFrame([(None,), (7,)], "v int"), "v", N_BITS, K
    )
    direct = bloom_build(
        spark.createDataFrame([(7,)], "v int"), "v", N_BITS, K
    )
    assert sorted((r.word_idx, r.word) for r in st.collect()) == sorted(
        (r.word_idx, r.word) for r in direct.collect()
    )


def test_merge_equals_direct_build(spark, members):
    half_a = members.where(F.col("v") < 300)
    half_b = members.where(F.col("v") >= 300)
    merged = bloom_merge(
        [bloom_build(half_a, "v", N_BITS, K), bloom_build(half_b, "v", N_BITS, K)]
    )
    direct = bloom_build(members, "v", N_BITS, K)
    assert sorted((r.word_idx, r.word) for r in merged.collect()) == sorted(
        (r.word_idx, r.word) for r in direct.collect()
    )


def test_merge_mixed_geometry_raises(spark, members):
    a = bloom_build(members, "v", N_BITS, K)
    b = bloom_build(members, "v", N_BITS * 2, K)
    with pytest.raises(Exception, match="mixed"):
        bloom_merge([a, b]).collect()


def test_duckdb_bit_identity(spark, members):
    """Portable mode: the word table reproduces bit-for-bit in DuckDB
    from the documented md5 recipe — the contract the approx_sketches
    bloom_passed oracle row relies on."""
    got = sorted(
        (r.word_idx, r.word)
        for r in bloom_build(members, "v", N_BITS, K, portable=True).collect()
    )
    vals = ",".join(f"({r.v})" for r in members.collect())
    want = duckdb.connect().execute(f"""
        SELECT p // 32 AS wi, bit_or(1::BIGINT << CAST(p % 32 AS INT)) AS w
        FROM (SELECT CAST('0x' || substr(md5(CAST(v AS VARCHAR) || '#'
                          || CAST(i AS VARCHAR)), 1, 15) AS BIGINT)
                     % {N_BITS} AS p
              FROM (VALUES {vals}) t(v) CROSS JOIN range({K}) r(i))
        GROUP BY 1 ORDER BY 1
    """).fetchall()
    assert got == [(wi, w) for wi, w in want]


def test_global_probe_is_pure_projection(spark, state, members):
    """Global filters fold the dense word array into one literal: the
    probe is joins-free, shuffle-free whole-stage-codegen projection."""
    probe = spark.createDataFrame([(i,) for i in range(100)], "v int")
    plan = (
        bloom_probe(state, probe, "v", N_BITS, K)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan and "Exchange" not in plan
    assert "*(1)" in plan  # whole-stage codegen span


def test_large_filter_udf_path(spark, members):
    """n_bits > 2²² switches to the sc.broadcast + Arrow lookup path —
    same verdicts as the literal path."""
    big_bits = (1 << 22) * 2
    st = bloom_build(members, "v", big_bits, K).localCheckpoint()
    probe = spark.createDataFrame([(i,) for i in range(1000)], "v int")
    small = bloom_probe(
        bloom_build(members, "v", N_BITS, K), probe, "v", N_BITS, K
    )
    big = bloom_probe(st, probe, "v", big_bits, K)
    member_vals = {r.v for r in members.collect()}
    passed_big = {r.v for r in big.where("bloom_pass").collect()}
    assert member_vals <= passed_big
    # larger filter ⇒ no more false positives than the small one
    assert passed_big <= {r.v for r in small.where("bloom_pass").collect()}
    plan = big._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_grouped_probe_is_broadcast_only(spark):
    df = spark.createDataFrame(
        [("a", i) for i in range(20)] + [("b", 99)], "g string, v int"
    )
    st = bloom_build(df, "v", N_BITS, K, keys=["g"])
    probe = spark.createDataFrame([("a", 1), ("b", 2)], "g string, v int")
    plan = (
        bloom_probe(st, probe, "v", N_BITS, K, keys=["g"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("BroadcastHashJoin") == K
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_grouped_blooms(spark):
    """Per-group states: a value present in group 'a' only must not
    pass the probe under group 'b'."""
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 99)], "g string, v int"
    )
    st = bloom_build(df, "v", N_BITS, K, keys=["g"])
    probe = spark.createDataFrame(
        [("a", 1), ("b", 1), ("b", 99)], "g string, v int"
    )
    rows = {(r.g, r.v): r.bloom_pass for r in
            bloom_probe(st, probe, "v", N_BITS, K, keys=["g"]).collect()}
    assert rows[("a", 1)] is True
    assert rows[("b", 99)] is True
    assert rows[("b", 1)] is False


def test_prefilter_semi_join_parity(spark, tables):
    """Exactly the rows of the plain LEFT SEMI join, on real tables —
    orders restricted to customers of one market segment."""
    cust = tables["customer"].where(F.col("c_mktsegment") == "AUTOMOBILE")
    orders = tables["orders"]
    got = bloom_prefilter_semi_join(
        orders, cust.select("c_custkey"), "o_custkey", "c_custkey",
        n_items_hint=200,
    )
    exp = orders.join(
        cust.select("c_custkey"),
        orders["o_custkey"] == cust["c_custkey"],
        "left_semi",
    )
    assert sorted(r.o_orderkey for r in got.collect()) == sorted(
        r.o_orderkey for r in exp.collect()
    )


def test_build_validation(spark, members):
    with pytest.raises(ValueError, match="multiple"):
        bloom_build(members, "v", 100, 3)
    with pytest.raises(ValueError, match="n_hashes"):
        bloom_build(members, "v", 1024, 0)


def test_fast_mode_no_false_negatives_and_semi_parity(spark, members, tables):
    """Default (xxhash64) mode: same guarantees, ~10x cheaper hash —
    no false negatives and exact semi-join parity."""
    st = bloom_build(members, "v", N_BITS, K)  # portable=False default
    probe = spark.createDataFrame([(i,) for i in range(1000)], "v int")
    passed = {r.v for r in
              bloom_probe(st, probe, "v", N_BITS, K).where("bloom_pass").collect()}
    assert {r.v for r in members.collect()} <= passed
    cust = tables["customer"].where(F.col("c_mktsegment") == "AUTOMOBILE")
    got = bloom_prefilter_semi_join(
        tables["orders"], cust.select("c_custkey"), "o_custkey", "c_custkey",
        n_items_hint=200, portable=False,
    )
    exp = tables["orders"].join(
        cust.select("c_custkey"),
        tables["orders"]["o_custkey"] == cust["c_custkey"], "left_semi",
    )
    assert sorted(r.o_orderkey for r in got.collect()) == sorted(
        r.o_orderkey for r in exp.collect()
    )
