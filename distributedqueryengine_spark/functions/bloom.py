"""Mergeable Bloom-filter sketch and Bloom-prefiltered semi join.

The reference engine's only join-reduction machinery is shipping whole
row sets between nodes (`RPC.cs:248-310` materializes both join inputs
at the coordinator); a 100 TB engine needs the opposite: shrink the fact
side BEFORE it moves. This module provides the classic runtime-filter
building block as a first-class, mergeable sketch:

- state  = a SPARSE word table `(group_keys..., word_idx int, word long)`
  holding only 32-bit words with at least one set bit (stored in a
  long; bit 31 stays below the sign bit so `&`/`<<` agree across
  engines). `n_bits/32` rows max per group — a 4M-bit filter is 128k
  small rows ≈ 1.5 MB, always broadcastable.
- build  = project k bit positions per value (portable md5 hashing, see
  below), explode, partial-aggregate `bit_or` per word — fully
  algebraic, map-side combined, one shuffle of word-sized rows.
- merge  = union states + `bit_or` per (keys, word_idx). Merge of
  partial blooms is EXACTLY the bloom of the union — pinned in tests.
- probe  = k broadcast left joins on `word_idx` (no shuffle of the
  probe side at all; each join is a map-side hash lookup against the
  broadcast word table). A missing word row means "all 32 bits zero".

Hashing is engine-portable by construction: position_i(v) =
`portable_hash64(concat(v, '#', i)) % n_bits` where portable_hash64 is
the 60-bit md5 prefix documented in `dedup.portable_hash64` (DuckDB
mirror: `CAST('0x' || substr(md5(x),1,15) AS BIGINT)`). Every bit —
hence every probe verdict and false-positive count — is reproducible in
DuckDB SQL, which is what lets the driver oracle value-check the sketch
itself, not just an error bound.

Guarantee: NO false negatives, ever (deterministic bit math). So
`bloom_prefilter_semi_join` returns EXACTLY the rows of a plain
LEFT SEMI join — the bloom only drops rows the exact join would drop —
while the shuffle that the semi join pays sees only the pre-passed
fraction (target_fpr + true-match rate) of the fact table. At 100 TB
that is the difference between shuffling 100 TB and shuffling the ~1%
that can match.

Sizing: for target false-positive rate p and n distinct keys, optimal
n_bits ≈ -n·ln(p)/ln(2)² and k ≈ (n_bits/n)·ln(2); `bloom_size`
computes both.
"""
from __future__ import annotations

import math
from typing import Sequence

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F

from distributedqueryengine_spark.functions.dedup import portable_hash64

__all__ = [
    "bloom_size",
    "bloom_build",
    "bloom_merge",
    "bloom_probe",
    "bloom_prefilter_semi_join",
]

_WORD_BITS = 32  # stored in a long; bit 31 < sign bit, portable across engines


def bloom_size(n_items: int, target_fpr: float = 0.01) -> tuple[int, int]:
    """(n_bits, n_hashes) for `n_items` keys at `target_fpr`.

    n_bits is rounded up to a multiple of 32 (whole words); n_hashes
    clamped to [1, 16] — beyond 16 the probe's join count costs more
    than the marginal fpr is worth.
    """
    if n_items <= 0:
        raise ValueError(f"n_items must be > 0, got {n_items}")
    if not (0.0 < target_fpr < 1.0):
        raise ValueError(f"target_fpr must be in (0,1), got {target_fpr}")
    n_bits = math.ceil(-n_items * math.log(target_fpr) / (math.log(2) ** 2))
    n_bits = ((n_bits + _WORD_BITS - 1) // _WORD_BITS) * _WORD_BITS
    k = max(1, min(16, round(n_bits / n_items * math.log(2))))
    return n_bits, k


def _position(col: Column, i: int, n_bits: int, portable: bool) -> Column:
    """Bit position i for a value.

    portable=True: portable_hash64(v || '#' || i) % n_bits — md5-based,
    reproducible in DuckDB (oracle mode). Values are cast to string so
    build and probe agree as long as both sides hold the same type
    (ints render identically in Spark and DuckDB).
    portable=False (production): xxhash64, native and ~10× cheaper —
    the same dual-mode discipline as the quantile/KMV sketches.
    Non-negative in both modes (60-bit prefix / pmod).
    """
    salted = F.concat(col.cast("string"), F.lit(f"#{i}"))
    if portable:
        return portable_hash64(salted) % F.lit(n_bits)
    return F.pmod(F.xxhash64(salted), F.lit(n_bits))


def _mask(pos: Column) -> Column:
    """1 << (pos % 32) as a long, via pow-free integer arithmetic.

    F.shiftleft only takes a literal shift amount, so encode the shift
    as exp2 over an integer: shiftleft(1, b) == cast(pow(2, b) as long)
    is exact for b < 53 (double mantissa) and b here is < 32.
    """
    b = (pos % _WORD_BITS).cast("int")
    return F.pow(F.lit(2.0), b.cast("double")).cast("long")


def bloom_build(
    df: DataFrame,
    col: str,
    n_bits: int,
    n_hashes: int,
    keys: Sequence[str] = (),
    portable: bool = False,
) -> DataFrame:
    """Build per-group Bloom states: (keys..., word_idx, word, n_bits,
    n_hashes). NULL values are skipped (a NULL key matches nothing in a
    semi join, so it contributes no bits).

    One explode (k rows per input row, each a 12-byte (int, long)
    pair) + one partial-aggregated `bit_or` shuffle on
    (keys, word_idx) — at most n_bits/32 groups per key. No driver
    collection; the state is a DataFrame and composes lazily.
    """
    if n_bits % _WORD_BITS:
        raise ValueError(f"n_bits must be a multiple of {_WORD_BITS}")
    if not (1 <= n_hashes <= 16):
        raise ValueError(f"n_hashes must be in [1,16], got {n_hashes}")
    c = F.col(col)
    positions = F.array(
        *[_position(c, i, n_bits, portable) for i in range(n_hashes)]
    )
    exploded = (
        df.where(c.isNotNull())
        .select(*keys, F.explode(positions).alias("__pos"))
        .select(
            *keys,
            (F.col("__pos") / _WORD_BITS).cast("int").alias("word_idx"),
            _mask(F.col("__pos")).alias("__mask"),
        )
    )
    return (
        exploded.groupBy(*keys, "word_idx")
        .agg(F.bit_or("__mask").alias("word"))
        .withColumn("n_bits", F.lit(n_bits))
        .withColumn("n_hashes", F.lit(n_hashes))
    )


def bloom_merge(states: Sequence[DataFrame], keys: Sequence[str] = ()) -> DataFrame:
    """OR partial Bloom states together: bloom(A) ⊔ bloom(B) ≡
    bloom(A ∪ B) exactly (bitwise OR is the union of set bits). States
    must share n_bits/n_hashes — enforced in-plan: a mixed-geometry
    merge raises at action time via an assert column, not silently
    unioned."""
    if not states:
        raise ValueError("states must be non-empty")
    u = states[0]
    for s in states[1:]:
        u = u.unionByName(s)
    # Geometry check must be GLOBAL (a per-word check misses states
    # whose set words don't overlap) and must live in a column the
    # consumer keeps, or Catalyst prunes it away. One-row aggregate,
    # broadcast cross join, raise folded into `word` itself.
    geom = u.agg(
        (
            (F.count_distinct("n_bits") == 1)
            & (F.count_distinct("n_hashes") == 1)
        ).alias("__geom_ok")
    )
    merged = (
        u.groupBy(*keys, "word_idx")
        .agg(
            F.bit_or("word").alias("word"),
            F.first("n_bits").alias("n_bits"),
            F.first("n_hashes").alias("n_hashes"),
        )
        .join(F.broadcast(geom))
        .withColumn(
            "word",
            F.when(F.col("__geom_ok"), F.col("word")).otherwise(
                F.raise_error(
                    F.lit("bloom_merge: mixed n_bits/n_hashes states")
                )
            ),
        )
        .drop("__geom_ok")
    )
    return merged


def bloom_probe(
    state: DataFrame,
    probe: DataFrame,
    col: str,
    n_bits: int,
    n_hashes: int,
    keys: Sequence[str] = (),
    out_col: str = "bloom_pass",
    portable: bool = False,
) -> DataFrame:
    """probe + boolean `out_col`: True iff all k bits are set (possible
    member — no false negatives), False = definitely absent. NULL probe
    values get False (NULL never equi-joins).

    Plan shape — zero shuffle of the probe side in every case. The word
    table is STRUCTURALLY bounded (≤ n_bits/32 rows regardless of how
    many keys were inserted), so probing materializes it once (a
    runtime filter must exist before it can filter) and then:

    - global filter, n_bits ≤ 2²²: the dense words array becomes ONE
      array literal and the whole probe is a pure JVM projection
      (element_at + bit masks) inside whole-stage codegen — no joins
      at all. ≤ 1 MB of plan literal.
    - global filter, larger: the dense array ships via sc.broadcast
      and an Arrow-batched pandas UDF does the (batch × k) numpy
      lookup; positions are still computed JVM-side.
    - grouped filter (keys): k broadcast LEFT joins against an EAGER
      localCheckpoint of the word table (Spark does not reuse the k
      identical broadcast subplans on its own — checkpointing pins the
      build to one execution).

    n_bits / n_hashes are passed (not read from the state rows) so the
    probe expressions are foldable; callers get them from `bloom_size`.
    """
    c = F.col(col)
    if not keys:
        n_words = n_bits // _WORD_BITS
        rows = state.select("word_idx", "word").collect()
        dense = [0] * n_words
        for r in rows:
            dense[r["word_idx"]] = r["word"]
        positions = [_position(c, i, n_bits, portable) for i in range(n_hashes)]
        if n_bits <= (1 << 22):
            # one parsed SQL literal — F.lit(list) would marshal the
            # array element-by-element over py4j (seconds at 8k words)
            arr = F.expr(
                "array(" + ",".join(f"{w}L" for w in dense) + ")"
            )
            hits = [
                (
                    F.element_at(
                        arr, (p / _WORD_BITS).cast("int") + 1
                    ).bitwiseAND(_mask(p))
                    != 0
                )
                for p in positions
            ]
            all_hit = hits[0]
            for h in hits[1:]:
                all_hit = all_hit & h
            return probe.withColumn(out_col, c.isNotNull() & all_hit)

        from pyspark.sql.functions import pandas_udf

        sc = probe.sparkSession.sparkContext
        bc = sc.broadcast(np.array(dense, dtype=np.int64))

        @pandas_udf("boolean")
        def _probe_udf(pos_arr: pd.Series) -> pd.Series:
            words = bc.value
            P = np.vstack(pos_arr.to_numpy()).astype(np.int64)  # (batch, k)
            masks = np.int64(1) << (P % _WORD_BITS).astype(np.int64)
            hit = (words[P // _WORD_BITS] & masks) != 0
            return pd.Series(hit.all(axis=1))

        pos_col = F.array(*positions)
        return probe.withColumn(
            out_col,
            F.when(c.isNull(), F.lit(False)).otherwise(_probe_udf(pos_col)),
        )

    # grouped path: per-key word tables can't fold into one literal;
    # pin the build to a single execution, then k broadcast joins
    words = state.select(*keys, F.col("word_idx"), F.col("word")).localCheckpoint()
    out = probe.alias("__bprobe")
    hit_cols = []
    for i in range(n_hashes):
        pos = _position(c, i, n_bits, portable)
        widx = (pos / _WORD_BITS).cast("int")
        w = words.alias(f"__bloom{i}")
        cond = widx == F.col(f"__bloom{i}.word_idx")
        for k in keys:
            cond = cond & (
                F.col(f"__bprobe.{k}") == F.col(f"__bloom{i}.{k}")
            )
        out = out.join(F.broadcast(w), on=cond, how="left")
        hit = (
            F.coalesce(F.col(f"__bloom{i}.word"), F.lit(0)).bitwiseAND(
                _mask(pos)
            )
            != 0
        )
        hit_cols.append(hit)
    all_hit = hit_cols[0]
    for h in hit_cols[1:]:
        all_hit = all_hit & h
    return out.select(
        *[F.col(f"__bprobe.{pc}") for pc in probe.columns],
        (c.isNotNull() & all_hit).alias(out_col),
    )


def bloom_prefilter_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_items_hint: int,
    target_fpr: float = 0.01,
    portable: bool = False,
) -> DataFrame:
    """LEFT SEMI join with a Bloom runtime filter in front: EXACTLY the
    rows of `fact.join(dim, fact_key == dim_key, 'left_semi')` (no
    false negatives), but only the bloom-passed fraction of `fact`
    enters the semi-join shuffle.

    `n_items_hint` sizes the filter (≈ distinct dim keys; an over-count
    just wastes bits, an under-count raises the fpr — correctness is
    unaffected either way). The dim side is evaluated twice (once to
    build the filter, once for the exact join) — at scale that is the
    small side by assumption, and the exact join of a small dim is
    itself broadcast by AQE, so the whole plan shuffles only the
    bloom-passed fact rows. Used when dim is too big to broadcast raw
    but its BLOOM (n_bits/32 longs) still is: a 100M-key dim at 1%
    fpr is a ~120 MB raw broadcast vs a ~15 MB word table.
    """
    n_bits, k = bloom_size(n_items_hint, target_fpr)
    state = bloom_build(
        dim.select(F.col(dim_key)), dim_key, n_bits, k, portable=portable
    )
    passed = bloom_probe(
        state, fact, fact_key, n_bits, k, portable=portable
    ).where(
        F.col("bloom_pass")
    ).drop("bloom_pass")
    return passed.join(
        dim.select(F.col(dim_key).alias("__dk")).dropDuplicates(["__dk"]),
        passed[fact_key] == F.col("__dk"),
        "left_semi",
    )
