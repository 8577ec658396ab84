"""Benchmark decontamination: remove training documents that share any
word n-gram with a held-out evaluation set.

Standard LLM training-data hygiene (the n-gram-overlap protocol used by
GPT-3/PaLM-style data cards): a training document is *contaminated* if
any of its word n-grams (default n=5) also appears in any eval
document; contaminated documents are dropped wholesale.

Scale design (100 TB corpus, KB-MB eval set): the eval side collapses
to its DISTINCT n-gram fingerprints — thousands of rows — and is
broadcast; the corpus side streams through a broadcast LEFT SEMI probe
with NO shuffle of corpus n-grams. Contaminated ids (small by
construction) then drive a broadcast anti-join against the corpus
rows. Net: two corpus scans, zero corpus shuffles.

Fingerprints use md5 of the normalized n-gram, which is engine-portable
(identical in DuckDB), so the whole operator is oracle-checkable; at
production scale xxhash64 halves the fingerprint width with the same
plan shape.

The reference engine has no text operators (closed enum RPC.cs:20-28);
this is north-star training-pipeline capability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from distributedqueryengine_spark.functions.text import normalize_text


def doc_ngram_fingerprints(
    df: DataFrame, id_col: str, text_col: str, n: int = 5
) -> DataFrame:
    """(id, g): distinct md5 fingerprints of each document's word
    n-grams. Same codegen-friendly arrays_zip+slice construction as
    dedup.shingles (higher-order transform() is CodegenFallback);
    documents shorter than n tokens yield no rows."""
    from distributedqueryengine_spark.session import ensure_parallelism

    if n <= 0:
        raise ValueError(f"n-gram size must be positive, got {n}")
    toks = F.split(normalize_text(text_col), " ")
    n_grams = F.greatest(F.size(toks) - n + 1, F.lit(0))
    zipped = F.arrays_zip(
        *[F.slice(toks, i + 1, n_grams).alias(f"t{i}") for i in range(n)]
    )
    g = ensure_parallelism(df).select(
        F.col(id_col).alias("id"), F.explode(zipped).alias("z")
    )
    return g.select(
        "id",
        F.md5(F.concat_ws(" ", *[F.col(f"z.t{i}") for i in range(n)])).alias("g"),
    ).distinct()


def contaminated_ids(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Ids of training documents sharing >= 1 word n-gram with the eval
    set. Eval n-grams are broadcast (the eval set is small — that is
    the decontamination contract); corpus n-grams never shuffle."""
    ev = doc_ngram_fingerprints(eval_df, id_col, text_col, n).select("g").distinct()
    tg = doc_ngram_fingerprints(train, id_col, text_col, n)
    return (
        tg.join(F.broadcast(ev), "g", "left_semi")
        .select(F.col("id").alias(id_col))
        .distinct()
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Training rows with every contaminated document removed.

    The anti-join side is usually tiny but is NOT bounded by the eval
    set size (one hot n-gram can contaminate many documents), so it
    carries no broadcast hint — AQE converts it to a broadcast join at
    runtime when it actually is small."""
    bad = contaminated_ids(train, eval_df, id_col, text_col, n)
    return train.join(bad, id_col, "left_anti")
