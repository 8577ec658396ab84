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
    use_bloom: bool = False,
    bloom_fpr: float = 0.01,
    bloom_items_hint: int | None = None,
    stop_grams: DataFrame | None = None,
) -> DataFrame:
    """Ids of training documents sharing >= 1 word n-gram with the eval
    set. Eval n-grams are broadcast (the eval set is small — that is
    the decontamination contract); corpus n-grams never shuffle.

    `use_bloom=True` inserts the runtime-filter fast path for LARGE
    eval suites: a Bloom filter over the eval fingerprints (a few MB
    at 1% fpr even for 10M grams — `functions/bloom.py`) prefilters
    the corpus gram stream with a joins-free projection, and the exact
    broadcast LEFT SEMI then sees only the ~(match-rate + fpr)
    fraction. Result is EXACTLY the non-bloom result (no false
    negatives); `bloom_items_hint` skips the sizing count when the
    caller knows the eval gram cardinality.

    `stop_grams` (r15): a 1-column frame of gram TEXTS to EXCLUDE from
    matching — the boilerplate escape hatch the production suites use
    (an overly common n-gram like a license header matches half the
    corpus and would nuke it; `frequent_grams` mines candidates, the
    contamination_report's example grams adjudicate them). Excluded
    grams are anti-joined off the EVAL side (eval-set sized, cheap),
    so the corpus-side stream is untouched."""
    ev = doc_ngram_fingerprints(eval_df, id_col, text_col, n).select("g").distinct()
    if stop_grams is not None:
        sg = stop_grams.select(
            F.md5(normalize_text(stop_grams.columns[0])).alias("g")
        ).distinct()
        ev = ev.join(F.broadcast(sg), "g", "left_anti")
    tg = doc_ngram_fingerprints(train, id_col, text_col, n)
    if use_bloom:
        from distributedqueryengine_spark.functions.bloom import (
            bloom_build,
            bloom_probe,
            bloom_size,
        )

        n_items = bloom_items_hint or max(ev.count(), 1)
        n_bits, k = bloom_size(n_items, bloom_fpr)
        state = bloom_build(ev, "g", n_bits, k)
        tg = bloom_probe(state, tg, "g", n_bits, k).where(
            F.col("bloom_pass")
        ).drop("bloom_pass")
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


# --------------------------------------------- semantic decontamination

def semantic_contaminated_ids(
    corpus_emb: DataFrame,
    eval_emb: DataFrame,
    tau: float = 0.95,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    eval_limit: int = 100_000,
) -> DataFrame:
    """(id, max_cos): corpus rows whose embedding is within cosine
    `tau` of ANY eval embedding — the semantic complement of the
    n-gram protocol above (catches paraphrased/translated eval leakage
    that shares no exact n-gram; the n-gram pass catches verbatim
    overlap below embedding-model resolution — production pipelines
    run BOTH).

    Scale shape mirrors `contaminated_ids`: the eval side is
    broadcast-small BY CONTRACT (collected once, L2-normalized into a
    single (n_eval, dim) matrix riding the closure), and the corpus
    side streams through ONE mapInPandas pass — per Arrow batch a
    single BLAS matmul against the eval matrix, max over the eval
    axis, emit only rows >= tau. Zero shuffles, zero corpus-side
    state; O(corpus x eval x dim) FLOPS, the unavoidable cost of exact
    semantic screening. `eval_limit` guards the collect the same way
    jaccard_on_pairs guards its broadcast: exceeding it raises rather
    than silently OOM-ing the driver.

    Pandas-UDF justification (repo rule: UDFs are the slow path): the
    per-row work is a dense dot product against EVERY eval vector —
    as a Column tree that is n_eval aggregate expressions per row,
    which loses to one vectorized matmul by orders of magnitude; same
    reasoning as brute_force_topk (similarity.py).
    """
    import numpy as np
    import pandas as pd

    rows = eval_emb.select(vec_col).limit(eval_limit + 1).collect()
    if len(rows) > eval_limit:
        raise ValueError(
            f"eval set exceeds eval_limit={eval_limit} embeddings; "
            "semantic decontamination broadcasts the eval side by "
            "contract — raise the limit only with driver memory to match"
        )
    if not rows:
        return corpus_emb.select(
            F.col(id_col).alias("id"), F.lit(0.0).alias("max_cos")
        ).limit(0)
    E = np.array([r[0] for r in rows], dtype=np.float64)
    E /= np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1e-12)

    # output id type follows the corpus id column (string doc ids must
    # not be forced through a hardcoded long in the Arrow conversion)
    from pyspark.sql.types import DoubleType, StructField, StructType

    out_schema = StructType(
        [
            StructField("id", corpus_emb.schema[id_col].dataType),
            StructField("max_cos", DoubleType()),
        ]
    )

    def screen(batches):
        for pdf in batches:
            M = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
            mc = (M @ E.T).max(axis=1)
            keep = mc >= tau
            if keep.any():
                yield pd.DataFrame(
                    {"id": pdf[id_col].values[keep], "max_cos": np.round(mc[keep], 6)}
                )

    return corpus_emb.select(id_col, vec_col).mapInPandas(screen, out_schema)


def semantic_decontaminate(
    corpus: DataFrame,
    corpus_emb: DataFrame,
    eval_emb: DataFrame,
    tau: float = 0.95,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Corpus rows whose embedding is NOT within `tau` of any eval
    embedding: broadcast anti-join on the (small by construction)
    contaminated-id set — same final stage as `decontaminate`."""
    bad = semantic_contaminated_ids(
        corpus_emb, eval_emb, tau, id_col=id_col, vec_col=vec_col
    ).select(F.col("id").alias(id_col))
    return corpus.join(F.broadcast(bad), on=id_col, how="left_anti")


def contamination_report(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Evidence for every contaminated (train, eval) pair (r15):
    (train_id, eval_id, n_shared_grams, example_gram) — the AUDIT
    artifact behind `contaminated_ids`' yes/no. A drop list without
    evidence is unreviewable: this is what a data team looks at before
    deciding whether "contamination" is a real benchmark leak or a
    boilerplate n-gram that should go to a stop-gram list instead.

    Carries the raw gram TEXT (not just its fingerprint) for the
    lexicographically-first shared gram of each pair. Scale shape
    (r16 — the r15 form shuffled the corpus's distinct (id, gram
    TEXT) rows): the CORPUS side moves only 8-byte 60-bit portable
    fingerprints through its distinct; the gram text for matched
    pairs is recovered from the EVAL side, which — being the small
    broadcast side by the decontamination contract — carries (eval_id,
    fingerprint, gram text) at eval-set cost. A shared gram's text
    exists identically on both sides, so min(eval-side gram) ==
    min(train-side gram) and no corpus-side recovery pass is needed.
    Fingerprint equality stands in for text equality at 60 bits — the
    same protocol every portable hash spine in this repo uses.
    Matched rows stay bounded by eval reach, one partial-aggregated
    count per pair. Fully SQL-portable; oracled as the decontam_suite
    `report` branch.
    """
    from distributedqueryengine_spark.functions.dedup import (
        portable_hash64,
    )
    from distributedqueryengine_spark.session import ensure_parallelism

    if n <= 0:
        raise ValueError(f"n-gram size must be positive, got {n}")

    def gram_rows(df: DataFrame, out_id: str, with_text: bool) -> DataFrame:
        toks = F.split(normalize_text(text_col), " ")
        n_grams = F.greatest(F.size(toks) - n + 1, F.lit(0))
        zipped = F.arrays_zip(
            *[F.slice(toks, i + 1, n_grams).alias(f"t{i}") for i in range(n)]
        )
        # NULL ids dropped (r16 ADVICE), mirroring frequent_grams /
        # select_until_budget: a NULL-id doc would otherwise surface
        # as one anonymous report row per gram
        g = ensure_parallelism(df.filter(F.col(id_col).isNotNull())).select(
            F.col(id_col).alias(out_id), F.explode(zipped).alias("z")
        )
        gram = F.concat_ws(" ", *[F.col(f"z.t{i}") for i in range(n)])
        cols = [out_id, portable_hash64(gram).alias("gh")]
        if with_text:
            cols.append(gram.alias("gram"))
        return g.select(*cols).distinct()

    tg = gram_rows(train, "train_id", with_text=False)
    eg = gram_rows(eval_df, "eval_id", with_text=True)
    return (
        tg.join(F.broadcast(eg), "gh")
        .groupBy("train_id", "eval_id")
        .agg(
            F.count(F.lit(1)).alias("n_shared_grams"),
            F.min("gram").alias("example_gram"),
        )
    )


def frequent_grams(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_doc_frac: float = 0.05,
) -> DataFrame:
    """Boilerplate n-gram miner (r15): grams appearing in at least
    ``min_doc_frac`` of documents — license headers, navigation chrome,
    template sentences. These are the stop-gram CANDIDATES a
    decontamination pass should usually ignore (feed the `gram` column
    to `contaminated_ids(stop_grams=...)` after review): an eval
    suite sharing only boilerplate with a training document is not a
    leak, and dropping every such document would gut the corpus.

    Returns (gram, n_docs, doc_frac) ordered by n_docs desc, gram asc
    — gram TEXT, not fingerprints, because the output is a human
    review list.

    Scale shape (r16 — the r15 form shuffled distinct (id, gram TEXT)
    rows corpus-wide): the counting pass moves only 60-bit portable
    FINGERPRINTS through its distinct + count (8-byte rows), and the
    gram text is recovered afterwards by re-streaming the corpus's
    grams through a broadcast semi-join against the (tiny, above-bar)
    frequent-fingerprint set — text leaves an executor only for grams
    that already qualified. Two narrow scans, zero text-width
    shuffles; the same recover-text-only-for-survivors pattern as
    contamination_report.

    NULL ids are dropped up front (r16 ADVICE): countDistinct — the
    doc_frac denominator — excludes NULLs, so counting NULL-id rows in
    the numerator could push doc_frac past 1.0 and shift thresholds;
    numerator and denominator now see the same id set."""
    from distributedqueryengine_spark.functions.dedup import (
        portable_hash64,
    )
    from distributedqueryengine_spark.session import ensure_parallelism

    if n <= 0:
        raise ValueError(f"n-gram size must be positive, got {n}")
    if not 0 < min_doc_frac <= 1:
        raise ValueError(f"min_doc_frac must be in (0, 1], got {min_doc_frac}")
    df = df.filter(F.col(id_col).isNotNull())
    toks = F.split(normalize_text(text_col), " ")
    n_grams = F.greatest(F.size(toks) - n + 1, F.lit(0))
    zipped = F.arrays_zip(
        *[F.slice(toks, i + 1, n_grams).alias(f"t{i}") for i in range(n)]
    )
    gram = F.concat_ws(" ", *[F.col(f"z.t{i}") for i in range(n)])
    raw = ensure_parallelism(df).select(
        F.col(id_col).alias("id"), F.explode(zipped).alias("z")
    )
    counts = (
        raw.select("id", portable_hash64(gram).alias("gh"))
        .distinct()
        .groupBy("gh")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    total = df.select(F.countDistinct(id_col).alias("__nd"))
    freq = (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("n_docs") >= F.col("__nd") * min_doc_frac)
        .select(
            "gh", "n_docs",
            F.round(F.col("n_docs") / F.col("__nd"), 6).alias("doc_frac"),
        )
    )
    return (
        raw.select(gram.alias("gram"), portable_hash64(gram).alias("gh"))
        .join(F.broadcast(freq), "gh")
        .select("gram", "n_docs", "doc_frac")
        .distinct()
        .orderBy(F.col("n_docs").desc(), F.col("gram").asc())
    )
