"""N-gram language-model scoring: the perplexity-filter shape.

Production corpus curation (CCNet, RefinedWeb, Gopher) filters
documents by perplexity under a small n-gram LM trained on a trusted
corpus — fluent text scores low, boilerplate/gibberish scores high.
The real systems use KenLM (not in this container); this module
implements the same pipeline shape with an interpolation-free
add-one-smoothed BIGRAM model whose math is SQL-portable, so training
AND scoring are DuckDB-differentiable end to end: the distributed
plumbing (vocab cutoff, <unk> mapping, bigram join layout) is exactly
what a KenLM-backed variant would need, with the scorer swappable.

Model: vocabulary = top `vocab_size` tokens (count desc, token asc —
deterministic); everything else maps to '<unk>'. Documents are framed
as <s> w1 ... wn </s>. p(w2|w1) = (c(w1,w2) + 1) / (c(w1) + V) where
V = |vocab| + 2 (unk + </s> can follow; <s> only precedes). Score =
mean over a doc's bigrams of -ln p; perplexity = exp(score).

Scale shape: training is two map-side-combinable counts (unigram,
bigram) over one tokenize pass; the model is vocabulary-sized, never
corpus-sized. Scoring explodes each doc's bigrams once and LEFT-joins
the bigram/unigram count tables on their natural keys (broadcast when
the model is small, shuffle-hash otherwise — Spark picks); unseen
bigrams hit the smoothing floor via coalesce, no special-casing. Zero
UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from distributedqueryengine_spark.functions.text import tokens

BOS = "<s>"
EOS = "</s>"
UNK = "<unk>"


def _normalized_tokens(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, toks array<string>) lowercased whitespace tokens, empty-safe."""
    toks = F.filter(tokens(text_col), lambda t: F.length(t) > 0)
    return df.select(F.col(id_col).alias("id"), toks.alias("toks"))


def _map_unk(toks_col, vocab_array):
    """Map out-of-vocabulary tokens to UNK with a JVM-side transform
    against a broadcast-literal vocab array (sorted, so array_contains
    is a scan of a small constant array riding the closure)."""
    return F.transform(
        toks_col,
        lambda t: F.when(F.array_contains(vocab_array, t), t).otherwise(F.lit(UNK)),
    )


def train_bigram_lm(
    corpus: DataFrame,
    text_col: str,
    id_col: str = "doc_id",
    vocab_size: int = 10_000,
) -> dict:
    """Fit the model: returns {'vocab': [tokens...], 'v': smoothing V,
    'unigrams': DataFrame(w, c), 'bigrams': DataFrame(w1, w2, c)}.
    The count frames stay DISTRIBUTED (persist or write them next to
    the pipeline); only the vocabulary list — bounded by vocab_size —
    is collected to ride scoring closures."""
    if vocab_size < 1:
        raise ValueError(f"vocab_size must be >= 1, got {vocab_size}")
    base = _normalized_tokens(corpus, text_col, id_col)
    counts = (
        base.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    vocab_rows = counts.orderBy(F.col("c").desc(), F.col("w").asc()).limit(
        vocab_size
    ).collect()  # bounded by vocab_size BY CONTRACT
    vocab = sorted(r.w for r in vocab_rows)
    vocab_arr = F.array(*[F.lit(w) for w in vocab])

    framed = base.select(
        F.concat(
            F.array(F.lit(BOS)), _map_unk(F.col("toks"), vocab_arr), F.array(F.lit(EOS))
        ).alias("toks")
    )
    pairs = framed.select(
        F.explode(
            F.zip_with(
                F.slice(F.col("toks"), 1, F.size("toks") - 1),
                F.slice(F.col("toks"), 2, F.size("toks") - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("bg")
    )
    bigrams = (
        pairs.select("bg.w1", "bg.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    unigrams = (
        pairs.select(F.col("bg.w1").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return {
        "vocab": vocab,
        "v": len(vocab) + 2,  # + unk + eos
        "unigrams": unigrams,
        "bigrams": bigrams,
    }


def score_perplexity(
    docs: DataFrame,
    text_col: str,
    lm: dict,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_bigrams, avg_neg_logprob, perplexity) per document under
    the fitted model — filter on perplexity > threshold to drop
    gibberish, < threshold to drop boilerplate-like near-copies of the
    training domain. One explode + two LEFT joins against the count
    frames + one doc-keyed aggregate."""
    vocab_arr = F.array(*[F.lit(w) for w in lm["vocab"]])
    v = int(lm["v"])
    framed = _normalized_tokens(docs, text_col, id_col).select(
        "id",
        F.concat(
            F.array(F.lit(BOS)), _map_unk(F.col("toks"), vocab_arr), F.array(F.lit(EOS))
        ).alias("toks"),
    )
    pairs = framed.select(
        "id",
        F.explode(
            F.zip_with(
                F.slice(F.col("toks"), 1, F.size("toks") - 1),
                F.slice(F.col("toks"), 2, F.size("toks") - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("bg"),
    ).select("id", "bg.w1", "bg.w2")
    joined = (
        pairs.join(lm["bigrams"].withColumnRenamed("c", "__cb"), ["w1", "w2"], "left")
        .join(lm["unigrams"].withColumnRenamed("c", "__cu"), F.col("w1") == F.col("w"), "left")
        .drop("w")
    )
    logp = F.log(
        (F.coalesce(F.col("__cb"), F.lit(0)) + 1)
        / (F.coalesce(F.col("__cu"), F.lit(0)) + v)
    )
    return (
        joined.groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.round(-F.avg(logp), 6).alias("avg_neg_logprob"),
        )
        .select(
            F.col("id").alias(id_col),
            "n_bigrams",
            "avg_neg_logprob",
            F.round(F.exp("avg_neg_logprob"), 6).alias("perplexity"),
        )
    )
