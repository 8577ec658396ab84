"""Python UDTFs (Spark 4 `@udtf`): the table-function API surface.

The reference has no user-defined functions of any kind (closed scalar
pipeline, RPC.cs:20-28); SURVEY §2.2 claims UDTF capability for the
rebuild. The heavy-lifting table-generating operators in this repo are
deliberately NOT UDTFs — they are codegen explodes (shingles, chunking)
or Arrow-batched mapInPandas (ANN, media), because a Python UDTF runs
row-at-a-time in the Python worker. This module provides the actual
UDTF API surface for the cases where it is the right tool: low-volume
lateral expansions authored in Python and called from SQL.

`register_udtfs(spark)` installs them for SQL:
    SELECT t.* FROM documents, LATERAL word_ngrams(text, 3) t
Equivalence with the codegen shingle path is pinned in
tests/test_text_multimodal.py.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="pos int, gram string")
class WordNgrams:
    """Emit (pos, gram) for every word n-gram of `text` — the UDTF
    twin of the arrays_zip+slice explode in dedup.shingles (which is
    the production path; this is the SQL-authorable one)."""

    def eval(self, text: str, n: int):  # noqa: D102
        if text is None or n is None or n <= 0:
            return
        toks = " ".join(text.lower().strip().split()).split(" ")
        if toks == [""]:
            return
        for i in range(len(toks) - n + 1):
            yield i, " ".join(toks[i : i + n])


@udtf(returnType="part int, piece string")
class SplitBudget:
    """Greedily split `text` into pieces of at most `budget` whitespace
    tokens (the SQL-facing cousin of text.chunk_text)."""

    def eval(self, text: str, budget: int):  # noqa: D102
        if text is None or budget is None or budget <= 0:
            return
        toks = text.split()
        for part, start in enumerate(range(0, len(toks), budget)):
            yield part, " ".join(toks[start : start + budget])


def register_udtfs(spark) -> None:
    """Register every UDTF under its SQL name (idempotent)."""
    spark.udtf.register("word_ngrams", WordNgrams)
    spark.udtf.register("split_budget", SplitBudget)
