"""First 1000x datapoint (r13): the three scale-safe new families at
5M documents / 5M embedding rows (sf0.1 replicated 1000x) — PMI
collocations (vocab-sized state), quality-classifier scoring (fused
one-agg plan), and kNN label propagation (fixed query batch). The
point is the SHAPE one decade past the usual 100x probes: state that
is vocabulary-/batch-sized must stay flat while wall tracks the scan.

Usage: SPARK_GRAFT_UI=true python tools/scale_probe_1000x.py
Extends SCALE_PROBE_r13.json with "<family>@1000x" keys.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from distributedqueryengine_spark.session import get_spark, load_table  # noqa: E402
from tools.scale_probe_pipelines import shuffle_write_bytes  # noqa: E402
from tools.scale_probe_r13 import (  # noqa: E402
    OUT,
    SF_DIR,
    SHIFT,
    replicate_docs,
    replicate_embeddings,
    timed,
)


def main() -> None:
    spark = get_spark("scale-probe-1000x")
    assert spark.sparkContext.uiWebUrl, "needs SPARK_GRAFT_UI=true (fresh JVM)"
    results: dict[str, dict] = {}
    n = 1000

    docs = spark.read.parquet(replicate_docs(spark, n))

    from distributedqueryengine_spark.functions.text import collocations_pmi

    wall, shuf, rows = timed(spark, lambda: collocations_pmi(docs, "text"))
    results.setdefault("pmi_collocations", {})["1000x"] = {
        "wall_s": wall, "shuffle_mb": shuf, "out_rows": rows,
    }
    print(f"pmi_collocations @1000x: {wall}s, {shuf} MB", flush=True)

    from distributedqueryengine_spark.functions.quality_clf import (
        fit_hashed_logreg,
        score_hashed_logreg,
    )

    seed_docs = load_table(spark, SF_DIR, "documents").withColumn(
        "label", (F.col("doc_id") % 2 == 0).cast("int")
    )
    model = fit_hashed_logreg(
        seed_docs, "doc_id", "text", "label", num_buckets=2048, iters=5
    )
    wall, shuf, rows = timed(
        spark, lambda: score_hashed_logreg(docs, "doc_id", "text", model)
    )
    results.setdefault("quality_clf_score", {})["1000x"] = {
        "wall_s": wall, "shuffle_mb": shuf, "out_rows": rows,
    }
    print(f"quality_clf_score @1000x: {wall}s, {shuf} MB", flush=True)

    emb = spark.read.parquet(replicate_embeddings(spark, n))
    q = emb.filter((F.col("vec_id") % 10 == 0) & (F.col("vec_id") < SHIFT))
    train = emb.filter(F.col("vec_id") % 10 != 0)

    from distributedqueryengine_spark.functions.classify import knn_classify

    wall, shuf, rows = timed(spark, lambda: knn_classify(q, train, k=5))
    results.setdefault("knn_classify", {})["1000x"] = {
        "wall_s": wall, "shuffle_mb": shuf, "out_rows": rows,
    }
    print(f"knn_classify @1000x: {wall}s, {shuf} MB", flush=True)

    merged = {}
    if os.path.isfile(OUT):
        with open(OUT) as f:
            merged = json.load(f)
    for k, v in results.items():
        merged.setdefault(k, {}).update(v)
    with open(OUT, "w") as f:
        json.dump(merged, f, indent=1)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
