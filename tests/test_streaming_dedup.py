"""Streaming near-dup candidates (streaming/dedup.py): the narrow
per-row MinHash formulation must equal the batch explode+aggregate
pipeline value-for-value, and the stream-static candidate join must
emit exactly the batch-computed candidates with a stateless plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributedqueryengine_spark.functions import dedup as D
from distributedqueryengine_spark.session import load_table
from distributedqueryengine_spark.streaming import dedup as SD
from distributedqueryengine_spark.streaming import windows as W

SF_DIR = "/root/testdata/sf0.001"


def _rows(df, cols):
    return {tuple(r[c] for c in cols) for r in df.collect()}


@pytest.mark.parametrize("portable", [False, True])
def test_narrow_band_buckets_equal_batch_pipeline(spark, portable):
    """Per-row transform/array_min formulation ≡ explode + groupBy-min
    + banding, in both hash modes, including the zero-shingle-doc
    exclusion."""
    docs = load_table(spark, SF_DIR, "documents")
    narrow = SD.narrow_minhash_band_buckets(
        docs, "doc_id", "text", 3, 32, 8, portable=portable
    )
    sh = D.shingles(docs, "doc_id", "text", 3, portable=portable)
    sigs = D.minhash_signatures(sh, 32, portable=portable)
    batch = D.band_buckets(sigs, 32, 8, portable=portable)
    cols = ["id", "band", "bh"]
    got, expect = _rows(narrow, cols), _rows(batch, cols)
    assert got == expect
    assert len(got) > 0


def test_stream_candidates_equal_batch(spark):
    """End-to-end through the microbatch engine: odd-id documents
    streamed against a static index of even-id documents must emit
    exactly the batch-computed candidate set, with a STATELESS plan."""
    docs = load_table(spark, SF_DIR, "documents")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    index = SD.build_band_index(corpus, "doc_id", "text").persist()
    index.count()

    stream = W.stream_from_table(spark, SF_DIR, "documents").filter(
        F.col("doc_id") % 2 == 1
    )
    cand = SD.stream_dedup_candidates(stream, index, "doc_id", "text")
    q = (
        cand.writeStream.outputMode("append")
        .format("memory")
        .queryName("sdedup_out")
        .start()
    )
    q.processAllAvailable()
    # stateless: the stream-static join must not create state operators
    progress = q.lastProgress
    assert progress is None or not progress.get("stateOperators"), (
        f"unexpected state operators: {progress.get('stateOperators')}"
    )
    q.stop()

    got = _rows(
        spark.sql("SELECT new_id, corpus_id, band FROM sdedup_out"),
        ["new_id", "corpus_id", "band"],
    )
    batch_cand = SD.stream_dedup_candidates(
        docs.filter(F.col("doc_id") % 2 == 1), index, "doc_id", "text"
    )
    expect = _rows(batch_cand, ["new_id", "corpus_id", "band"])
    assert got == expect
    index.unpersist()


def test_stream_candidates_find_planted_duplicate(spark, tmp_path):
    """A planted near-copy arriving on the stream must collide with its
    original in the static index; an unrelated document must not."""
    import pandas as pd

    corpus_pdf = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": [
                "the quick brown fox jumps over the lazy dog again and again today",
                "completely different content about distributed query engines at scale",
            ],
        }
    )
    corpus = spark.createDataFrame(corpus_pdf)
    index = SD.build_band_index(corpus, "doc_id", "text")

    new_pdf = pd.DataFrame(
        {
            "doc_id": [10, 11],
            "text": [
                # near-copy of doc 1 (one word changed at the end)
                "the quick brown fox jumps over the lazy dog again and again tomorrow",
                "unrelated text mentioning nothing shared with either corpus entry",
            ],
        }
    )
    d = str(tmp_path / "newdocs")
    spark.createDataFrame(new_pdf).coalesce(1).write.parquet(d)
    schema = spark.read.parquet(d).schema
    stream = spark.readStream.schema(schema).parquet(d)
    cand = SD.stream_dedup_candidates(stream, index, "doc_id", "text")
    q = (
        cand.writeStream.outputMode("append")
        .format("memory")
        .queryName("sdedup_plant")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    pairs = {
        (r.new_id, r.corpus_id)
        for r in spark.sql(
            "SELECT DISTINCT new_id, corpus_id FROM sdedup_plant"
        ).collect()
    }
    assert (10, 1) in pairs, f"planted near-copy not detected: {pairs}"
    assert all(nid != 11 for nid, _ in pairs), f"false positive: {pairs}"


def test_incremental_index_catches_cross_batch_pairs(spark, tmp_path):
    """The check-then-extend foreachBatch loop: a near-dup pair SPLIT
    ACROSS micro-batches must be detected when the second half arrives
    (the pure stream-static join cannot see it), an intra-batch pair
    must be detected in its own epoch, and unrelated docs stay clean."""
    import os
    import time

    import pandas as pd

    base = "the quick brown fox jumps over the lazy dog again and again"
    batches = [
        # batch 1: doc 1 (original) + unrelated doc 2
        pd.DataFrame({"doc_id": [1, 2], "text": [
            base + " today",
            "entirely different material on columnar execution engines and shuffles",
        ]}),
        # batch 2: doc 3 near-dups doc 1 (cross-batch); docs 4+5 near-dup
        # each other (intra-batch; one trailing word differs, so their
        # Jaccard sits far above the 8-band/4-row S-curve threshold)
        pd.DataFrame({"doc_id": [3, 4, 5], "text": [
            base + " tomorrow",
            "streaming ingestion pipelines must deduplicate every arriving document "
            "against the full historical corpus before any training run starts today",
            "streaming ingestion pipelines must deduplicate every arriving document "
            "against the full historical corpus before any training run starts tonight",
        ]}),
    ]
    src = str(tmp_path / "arrivals")
    os.makedirs(src)
    index_dir = str(tmp_path / "band_index")
    schema = None
    for i, pdf in enumerate(batches):
        f = str(tmp_path / f"b{i}")
        spark.createDataFrame(pdf).coalesce(1).write.parquet(f)
        if schema is None:
            schema = spark.read.parquet(f).schema
        import glob as g
        import shutil

        shutil.copy(g.glob(f + "/*.parquet")[0], f"{src}/b{i}.parquet")
        time.sleep(1.1)  # distinct mtimes → deterministic pickup order

    emitted: dict[int, set] = {}

    def handler(epoch_id, cands):
        emitted[epoch_id] = {
            (r.new_id, r.corpus_id)
            for r in cands.select("new_id", "corpus_id").distinct().collect()
        }

    fb = SD.incremental_dedup_foreach_batch(index_dir, candidate_handler=handler)
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    q = stream.writeStream.foreachBatch(fb).start()
    q.processAllAvailable()
    q.stop()

    all_pairs = {frozenset(p) for pairs in emitted.values() for p in pairs}
    assert frozenset({1, 3}) in all_pairs, f"cross-batch pair missed: {emitted}"
    assert frozenset({4, 5}) in all_pairs, f"intra-batch pair missed: {emitted}"
    flat = {d for p in all_pairs for d in p}
    assert 2 not in flat, f"unrelated doc flagged: {emitted}"
    # the index now holds every document's buckets
    idx_ids = {r.id for r in spark.read.parquet(index_dir).select("id").distinct().collect()}
    assert idx_ids == {1, 2, 3, 4, 5}


def test_compacted_index_equals_raw_and_probes_identically(spark, tmp_path):
    """compact_band_index: the bucketed table holds exactly the raw
    index's distinct rows, and candidates probed against it equal
    candidates probed against the raw parquet dir."""
    docs = load_table(spark, SF_DIR, "documents")
    corpus = docs.filter(F.col("doc_id") % 3 == 0)
    raw_dir = str(tmp_path / "raw_index")
    # simulate several epoch appends (with a replayed epoch)
    b = SD.build_band_index(corpus, "doc_id", "text")
    b.filter(F.col("id") % 2 == 0).write.mode("append").parquet(raw_dir)
    b.filter(F.col("id") % 2 == 1).write.mode("append").parquet(raw_dir)
    b.filter(F.col("id") % 2 == 1).write.mode("append").parquet(raw_dir)  # replay

    table = "band_index_compact_test"
    SD.compact_band_index(spark, raw_dir, table)
    try:
        compact = spark.table(table)
        raw = spark.read.parquet(raw_dir).dropDuplicates(["id", "band", "bh"])
        cols = ["id", "band", "bh"]
        assert _rows(compact, cols) == _rows(raw, cols)

        batch = docs.filter(F.col("doc_id") % 3 == 1).limit(50)
        got = _rows(
            SD.stream_dedup_candidates(batch, compact, "doc_id", "text"),
            ["new_id", "corpus_id", "band"],
        )
        expect = _rows(
            SD.stream_dedup_candidates(batch, raw, "doc_id", "text"),
            ["new_id", "corpus_id", "band"],
        )
        assert got == expect
        assert expect, "no candidates — fixture too sparse"
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_stream_exact_dedup_within_watermark(spark, tmp_path):
    """stream_exact_dedup: in-window duplicates are dropped, state is
    EVICTED once the watermark passes (a later re-arrival of the same
    content is re-emitted — the documented bounded-state trade), and
    distinct contents always pass."""
    import glob
    import os
    import shutil

    import pandas as pd

    def _stage(name, rows):
        src = str(tmp_path / ("src_" + name))
        pd_df = pd.DataFrame(rows)
        pd_df["ts"] = pd.to_datetime(pd_df["ts"])
        spark.createDataFrame(pd_df).coalesce(1).write.mode("overwrite").parquet(src)
        for f in glob.glob(src + "/*.parquet"):
            shutil.copy(f, stage_dir + f"/{name}.parquet")
        return src

    stage_dir = str(tmp_path / "stream_in")
    os.makedirs(stage_dir)
    first = _stage(
        "b1",
        {
            "doc_id": [1, 2, 3],
            "text": ["alpha beta", "alpha  BETA", "gamma delta"],  # 1≡2 after normalize
            "ts": ["2024-01-01 10:00:00", "2024-01-01 10:00:30", "2024-01-01 10:01:00"],
        },
    )
    schema = spark.read.parquet(first).schema
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(stage_dir)
    out = SD.stream_exact_dedup(stream, "doc_id", "text", "ts", delay="10 minutes")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("exact_dedup_out")
        .start()
    )
    q.processAllAvailable()
    got1 = {r.fp for r in spark.sql("SELECT * FROM exact_dedup_out").collect()}
    n1 = spark.sql("SELECT count(*) AS n FROM exact_dedup_out").first().n
    assert n1 == 2, "batch 1: the in-batch duplicate must be dropped"
    assert len(got1) == 2

    # batch 2: same content as doc 1, still inside the watermark window
    # (watermark after b1 = 10:01 - 10min < 10:00) → dropped as dup.
    _stage(
        "b2",
        {
            "doc_id": [4],
            "text": ["ALPHA beta"],
            "ts": ["2024-01-01 10:05:00"],
        },
    )
    q.processAllAvailable()
    n2 = spark.sql("SELECT count(*) AS n FROM exact_dedup_out").first().n
    assert n2 == 2, "batch 2: in-window re-arrival must be dropped"

    # batch 3: watermark jumps far ahead; batch 4 re-sends the same
    # content — its state row was evicted, so it is re-emitted.
    _stage(
        "b3",
        {"doc_id": [5], "text": ["epsilon zeta"], "ts": ["2024-01-01 14:00:00"]},
    )
    q.processAllAvailable()
    _stage(
        "b4",
        {"doc_id": [6], "text": ["alpha beta"], "ts": ["2024-01-01 14:00:05"]},
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT doc_id, fp FROM exact_dedup_out").collect()
    assert len(rows) == 4, f"expired-state re-arrival must re-emit, got {rows}"
    assert {r.doc_id for r in rows} >= {3, 5, 6}


def test_stream_candidates_with_index_refresh_between_batches(spark, tmp_path):
    """r15: two micro-batches with an index APPEND in between — the
    near-dup tier's foreachBatch re-read must see corpus rows appended
    after the stream started (no restart, no refresh call), and each
    batch's candidate set must equal the batch-mode join against the
    index content current at that batch. Also pins that the curated
    output still has exactly ONE state operator with the tier wired."""
    import datetime as dt

    import pandas as pd

    from distributedqueryengine_spark.streaming.decontam import (
        eval_gram_array,
    )
    from distributedqueryengine_spark.streaming.pipeline import (
        curate_stream_with_neardup,
    )

    base_txt = ("the quick brown fox jumps over the lazy dog "
                "again and again every single day in the sunny meadow")
    alt_txt = ("distributed query engines shuffle partitioned data "
               "across many executor nodes to answer analytical joins")
    corpus_a = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": [base_txt]})
    )
    corpus_b = spark.createDataFrame(
        pd.DataFrame({"doc_id": [2], "text": [alt_txt]})
    )
    ipath = str(tmp_path / "bandidx")
    SD.save_band_index(
        SD.build_band_index(corpus_a, "doc_id", "text"), ipath
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    b1 = pd.DataFrame({
        "doc_id": [10, 11],
        "text": [base_txt.replace("sunny", "rainy"),
                 "unrelated nothing shared with either corpus entry here"],
        "ts": [t0, t0],
    })
    b2 = pd.DataFrame({
        "doc_id": [20],
        "text": [alt_txt.replace("joins", "queries")],
        "ts": [t0],
    })
    src = str(tmp_path / "arrivals")
    spark.createDataFrame(b1).coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    ev = eval_gram_array(
        spark.createDataFrame(
            pd.DataFrame({"doc_id": [99], "text": ["zz qq ww ee rr tt yy"]})
        ), "doc_id", "text", 5,
    )
    per_epoch: dict[int, set] = {}

    def handler(epoch_id, cands):
        per_epoch.setdefault(epoch_id, set()).update(
            (r.new_id, r.corpus_id) for r in cands.collect()
        )

    curated, nd_src, nd_handler = curate_stream_with_neardup(
        stream, ev, ipath, handler, min_quality=0.0, lang=None,
    )
    qc = (curated.writeStream.outputMode("append")
          .format("memory").queryName("refresh_curated").start())
    qn = nd_src.writeStream.foreachBatch(nd_handler).start()
    qc.processAllAvailable(); qn.processAllAvailable()
    got1 = set().union(*per_epoch.values()) if per_epoch else set()
    assert (10, 1) in got1 and all(n != 20 for n, _ in got1), got1

    # the curated sink keeps the front's one-state-operator contract
    prog = qc.lastProgress
    assert prog and len(prog.get("stateOperators") or []) == 1, prog

    # index grows out-of-band; NO refresh call, NO restart
    SD.append_to_band_index(
        SD.build_band_index(corpus_b, "doc_id", "text"), ipath
    )
    spark.createDataFrame(b2).coalesce(1).write.mode("append").parquet(src)
    qc.processAllAvailable(); qn.processAllAvailable()
    qc.stop(); qn.stop()
    got2 = set().union(*per_epoch.values())
    assert (20, 2) in got2, f"appended index not seen by batch 2: {got2}"
    # batch-mode mirrors per batch state
    expect_b1 = {(r.new_id, r.corpus_id) for r in SD.stream_dedup_candidates(
        spark.createDataFrame(b1),
        SD.build_band_index(corpus_a, "doc_id", "text"),
        "doc_id", "text").collect()}
    expect_b2 = {(r.new_id, r.corpus_id) for r in SD.stream_dedup_candidates(
        spark.createDataFrame(b2), SD.load_band_index(spark, ipath),
        "doc_id", "text").collect()}
    assert got2 == expect_b1 | expect_b2, (got2, expect_b1, expect_b2)


def test_band_index_staleness_report(spark, tmp_path):
    """r15: fresh index reports tvd≈0/no retrain; a skew-concentrated
    append fires the retrain signal; an empty baseline raises."""
    docs = load_table(spark, SF_DIR, "documents").limit(200)
    ipath = str(tmp_path / "bidx")
    idx = SD.build_band_index(docs, "doc_id", "text")
    SD.save_band_index(idx, ipath)
    fresh = SD.band_index_staleness(spark, ipath)
    assert fresh["tvd"] < 1e-9 and not fresh["retrain"], fresh
    # planted shift: every appended row lands in ONE (band, cell)
    skew = spark.createDataFrame(
        [(100000 + i, 0, 7) for i in range(900)], "id long, band int, bh long"
    )
    SD.append_to_band_index(skew, ipath)
    stale = SD.band_index_staleness(spark, ipath)
    assert stale["retrain"] and stale["tvd"] > 0.05, stale
    # empty baseline raises a diagnosable error
    epath = str(tmp_path / "bidx_empty")
    SD.save_band_index(idx.filter("1=0"), epath)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="empty"):
        SD.band_index_staleness(spark, epath)


def test_band_index_fragmentation_flag(spark, tmp_path):
    """r16: append_to_band_index returns {n_files, needs_compaction}
    from a listing-only count, and band_index_staleness carries the
    same flag — the lifecycle surfaces its own small-file health."""
    docs = load_table(spark, SF_DIR, "documents").limit(120)
    ipath = str(tmp_path / "bidx_frag")
    idx = SD.build_band_index(docs, "doc_id", "text")
    SD.save_band_index(idx, ipath)
    batch = spark.createDataFrame(
        [(200000 + i, i % 8, 12345 + i) for i in range(40)],
        "id long, band int, bh long",
    )
    r1 = SD.append_to_band_index(batch, ipath, files_threshold=100_000)
    assert r1["n_files"] >= 1 and not r1["needs_compaction"], r1
    r2 = SD.append_to_band_index(batch, ipath, files_threshold=1)
    assert r2["n_files"] > r1["n_files"] and r2["needs_compaction"], (r1, r2)
    rep = SD.band_index_staleness(spark, ipath, files_threshold=1)
    assert rep["n_files"] == r2["n_files"] and rep["needs_compaction"], rep
    assert not SD.band_index_staleness(
        spark, ipath, files_threshold=100_000
    )["needs_compaction"]
