"""write_training_shards: the manifest -> shard-file layout a data
loader consumes (r15). Pins shard arithmetic, per-shard pos
contiguity/order, partition pruning on (epoch, shard), and
determinism across rewrites."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributedqueryengine_spark.functions.packing import (
    write_training_shards,
)

SF_DIR = "/root/testdata/sf0.001"


def _manifest(spark, n_rows=237, n_epochs=2):
    from distributedqueryengine_spark.functions.sampling import (
        training_order,
    )

    base = spark.createDataFrame(
        [(i,) for i in range(n_rows)], "doc_id long"
    )
    return training_order(base, "doc_id", n_epochs=n_epochs, seed=4)


def test_shard_layout_roundtrip(spark, tmp_path):
    m = _manifest(spark)
    path = str(tmp_path / "shards")
    stats = write_training_shards(m, path, shard_size=50)
    assert stats["n_rows"] == 474 and stats["n_epochs"] == 2
    # 237 rows / 50 => 5 shards per epoch (last short)
    assert stats["shards_per_epoch"] == {0: 5, 1: 5}
    back = spark.read.parquet(path)
    # every (epoch, pos) present exactly once; shard = pos // 50
    rows = back.select("epoch", "pos", "shard").collect()
    assert len(rows) == 474
    assert {(r.epoch, r.pos) for r in rows} == {
        (e, p) for e in (0, 1) for p in range(237)
    }
    assert all(r.shard == r.pos // 50 for r in rows)
    # within one shard the file order IS pos order
    one = spark.read.parquet(path + "/epoch=1/shard=2")
    poss = [r.pos for r in one.collect()]
    assert poss == sorted(poss) and len(poss) == 50
    # partition pruning: a shard-targeted read plans partition filters
    pruned = back.filter((F.col("epoch") == 0) & (F.col("shard") == 3))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "shard" in plan, plan
    # determinism: rewriting produces identical shard contents
    path2 = str(tmp_path / "shards2")
    write_training_shards(_manifest(spark), path2, shard_size=50)
    a = {(r.epoch, r.shard, r.pos, r.id) for r in back.collect()}
    b = {(r.epoch, r.shard, r.pos, r.id)
         for r in spark.read.parquet(path2).collect()}
    assert a == b


def test_shard_size_validation(spark, tmp_path):
    import pytest

    m = _manifest(spark, n_rows=5, n_epochs=1)
    with pytest.raises(ValueError, match="shard_size"):
        write_training_shards(m, str(tmp_path / "x"), shard_size=0)


def test_write_training_shards_empty_manifest(spark, tmp_path):
    """r16 ADVICE: an empty manifest writes only _SUCCESS; the
    write-audit read-back must report zero stats, not raise on the
    uninferrable schema."""
    from distributedqueryengine_spark.functions.packing import (
        write_training_shards,
    )

    empty = spark.createDataFrame([], "epoch long, pos long, doc_id long")
    stats = write_training_shards(empty, str(tmp_path / "shards_empty"))
    assert stats == {
        "n_rows": 0, "n_epochs": 0, "n_shards": 0, "shards_per_epoch": {},
    }
