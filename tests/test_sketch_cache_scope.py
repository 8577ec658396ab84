"""q_approx_sketches persists a shared exact-distinct aggregate; in a
long-lived session, repeated construction must not accumulate cached
partitions (r11 verdict item 5). Each construction evicts the previous
call's cache, so the session holds at most one copy."""

from distributedqueryengine_spark import inventory as inv

SF = "/root/testdata/sf0.001"


def _n_persistent_rdds(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def test_repeated_construction_no_net_cache_growth(spark):
    baseline = _n_persistent_rdds(spark)
    for _ in range(12):
        df = inv.q_approx_sketches(spark, SF)
        df.write.format("noop").mode("overwrite").save()  # materialize cache
        # net growth stays bounded at ONE construction's cached stages
        # (ex + exact + bstate), never accumulating across calls
        assert _n_persistent_rdds(spark) <= baseline + 3
    assert len(inv._SKETCH_SHARED_CACHE) == 3
    # evict the survivors so this test leaves the session as it found it
    while inv._SKETCH_SHARED_CACHE:
        inv._SKETCH_SHARED_CACHE.pop().unpersist()
    assert _n_persistent_rdds(spark) <= baseline
