"""Geo radius join: exact-set equivalence with the brute-force cross
join + haversine on random points (boundary-straddling pairs included),
no-cartesian plan pin, and known-distance sanity."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from distributedqueryengine_spark.operators.geo import (
    geo_radius_join,
    haversine_km,
)


def _hav(lat1, lng1, lat2, lng2):
    r = 6371.0088
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dp = math.radians(lat2 - lat1) / 2
    dl = math.radians(lng2 - lng1) / 2
    a = math.sin(dp) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl) ** 2
    return 2 * r * math.asin(math.sqrt(a))


def test_haversine_known_distances(spark):
    # Paris (48.8566, 2.3522) — London (51.5074, -0.1278) ≈ 343.5 km
    row = spark.range(1).select(
        haversine_km(
            F.lit(48.8566), F.lit(2.3522), F.lit(51.5074), F.lit(-0.1278)
        ).alias("d")
    ).first()
    assert abs(row.d - 343.5) < 1.5
    # zero distance
    z = spark.range(1).select(
        haversine_km(F.lit(10.0), F.lit(20.0), F.lit(10.0), F.lit(20.0)).alias("d")
    ).first()
    assert z.d == 0.0


def test_geo_radius_join_matches_bruteforce(spark):
    """Random clustered points at mid/high latitude: the grid-pruned
    join returns EXACTLY the brute-force pair set at several radii."""
    rng = random.Random(21)
    # cluster around Oslo-ish (60N) where longitude shrink matters
    pts_l = [
        (i, 59.5 + rng.random(), 10.0 + 2 * rng.random()) for i in range(120)
    ]
    pts_r = [
        (j, 59.5 + rng.random(), 10.0 + 2 * rng.random()) for j in range(100)
    ]
    left = spark.createDataFrame(pts_l, "lid long, lat double, lng double")
    right = spark.createDataFrame(pts_r, "rid long, lat double, lng double")

    for radius in (3.0, 12.0, 40.0):
        got = sorted(
            (r.lid_l, r.rid_r)
            for r in geo_radius_join(left, right, radius).collect()
        )
        expect = sorted(
            (i, j)
            for i, la, lo in pts_l
            for j, ra, ro in pts_r
            if _hav(la, lo, ra, ro) <= radius
        )
        assert got == expect, radius
        assert expect, f"radius {radius} should match something"

    # distances agree with the python reference
    sample = geo_radius_join(left, right, 12.0).limit(20).collect()
    for r in sample:
        assert abs(r.distance_km - _hav(r.lat_l, r.lng_l, r.lat_r, r.lng_r)) < 1e-6


def test_geo_radius_join_plan_has_no_cartesian(spark):
    left = spark.createDataFrame(
        [(1, 10.0, 10.0)], "lid long, lat double, lng double"
    )
    right = spark.createDataFrame(
        [(2, 10.01, 10.01)], "rid long, lat double, lng double"
    )
    j = geo_radius_join(left, right, 5.0)
    plan = j._jdf.queryExecution().executedPlan().toString()
    # the only nested-loop allowed is the broadcast of the 1-row stats
    assert "CartesianProduct" not in plan, plan[:2000]
    assert j.count() == 1


def test_geo_knn_join_matches_bruteforce(spark):
    rng = random.Random(5)
    pts_l = [(i, 40.0 + rng.random(), -3.0 + rng.random()) for i in range(40)]
    pts_r = [(j, 40.0 + rng.random(), -3.0 + rng.random()) for j in range(60)]
    left = spark.createDataFrame(pts_l, "lid long, lat double, lng double")
    right = spark.createDataFrame(pts_r, "rid long, lat double, lng double")

    from distributedqueryengine_spark.operators.geo import geo_knn_join

    got = {}
    for r in geo_knn_join(left, right, k=3, max_radius_km=30.0, left_id_col="lid").collect():
        got.setdefault(r.lid_l, []).append((r.rnk, r.rid_r, r.distance_km))
    for lid, la, lo in pts_l:
        cands = sorted(
            (round(_hav(la, lo, ra, ro), 6), j)
            for j, ra, ro in pts_r
            if _hav(la, lo, ra, ro) <= 30.0
        )[:3]
        mine = sorted(got.get(lid, []))
        assert len(mine) == len(cands), lid
        for (rnk, rid, d), (ed, ej) in zip(mine, cands):
            assert abs(d - ed) < 1e-6 and rid == ej, (lid, rnk)


def test_geo_join_raises_on_polar_latitude(spark):
    """|lat| > 85° makes the lng-shrink grid wrong (cos→0): the guard
    raises in-plan instead of silently missing neighbors."""
    left = spark.createDataFrame(
        [(1, 88.0, 10.0)], "lid long, lat double, lng double"
    )
    right = spark.createDataFrame(
        [(2, 88.01, 10.01)], "rid long, lat double, lng double"
    )
    j = geo_radius_join(left, right, 5.0)  # construction stays lazy
    with pytest.raises(Exception, match="85"):
        j.count()


def test_geo_join_raises_on_antimeridian_straddle(spark):
    """Points whose radius crosses lng ±180 have grid neighbors the
    cell ids cannot see — loud raise, not silent misses."""
    left = spark.createDataFrame(
        [(1, 0.0, 179.99)], "lid long, lat double, lng double"
    )
    right = spark.createDataFrame(
        [(2, 0.0, -179.99)], "rid long, lat double, lng double"
    )
    j = geo_radius_join(left, right, 50.0)
    with pytest.raises(Exception, match="antimeridian"):
        j.count()


def test_geo_knn_join_derived_id_single_column_window(spark):
    """Without left_id_col the kNN window key is ONE derived hash
    column (never every left column), and results still match the
    explicit-id run."""
    from pyspark.sql.window import Window as _W  # noqa: F401

    from distributedqueryengine_spark.operators.geo import geo_knn_join

    rng = random.Random(9)
    pts_l = [
        (i, 40.0 + rng.random(), -3.0 + rng.random(), "x" * 50, i * 2.5)
        for i in range(25)
    ]
    pts_r = [(j, 40.0 + rng.random(), -3.0 + rng.random()) for j in range(40)]
    left = spark.createDataFrame(
        pts_l, "lid long, lat double, lng double, wide string, val double"
    )
    right = spark.createDataFrame(pts_r, "rid long, lat double, lng double")

    with_id = geo_knn_join(left, right, k=2, max_radius_km=30.0, left_id_col="lid")
    derived = geo_knn_join(left, right, k=2, max_radius_km=30.0)
    assert "__knn_lid_l" not in derived.columns
    a = sorted((r.lid_l, r.rnk, r.rid_r) for r in with_id.collect())
    b = sorted((r.lid_l, r.rnk, r.rid_r) for r in derived.collect())
    assert a == b
    # plan: the window partition spec is the single derived hash column
    plan = derived._jdf.queryExecution().optimizedPlan().toString()
    win = [ln for ln in plan.splitlines() if "Window" in ln and "row_number" in ln]
    assert win and "__knn_lid_l" in win[0], plan[:3000]
    assert "wide_l" not in win[0].split("windowspecdefinition")[-1].split("]")[0]
