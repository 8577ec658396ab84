"""Geospatial primitives: haversine distance and a grid-pruned radius
join.

The spatial sibling of the LSH band join (functions/dedup.py): an
all-pairs "what's within R km" query is O(n·m) as a cross join; the
scalable shape buckets both sides into a lat/lng grid whose cells are
at least R wide, joins on cell ids (one side exploded to its 3×3
neighborhood), and verifies the exact haversine distance on the
candidates only — candidates are bounded by local point density, never
|left|×|right|.

Grid sizing: cell height is R in latitude degrees; cell WIDTH uses the
longitude shrink at the dataset's highest |latitude| (1° lng =
111.32·cos(lat) km), i.e. the widest degree-radius any row needs, so
the 3×3 neighborhood is sufficient everywhere in the data. That
max-|lat| is a 1-row aggregate over both sides folded in via broadcast
cross join — no driver collect, and the cell ids stay a pure column
function shared by both sides. Latitudes beyond ±85° and radii that
straddle the antimeridian RAISE in-plan (the grid would silently miss
true neighbors there); polar/dateline data needs a proper spherical
index such as S2/H3.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0088
_KM_PER_DEG_LAT = 110.574
_KM_PER_DEG_LNG_EQ = 111.32


def haversine_km(lat1: Column, lng1: Column, lat2: Column, lng2: Column) -> Column:
    """Great-circle distance in km (pure JVM expression)."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1) / 2
    dlng = F.radians(lng2 - lng1) / 2
    a = F.sin(dlat) * F.sin(dlat) + F.cos(rlat1) * F.cos(rlat2) * F.sin(
        dlng
    ) * F.sin(dlng)
    return 2 * EARTH_RADIUS_KM * F.asin(F.sqrt(a))


def geo_radius_join(
    left: DataFrame,
    right: DataFrame,
    radius_km: float,
    lat_col: str = "lat",
    lng_col: str = "lng",
    suffixes: tuple[str, str] = ("_l", "_r"),
) -> DataFrame:
    """All (left, right) pairs within `radius_km` great-circle km, with
    a `distance_km` column. Columns from each side are suffixed.

    Plan: grid-cell equi-join (left exploded to its 3×3 neighborhood)
    + exact haversine filter — one shuffle on the cell id per side, no
    cross join (pinned in tests). See module docstring for sizing."""
    if radius_km <= 0:
        raise ValueError(f"radius_km must be positive, got {radius_km}")
    for side, name in ((left, "left"), (right, "right")):
        if lat_col not in side.columns or lng_col not in side.columns:
            raise ValueError(f"{name} side is missing {lat_col}/{lng_col}")

    # widest longitude degree-radius over BOTH sides; domain guards are
    # IN-PLAN (raise_error folded into the cell-width expression, same
    # pattern as timeseries.py's grid-size guard) so construction stays
    # lazy and no extra driver action is paid: |lat| > 85° or a radius
    # straddling the antimeridian would make the 3×3 neighborhood
    # silently MISS true neighbors — that must be a loud failure.
    both = left.select(
        F.abs(F.col(lat_col)).alias("al"), F.abs(F.col(lng_col)).alias("ag")
    ).unionByName(
        right.select(
            F.abs(F.col(lat_col)).alias("al"), F.abs(F.col(lng_col)).alias("ag")
        )
    )
    stats = both.agg(
        F.coalesce(F.max("al"), F.lit(0.0)).alias("__maxlat"),
        F.coalesce(F.max("ag"), F.lit(0.0)).alias("__maxalng"),
    )
    d_lat = radius_km / _KM_PER_DEG_LAT
    capped_lat = F.least(F.col("__maxlat"), F.lit(85.0))
    d_lng_deg = radius_km / (_KM_PER_DEG_LNG_EQ * F.cos(F.radians(capped_lat)))
    guard = (
        F.when(
            F.col("__maxlat") > 85.0,
            F.raise_error(
                F.concat(
                    F.lit("geo grid join supports |lat| <= 85 deg, got max "
                          "|lat| = "),
                    F.col("__maxlat").cast("string"),
                    F.lit("; polar data needs a spherical index (S2/H3)"),
                )
            ).cast("double"),
        )
        .when(
            F.col("__maxalng") + d_lng_deg > 180.0,
            F.raise_error(
                F.concat(
                    F.lit("radius straddles the antimeridian (max |lng| = "),
                    F.col("__maxalng").cast("string"),
                    F.lit(" deg + "),
                    d_lng_deg.cast("string"),
                    F.lit(" deg cell width crosses 180); the lat/lng grid "
                          "cannot see neighbors across the dateline"),
                )
            ).cast("double"),
        )
        .otherwise(F.lit(0.0))
    )
    # guard is 0.0 on the happy path; adding it to the cell width keeps
    # it REFERENCED (column pruning would silently drop a free-standing
    # guard column) and fires the raise wherever cells are computed.
    d_lng_expr = d_lng_deg + guard

    def cells(df: DataFrame, suffix: str, explode_neighbors: bool) -> DataFrame:
        renamed = df.select([F.col(c).alias(c + suffix) for c in df.columns])
        withs = renamed.crossJoin(F.broadcast(stats))
        cy = F.floor(F.col(lat_col + suffix) / d_lat)
        cx = F.floor(F.col(lng_col + suffix) / d_lng_expr)
        if explode_neighbors:
            withs = (
                withs.withColumn("__dy", F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)])))
                .withColumn("__dx", F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)])))
            )
            return withs.select(
                *[c for c in renamed.columns],
                (cy + F.col("__dy")).alias("__cy"),
                (cx + F.col("__dx")).alias("__cx"),
            )
        return withs.select(
            *[c for c in renamed.columns], cy.alias("__cy"), cx.alias("__cx")
        )

    sl, sr = suffixes
    lcells = cells(left, sl, explode_neighbors=True)
    rcells = cells(right, sr, explode_neighbors=False)
    dist = haversine_km(
        F.col(lat_col + sl), F.col(lng_col + sl),
        F.col(lat_col + sr), F.col(lng_col + sr),
    )
    return (
        lcells.join(rcells, ["__cy", "__cx"])
        .withColumn("distance_km", F.round(dist, 6))
        .filter(F.col("distance_km") <= radius_km)
        .drop("__cy", "__cx")
    )


def geo_knn_join(
    left: DataFrame,
    right: DataFrame,
    k: int,
    max_radius_km: float,
    lat_col: str = "lat",
    lng_col: str = "lng",
    suffixes: tuple[str, str] = ("_l", "_r"),
    left_id_col: str | None = None,
) -> DataFrame:
    """k nearest right-side points for each left row WITHIN
    `max_radius_km` (rnk 1..k by distance; ties by right row order
    columns are not assumed — supply distinct coordinates or accept
    arbitrary tie order among exactly-equal distances). The bounded
    radius is what keeps this scalable: unbounded kNN degenerates to
    all-pairs for isolated points, while a radius cap reuses the
    grid-pruned candidate set — the standard production contract
    ('nearest stores within 50 km').

    One window per left row over its candidate set on top of
    geo_radius_join's plan. The window PARTITION KEY is always one
    column: `left_id_col` when given (preferred — a real key makes
    identical-id rows explicitly one logical row), else a derived
    xxhash64 over the left row, so a wide left frame never shuffles
    its every column as the key. Rows identical on ALL left columns
    collapse into one kNN group either way (they have identical
    candidate sets; this matches the previous all-columns-key
    semantics)."""
    from pyspark.sql.window import Window

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    sl, _sr = suffixes
    derived = None
    if not left_id_col:
        hashable = [c for c, t in left.dtypes if not t.startswith("map")]
        if not hashable:
            raise ValueError(
                "left side has no hashable columns to derive a row id; "
                "pass left_id_col"
            )
        derived = "__knn_lid"
        left = left.withColumn(derived, F.xxhash64(*[F.col(c) for c in hashable]))
    pairs = geo_radius_join(
        left, right, max_radius_km, lat_col=lat_col, lng_col=lng_col, suffixes=suffixes
    )
    part_col = (left_id_col or derived) + sl
    w = Window.partitionBy(part_col).orderBy(F.col("distance_km").asc())
    out = (
        pairs.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= k)
    )
    return out.drop(derived + sl) if derived else out
