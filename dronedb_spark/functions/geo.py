"""Geospatial scalar functions as column arithmetic (SURVEY §2.7 math/geo).

Reference: WebMercator tile math (tiler.cpp:132-225), haversine
(raster_profile.cpp:35-44), UTM zone (geo.cpp), MVT max-zoom budget
(mvt.cpp:12-54).  All pure column expressions — Catalyst folds constants
and keeps them in whole-stage codegen.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dronedb_spark.catalog.derive import entries_df, with_catalog
from dronedb_spark.suite import check

EARTH_RADIUS_M = 6378137.0


def mercator_resolution(zoom: int, tile_size: int = 256) -> float:
    """Meters per pixel at a WebMercator zoom (GlobalMercator::resolution,
    tiler.cpp:204-206)."""
    return 2.0 * math.pi * EARTH_RADIUS_M / tile_size / (2 ** zoom)


def zoom_for_length(meter_length: float, tile_size: int = 256) -> int:
    """The zoom whose TILE span best matches a ground length —
    round(log2(initialResolution / length * tileSize)), the thumbnail /
    preview zoom pick (GlobalMercator::zoomForLength, tiler.cpp:209-212)."""
    initial = 2.0 * math.pi * EARTH_RADIUS_M / tile_size
    return round(math.log(initial / meter_length * tile_size) / math.log(2))


def zoom_for_pixel_size(pixel_size: float, tile_size: int = 256,
                        max_zoom: int = 32) -> int:
    """The deepest zoom whose resolution is still coarser than the
    raster's own pixel size (GlobalMercator::zoomForPixelSize,
    tiler.cpp:214-225): first i with pixelSize > resolution(i) → i-1;
    never negative (the reference clamps at 0 via its caller)."""
    for i in range(max_zoom):
        if pixel_size > mercator_resolution(i, tile_size):
            return max(i - 1, 0)
    return max_zoom - 1


def lonlat_to_tile(lon: Column, lat: Column, zoom: int) -> tuple[Column, Column]:
    """XYZ tile indices (gdaltiler semantics; z fixed per call so 2^z is a
    folded constant)."""
    n = float(2**zoom)
    tx = F.floor((lon + 180.0) / 360.0 * n).cast("bigint")
    lat_rad = F.radians(lat)
    ty = F.floor(
        (1.0 - F.log(F.tan(lat_rad) + 1.0 / F.cos(lat_rad)) / math.pi) / 2.0 * n
    ).cast("bigint")
    return tx, ty


def tms_flip(ty: Column, zoom: int) -> Column:
    """TMS ↔ XYZ y flip (tiler.cpp:223-225)."""
    return F.lit(float(2**zoom) - 1).cast("bigint") - ty


def utm_zone(lon: Column) -> Column:
    """UTM zone from longitude (entry.cpp:772-829 uses the standard
    formula)."""
    return (F.floor((lon + 180.0) / 6.0) % 60 + 1).cast("int")


def haversine_m(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    """Great-circle distance in meters (raster_profile.cpp:35-44)."""
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlon / 2) * F.sin(dlon / 2)
    )
    return 2 * EARTH_RADIUS_M * F.asin(F.sqrt(a))


def mvt_max_zoom(area_deg2: float, tile_budget: int = 10000, feature_count: int = -1) -> int:
    """MVT zoom budget: z = floor(0.5·log2(budget·64800/areaDeg2)),
    clamped to [5, 18]; extents > 10% of the globe forced to 5
    (mvt.h:33-45, mvt.cpp:12-54).  Driver-side arithmetic (SURVEY X13).
    feature_count == 0 (explicitly empty layer) → max cap; negative is
    OGR's "unknown count" and falls through to the area heuristic
    (tests/mvt_density_test.cpp:20-31)."""
    if feature_count == 0:
        return 18
    if area_deg2 <= 0:
        return 18
    if area_deg2 > 0.10 * 64800.0:
        return 5
    z = int(math.floor(0.5 * math.log2(tile_budget * 64800.0 / area_deg2)))
    return max(5, min(18, z))


def tile_assignment(entries: DataFrame, zoom: int) -> DataFrame:
    """Per-entry web tile at a zoom + per-tile counts — the grouping key of
    the tile-pyramid materialization (R7/K7)."""
    geo = entries.filter(F.col("point_lon").isNotNull())
    tx, ty = lonlat_to_tile(F.col("point_lon"), F.col("point_lat"), zoom)
    tiles = geo.select("path", tx.alias("tx"), ty.alias("ty"), utm_zone(F.col("point_lon")).alias("utm"))
    return tiles.orderBy("path")


# ---------------------------------------------------------------- checks


@check(
    "webmercator_tiles_z12",
    oracle=with_catalog(
        """SELECT path,
                  CAST(floor((point_lon + 180.0) / 360.0 * 4096.0) AS BIGINT) AS tx,
                  CAST(floor((1.0 - ln(tan(radians(point_lat)) + 1.0 / cos(radians(point_lat)))
                        / pi()) / 2.0 * 4096.0) AS BIGINT) AS ty,
                  CAST((floor((point_lon + 180.0) / 6.0) % 60 + 1) AS INT) AS utm
           FROM entries WHERE point_lon IS NOT NULL ORDER BY path"""
    ),
)
def q_tile_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tile_assignment(entries_df(spark, sf_dir), zoom=12)


@check(
    "haversine_to_origin",
    oracle=with_catalog(
        """SELECT path,
                  ROUND(2 * 6378137.0 * asin(sqrt(
                      sin(radians(point_lat - 46.84) / 2) * sin(radians(point_lat - 46.84) / 2)
                      + cos(radians(46.84)) * cos(radians(point_lat))
                        * sin(radians(point_lon - (-91.99)) / 2)
                        * sin(radians(point_lon - (-91.99)) / 2))), 2) AS dist_m
           FROM entries WHERE point_lon IS NOT NULL ORDER BY path"""
    ),
)
def q_haversine(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = entries_df(spark, sf_dir).filter(F.col("point_lon").isNotNull())
    return e.select(
        "path",
        F.round(
            haversine_m(F.col("point_lon"), F.col("point_lat"), F.lit(-91.99), F.lit(46.84)), 2
        ).alias("dist_m"),
    ).orderBy("path")


def tile_pyramid_counts(entries: DataFrame, zooms: tuple[int, ...] = (3, 6, 9)) -> DataFrame:
    """R7/K7 materialization shape: per-(z, tx, ty) entry counts for a
    pyramid of zoom levels — the groupBy that backs web-tile generation.
    Equirectangular tiling (pure arithmetic) so the grouping key is
    bit-reproducible across engines; the WebMercator variant is
    webmercator_tiles_z12."""
    geo = entries.filter(F.col("point_lon").isNotNull())
    per_zoom = []
    for z in zooms:
        n = float(2**z)
        tx = F.floor((F.col("point_lon") + 180.0) / 360.0 * n).cast("bigint")
        ty = F.floor((90.0 - F.col("point_lat")) / 180.0 * n).cast("bigint")
        per_zoom.append(
            geo.select(F.lit(z).alias("z"), tx.alias("tx"), ty.alias("ty"))
        )
    allz = per_zoom[0]
    for df in per_zoom[1:]:
        allz = allz.unionByName(df)
    return allz.groupBy("z", "tx", "ty").agg(F.count(F.lit(1)).alias("n")).orderBy("z", "tx", "ty")


_PYRAMID_ORACLE = with_catalog(
    """SELECT z, tx, ty, CAST(COUNT(1) AS BIGINT) AS n
       FROM (
           SELECT 3 AS z,
                  CAST(floor((point_lon + 180.0) / 360.0 * 8.0) AS BIGINT) AS tx,
                  CAST(floor((90.0 - point_lat) / 180.0 * 8.0) AS BIGINT) AS ty
           FROM entries WHERE point_lon IS NOT NULL
           UNION ALL
           SELECT 6 AS z,
                  CAST(floor((point_lon + 180.0) / 360.0 * 64.0) AS BIGINT) AS tx,
                  CAST(floor((90.0 - point_lat) / 180.0 * 64.0) AS BIGINT) AS ty
           FROM entries WHERE point_lon IS NOT NULL
           UNION ALL
           SELECT 9 AS z,
                  CAST(floor((point_lon + 180.0) / 360.0 * 512.0) AS BIGINT) AS tx,
                  CAST(floor((90.0 - point_lat) / 180.0 * 512.0) AS BIGINT) AS ty
           FROM entries WHERE point_lon IS NOT NULL
       ) t
       GROUP BY z, tx, ty ORDER BY z, tx, ty"""
)


@check("tile_pyramid_counts", oracle=_PYRAMID_ORACLE)
def q_tile_pyramid(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tile_pyramid_counts(entries_df(spark, sf_dir))


_MVT_ZOOM_SQL = """
SELECT path, ROUND(area, 9) AS area_deg2,
       CASE WHEN area <= 0.0 THEN 18
            WHEN area > 6480.0 THEN 5
            ELSE GREATEST(5, LEAST(18, CAST(FLOOR(0.5 * LOG2(10000.0 * 64800.0 / area)) AS INT)))
       END AS maxzoom
FROM (SELECT path, (bbox_maxx - bbox_minx) * (bbox_maxy - bbox_miny) AS area
      FROM entries WHERE bbox_minx IS NOT NULL) t
ORDER BY path"""


@check("mvt_zoom_budget", oracle=with_catalog(_MVT_ZOOM_SQL))
def q_mvt_zoom_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X13 (mvt.h:33-45, mvt.cpp:12-54) as a per-entry column: maxzoom =
    floor(0.5·log2(budget·64800/areaDeg2)) clamped [5,18], world-scale
    extents (>10% of the globe) forced to 5, degenerate extents to 18.
    Pure column arithmetic — the pre-flight work bound is computable for a
    million datasets in one scan (SQL text shared verbatim with the
    oracle; mvt_max_zoom above is the driver-side scalar twin)."""
    from dronedb_spark.catalog.derive import entries_sql
    from dronedb_spark.tables import register_views

    register_views(spark, sf_dir, ["documents"])
    return spark.sql(with_catalog(_MVT_ZOOM_SQL))
