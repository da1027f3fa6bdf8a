"""MVT tile encode (SURVEY K4 — vector.cpp:227-360, mvt.h/mvt.cpp).

The reference walks each layer, assigns features to WebMercator tiles up
to the budgeted max zoom, and writes per-tile MVT payloads whose
geometries are QUANTIZED to tile-local integer coordinates in a 4096
extent grid — that quantization is the MVT geometry model (public
Mapbox Vector Tile spec 2.1).

Spark-first: the encode is pure column arithmetic — feature centroid →
normalized WebMercator position → (tile, local integer coords) — so a
planet-scale layer tiles in ONE scan and the per-tile grouping is the
natural shuffle key (tiles are also the physical partitioning of the
sink).  The protobuf framing of a real .mvt file is byte plumbing around
these integers and is out of scope here; the check verifies the hard
part (assignment + quantization + per-tile rollup) value-for-value
against the oracle.

``zoom_for_layer`` applies the reference's zoom budget (mvt.cpp:12-54,
already checked by ``mvt_zoom_budget``) to cap the requested zoom.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dronedb_spark.functions.geo import mvt_max_zoom
from dronedb_spark.operators.vector_query import FEATURES_SQL, features_df
from dronedb_spark.suite import check

EXTENT = 4096  # MVT spec default tile extent


def zoom_for_layer(features: DataFrame, dataset_id: str, layer: str, requested_zoom: int) -> int:
    """Requested zoom capped by the layer's MVT budget (X13): one tiny
    aggregate for the layer extent, then driver-side scalar math."""
    row = (
        features.filter((F.col("dataset_id") == dataset_id) & (F.col("layer") == layer))
        .agg(
            F.min("bbox_minx").alias("x0"),
            F.min("bbox_miny").alias("y0"),
            F.max("bbox_maxx").alias("x1"),
            F.max("bbox_maxy").alias("y1"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()[0]
    )
    area = (row["x1"] - row["x0"]) * (row["y1"] - row["y0"]) if row["n"] else 0.0
    return min(requested_zoom, mvt_max_zoom(area, feature_count=row["n"]))


def mvt_encode(features: DataFrame, zoom: int, extent: int = EXTENT) -> DataFrame:
    """Per-feature tile assignment + tile-local quantized coordinates.

    (u, v) ∈ [0, extent)² is the feature centroid snapped to the tile's
    integer grid — the coordinate every MVT geometry command consumes."""
    n = float(2**zoom)
    cx = (F.col("bbox_minx") + F.col("bbox_maxx")) / 2.0
    cy = (F.col("bbox_miny") + F.col("bbox_maxy")) / 2.0
    xn = (cx + 180.0) / 360.0
    lat_rad = F.radians(cy)
    yn = (1.0 - F.log(F.tan(lat_rad) + 1.0 / F.cos(lat_rad)) / math.pi) / 2.0
    tx = F.floor(xn * n)
    ty = F.floor(yn * n)
    u = F.floor((xn * n - tx) * extent).cast("int")
    v = F.floor((yn * n - ty) * extent).cast("int")
    return features.select(
        "dataset_id",
        "layer",
        "fid",
        "geom_type",
        F.lit(zoom).alias("z"),
        tx.cast("bigint").alias("tx"),
        ty.cast("bigint").alias("ty"),
        u.alias("u"),
        v.alias("v"),
    )


def mvt_tile_summary(encoded: DataFrame) -> DataFrame:
    """Per-tile rollup — feature count, count of DISTINCT quantized points
    (the MVT snap-dedup effect: features inside the same integer cell
    collapse), and the quantized extent actually touched."""
    return (
        encoded.groupBy("z", "tx", "ty")
        .agg(
            F.count(F.lit(1)).alias("n_features"),
            F.countDistinct("u", "v").alias("n_points"),
            F.min("u").alias("min_u"),
            F.max("u").alias("max_u"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
        )
        .orderBy("z", "tx", "ty")
    )


# ---------------------------------------------------------------- checks

_Z = 10


def _encode_sql(z: int) -> str:
    n = float(2**z)
    return f"""
    SELECT dataset_id, layer, fid, geom_type, {z} AS z,
           CAST(floor(xn * {n}) AS BIGINT) AS tx,
           CAST(floor(yn * {n}) AS BIGINT) AS ty,
           CAST(floor((xn * {n} - floor(xn * {n})) * {EXTENT}) AS INT) AS u,
           CAST(floor((yn * {n} - floor(yn * {n})) * {EXTENT}) AS INT) AS v
    FROM (
        SELECT dataset_id, layer, fid, geom_type,
               ((bbox_minx + bbox_maxx) / 2.0 + 180.0) / 360.0 AS xn,
               (1.0 - ln(tan(radians((bbox_miny + bbox_maxy) / 2.0))
                         + 1.0 / cos(radians((bbox_miny + bbox_maxy) / 2.0))) / pi()) / 2.0 AS yn
        FROM features) c
    """


@check(
    "mvt_tile_features",
    oracle=f"""
        WITH features AS ({FEATURES_SQL}),
        enc AS ({_encode_sql(_Z)})
        SELECT z, tx, ty, CAST(COUNT(1) AS BIGINT) AS n_features,
               CAST(COUNT(DISTINCT (u, v)) AS BIGINT) AS n_points,
               MIN(u) AS min_u, MAX(u) AS max_u, MIN(v) AS min_v, MAX(v) AS max_v
        FROM enc
        WHERE dataset_id = 'vec1' AND layer = 'parcels'
        GROUP BY z, tx, ty ORDER BY z, tx, ty""",
)
def q_mvt_tile_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = features_df(spark, sf_dir).filter(
        (F.col("dataset_id") == "vec1") & (F.col("layer") == "parcels")
    )
    return mvt_tile_summary(mvt_encode(feats, _Z))
