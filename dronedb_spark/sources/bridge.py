"""File-bytes → operator-table bridges: a catalog of REAL .tif / .las
files becomes the pixel/point DataFrames every raster and point-cloud
operator in this engine already consumes.

This is the "switch path" a reference user needs: point the engine at a
directory of GeoTIFF DEMs or LAS tiles and run area stats / volumes /
contours / COPC pages on it — no synthetic tables involved.

Scale notes: the decode kernels are Arrow ``mapInPandas`` over the
distributed ``binaryFile`` scan, one task per file (the same layout a
1000-executor cluster wants: files are the natural parallel unit, no
shuffle before decode).  Pixel/point rows explode ~10^6 per file — the
same magnitude the synthetic pixel tables already exercise; downstream
aggregations are per-raster keyed so AQE can split skewed rasters.
Reference: GDAL raster open + PDAL pipeline → here a pure-Python decode
feeding Catalyst aggregations.
"""

from __future__ import annotations

import logging
from collections.abc import Iterator

_log = logging.getLogger(__name__)

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dronedb_spark.suite import check
from dronedb_spark.tables import spread

_PIXEL_SCHEMA = T.StructType(
    [
        T.StructField("raster_id", T.StringType()),
        T.StructField("row", T.IntegerType()),
        T.StructField("col", T.IntegerType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("world_x", T.DoubleType()),
        T.StructField("world_y", T.DoubleType()),
    ]
)

_POINT_SCHEMA = T.StructType(
    [
        T.StructField("cloud_id", T.StringType()),
        T.StructField("x", T.DoubleType()),
        T.StructField("y", T.DoubleType()),
        T.StructField("z", T.DoubleType()),
        T.StructField("intensity", T.LongType()),
        T.StructField("classification", T.LongType()),
        # populated for colored formats (LAS/LAZ point formats 2/3, 7/8)
        T.StructField("red", T.LongType()),
        T.StructField("green", T.LongType()),
        T.StructField("blue", T.LongType()),
        # populated for LAS 1.4 extended formats (PDRF 6-8)
        T.StructField("scan_angle", T.LongType()),
        T.StructField("return_number", T.LongType()),
        T.StructField("number_of_returns", T.LongType()),
        T.StructField("scanner_channel", T.LongType()),
        T.StructField("gps_time", T.DoubleType()),
    ]
)


def scan_binaries(spark: SparkSession, root: str, glob: str) -> DataFrame:
    """Distributed (path, content) scan — the decode input.

    ``file_name`` is the ROOT-RELATIVE path (not the basename): two files
    with the same name in different subdirectories must not share a
    raster_id/cloud_id, or their pixels/points would silently merge in
    per-raster aggregates on real recursive catalogs.
    """
    sep = root.rstrip("/") + "/"
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
        .load(root)
        .select(F.substring_index("path", sep, -1).alias("file_name"), "content")
    )


def tiff_pixel_table(files: DataFrame) -> DataFrame:
    """Decode GeoTIFF bytes → (raster_id, row, col, value, world_x,
    world_y) pixel rows; nodata pixels are dropped at the source (filter
    pushed into the decode kernel — never materialized)."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from dronedb_spark.sources.tiff import decode_tiff

        for pdf in it:
            for name, content in zip(pdf["file_name"], pdf["content"]):
                try:
                    arr, geo = decode_tiff(bytes(content))
                except Exception as ex:
                    # catch-and-skip: one corrupt / unsupported file (e.g.
                    # compressed TIFF) must not fail the whole job — mirror
                    # the reference's log-and-skip, and actually LOG it so a
                    # systematically broken codec path is observable in the
                    # executor logs rather than silently missing rows.
                    _log.warning("tiff_pixel_table: skipping %s: %s", name, ex)
                    continue
                h, w = arr.shape
                r = np.repeat(np.arange(h, dtype=np.int32), w)
                c = np.tile(np.arange(w, dtype=np.int32), h)
                v = arr.reshape(-1).astype(np.float64)
                if geo["nodata"] is not None:
                    keep = arr.reshape(-1) != np.array(geo["nodata"], dtype=arr.dtype)
                    r, c, v = r[keep], c[keep], v[keep]
                sx, sy = geo["pixel_scale"] or (1.0, 1.0)
                tx, ty = geo["tiepoint"] or (0.0, 0.0)
                yield pd.DataFrame(
                    {
                        "raster_id": name,
                        "row": r,
                        "col": c,
                        "value": v,
                        "world_x": tx + c * sx,
                        "world_y": ty - r * sy,
                    }
                )

    return files.mapInPandas(run, schema=_PIXEL_SCHEMA)


def las_point_table(files: DataFrame) -> DataFrame:
    """Decode LAS bytes → (cloud_id, x, y, z, intensity, classification)."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from dronedb_spark.sources.las import decode_las

        for pdf in it:
            for name, content in zip(pdf["file_name"], pdf["content"]):
                try:
                    d = decode_las(bytes(content))
                except Exception as ex:
                    # skip undecodable files, don't fail the job — logged so
                    # skipped inputs are visible (reference log-and-skip)
                    _log.warning("las_point_table: skipping %s: %s", name, ex)
                    continue
                yield pd.DataFrame(
                    {
                        "cloud_id": name,
                        "x": d["x"],
                        "y": d["y"],
                        "z": d["z"],
                        "intensity": d["intensity"],
                        "classification": d["classification"],
                        "red": d.get("red"),
                        "green": d.get("green"),
                        "blue": d.get("blue"),
                        "scan_angle": d.get("scan_angle"),
                        "return_number": d.get("return_number"),
                        "number_of_returns": d.get("number_of_returns"),
                        "scanner_channel": d.get("scanner_channel"),
                        "gps_time": d.get("gps_time"),
                    }
                )

    return files.mapInPandas(run, schema=_POINT_SCHEMA)


# ---------------------------------------------------------------- checks

_TC_N, _TC_W = 4, 64


def _tiff_catalog_root() -> str:
    import os

    from dronedb_spark.sources.tiff import encode_tiff

    root = os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", "..", "tests", "fixtures", "tiff_cat_v1")
    )
    os.makedirs(root, exist_ok=True)
    for i in range(_TC_N):
        h = 40 + 8 * i
        r = np.arange(h, dtype=np.int64)[:, None]
        c = np.arange(_TC_W, dtype=np.int64)[None, :]
        v = (((i * 7 + r * 13 + c * 29) % 997) * 0.25).astype(np.float32)
        v[(r * 31 + c * 17) % 53 == 0] = np.float32(-9999.0)
        payload = encode_tiff(
            v, pixel_scale=(0.5, 0.5), tiepoint=(1000.0 + i, 2000.0),
            nodata=-9999.0, rows_per_strip=16,
        )
        p = os.path.join(root, f"dem_{i}.tif")
        if not os.path.exists(p) or open(p, "rb").read() != payload:
            with open(p, "wb") as f:
                f.write(payload)
        os.utime(p, (1700000000, 1700000000))
    return root


@check(
    "tiff_catalog_area_stats",
    oracle=f"""
        WITH px AS (
            SELECT 'dem_' || i.i || '.tif' AS raster_id,
                   CAST((i.i * 7 + r.r * 13 + c.c * 29) % 997 AS DOUBLE) * 0.25 AS v,
                   1000.0 + i.i + c.c * 0.5 AS world_x
            FROM (SELECT unnest(range(0, {_TC_N})) AS i) i,
                 (SELECT unnest(range(0, 40 + 8 * {_TC_N - 1})) AS r) r,
                 (SELECT unnest(range(0, {_TC_W})) AS c) c
            WHERE r.r < 40 + 8 * i.i AND (r.r * 31 + c.c * 17) % 53 <> 0)
        SELECT raster_id, COUNT(*) AS n_valid, MIN(v) AS v_min, MAX(v) AS v_max,
               SUM(v) AS v_sum, MIN(world_x) AS wx_min, MAX(world_x) AS wx_max
        FROM px GROUP BY raster_id ORDER BY raster_id""",
)
def q_tiff_catalog_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL .tif catalog → distributed decode → per-raster grouped stats:
    the multiraster_area_stats shape running on actual GeoTIFF bytes,
    georeferencing included (world_x from pixel scale + tiepoint)."""
    files = scan_binaries(spark, _tiff_catalog_root(), "*.tif")
    pixels = tiff_pixel_table(spread(files))
    return (
        pixels.groupBy("raster_id")
        .agg(
            F.count(F.lit(1)).alias("n_valid"),
            F.min("value").alias("v_min"),
            F.max("value").alias("v_max"),
            # quarter-integer pixels: the double sum is exact in any order
            F.sum("value").alias("v_sum"),
            F.min("world_x").alias("wx_min"),
            F.max("world_x").alias("wx_max"),
        )
        .orderBy("raster_id")
    )


_LC_N = 3


def _las_catalog_root() -> str:
    import os

    from dronedb_spark.sources.las import encode_las

    root = os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", "..", "tests", "fixtures", "las_cat_v1")
    )
    os.makedirs(root, exist_ok=True)
    for i in range(_LC_N):
        n = 4000 + 500 * i
        k = np.arange(n, dtype=np.int64)
        x = ((i * 17 + k * 5) % 100000).astype(np.float64) * 0.001
        y = ((i * 13 + k * 9) % 100000).astype(np.float64) * 0.001
        z = ((i * 23 + k * 3) % 50000).astype(np.float64) * 0.001
        payload = encode_las(x, y, z, classification=(i + k) % 12)
        p = os.path.join(root, f"tile_{i}.las")
        if not os.path.exists(p) or open(p, "rb").read() != payload:
            with open(p, "wb") as f:
                f.write(payload)
        os.utime(p, (1700000000, 1700000000))
    return root


@check(
    "las_catalog_tile_counts",
    oracle=f"""
        WITH pts AS (
            SELECT CAST((i.i * 17 + k.k * 5) % 100000 AS DOUBLE) * 0.001 AS x,
                   CAST((i.i * 13 + k.k * 9) % 100000 AS DOUBLE) * 0.001 AS y,
                   CAST((i.i * 23 + k.k * 3) % 50000 AS DOUBLE) * 0.001 AS z
            FROM (SELECT unnest(range(0, {_LC_N})) AS i) i,
                 (SELECT unnest(range(0, 4000 + 500 * {_LC_N - 1})) AS k) k
            WHERE k.k < 4000 + 500 * i.i)
        SELECT CAST(floor(x / 100.0 * 4.0) AS BIGINT) AS tx,
               CAST(floor(y / 100.0 * 4.0) AS BIGINT) AS ty,
               CAST(floor(x % 25.0 / 25.0 * 16.0) AS BIGINT) AS px,
               CAST(floor(y % 25.0 / 25.0 * 16.0) AS BIGINT) AS py,
               CAST(COUNT(1) AS BIGINT) AS n, MAX(z) AS z_max
        FROM pts GROUP BY 1, 2, 3, 4 ORDER BY tx, ty, px, py""",
)
def q_las_catalog_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL .las catalog → distributed decode → the R8/K8 tile-raster
    aggregation (per (tile, pixel) count + max z) on actual LAS bytes."""
    from dronedb_spark.raster.points import pointcloud_tile_raster

    files = scan_binaries(spark, _las_catalog_root(), "*.las")
    points = las_point_table(spread(files))
    return pointcloud_tile_raster(points, extent=100.0, zoom_cells=4, px=16)


_LZ_N = 3


def _laz_catalog_root() -> str:
    """REAL .laz fixture catalog: closed-form coordinates so the decoded
    values are SQL-reproducible; chunk_size=1000 exercises the multi-chunk
    stream + chunk-table path of the LASzip decoder."""
    import os

    from dronedb_spark.sources.laz import encode_laz

    root = os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", "..", "tests", "fixtures", "laz_cat_v1")
    )
    os.makedirs(root, exist_ok=True)
    for i in range(_LZ_N):
        n = 3000 + 500 * i
        k = np.arange(n, dtype=np.int64)
        x = ((i * 17 + k * 5) % 100000).astype(np.float64) * 0.001
        y = ((i * 13 + k * 9) % 100000).astype(np.float64) * 0.001
        z = ((i * 23 + k * 3) % 50000).astype(np.float64) * 0.001
        payload = encode_laz(
            x, y, z,
            classification=((i + k) % 12),
            intensity=((k * 29) % 4096),
            chunk_size=1000,
        )
        p = os.path.join(root, f"tile_{i}.laz")
        if not os.path.exists(p) or open(p, "rb").read() != payload:
            with open(p, "wb") as f:
                f.write(payload)
        os.utime(p, (1700000000, 1700000000))
    return root


@check(
    "pointcloud_laz_stats",
    oracle=f"""
        WITH pts AS (
            SELECT 'tile_' || i.i || '.laz' AS cloud_id,
                   CAST((i.i * 17 + k.k * 5) % 100000 AS DOUBLE) * 0.001 AS x,
                   CAST((i.i * 13 + k.k * 9) % 100000 AS DOUBLE) * 0.001 AS y,
                   CAST((i.i * 23 + k.k * 3) % 50000 AS DOUBLE) * 0.001 AS z,
                   (i.i + k.k) % 12 AS cls, (k.k * 29) % 4096 AS inten
            FROM (SELECT unnest(range(0, {_LZ_N})) AS i) i,
                 (SELECT unnest(range(0, 3000 + 500 * {_LZ_N - 1})) AS k) k
            WHERE k.k < 3000 + 500 * i.i)
        SELECT cloud_id, CAST(COUNT(1) AS BIGINT) AS n,
               MIN(x) AS x_min, MAX(x) AS x_max,
               MIN(y) AS y_min, MAX(y) AS y_max,
               MIN(z) AS z_min, MAX(z) AS z_max,
               CAST(SUM(cls) AS BIGINT) AS cls_sum,
               CAST(SUM(inten) AS BIGINT) AS inten_sum,
               CAST(SUM(CASE WHEN cls = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_ground
        FROM pts GROUP BY cloud_id ORDER BY cloud_id""",
)
def q_laz_catalog_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL .laz catalog → distributed LASzip decode (mapInPandas, one
    file per task) → per-cloud stats.  The decompressor runs where the
    bytes are; no shuffle precedes the decode, so the layout holds on a
    1000-executor cluster ingesting millions of tiles."""
    files = scan_binaries(spark, _laz_catalog_root(), "*.laz")
    points = las_point_table(spread(files))
    return (
        points.groupBy("cloud_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("x").alias("x_min"), F.max("x").alias("x_max"),
            F.min("y").alias("y_min"), F.max("y").alias("y_max"),
            F.min("z").alias("z_min"), F.max("z").alias("z_max"),
            F.sum("classification").alias("cls_sum"),
            F.sum("intensity").alias("inten_sum"),
            F.sum(F.when(F.col("classification") == 2, 1).otherwise(0)).alias("n_ground"),
        )
        .orderBy("cloud_id")
    )


_LZC_N = 2


def _laz_rgb_catalog_root() -> str:
    """Colored .laz fixtures (point format 3: GPS time + RGB)."""
    import os

    from dronedb_spark.sources.laz import encode_laz

    root = os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", "..", "tests", "fixtures", "laz_rgb_v1")
    )
    os.makedirs(root, exist_ok=True)
    for i in range(_LZC_N):
        n = 2000 + 400 * i
        k = np.arange(n, dtype=np.int64)
        x = ((i * 11 + k * 7) % 80000).astype(np.float64) * 0.001
        y = ((i * 19 + k * 3) % 80000).astype(np.float64) * 0.001
        z = ((i * 5 + k * 13) % 40000).astype(np.float64) * 0.001
        rgb = np.stack(
            [(k * 97 + i) % 65536, (k * 53 + i * 7) % 65536, (k * 29 + i * 13) % 65536],
            axis=1,
        ).astype(np.uint16)
        gps = 100000.0 + k * 0.0001
        payload = encode_laz(x, y, z, gps_time=gps, rgb=rgb, chunk_size=700)
        p = os.path.join(root, f"color_{i}.laz")
        if not os.path.exists(p) or open(p, "rb").read() != payload:
            with open(p, "wb") as f:
                f.write(payload)
        os.utime(p, (1700000000, 1700000000))
    return root


@check(
    "pointcloud_laz_rgb_stats",
    oracle=f"""
        WITH pts AS (
            SELECT 'color_' || i.i || '.laz' AS cloud_id,
                   (k.k * 97 + i.i) % 65536 AS r,
                   (k.k * 53 + i.i * 7) % 65536 AS g,
                   (k.k * 29 + i.i * 13) % 65536 AS b,
                   CAST((i.i * 5 + k.k * 13) % 40000 AS DOUBLE) * 0.001 AS z
            FROM (SELECT unnest(range(0, {_LZC_N})) AS i) i,
                 (SELECT unnest(range(0, 2000 + 400 * {_LZC_N - 1})) AS k) k
            WHERE k.k < 2000 + 400 * i.i)
        SELECT cloud_id, CAST(COUNT(1) AS BIGINT) AS n,
               CAST(SUM(r) AS BIGINT) AS r_sum, CAST(MAX(r) AS BIGINT) AS r_max,
               CAST(SUM(g) AS BIGINT) AS g_sum, CAST(SUM(b) AS BIGINT) AS b_sum,
               MAX(z) AS z_max
        FROM pts GROUP BY cloud_id ORDER BY cloud_id""",
)
def q_laz_rgb_catalog_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Colored .laz catalog (point format 3: POINT10+GPSTIME11+RGB12) →
    distributed LASzip decode → per-cloud RGB aggregates: gates the RGB12
    arithmetic layer on real compressed bytes."""
    files = scan_binaries(spark, _laz_rgb_catalog_root(), "*.laz")
    points = las_point_table(spread(files))
    return (
        points.groupBy("cloud_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("red").alias("r_sum"), F.max("red").alias("r_max"),
            F.sum("green").alias("g_sum"), F.sum("blue").alias("b_sum"),
            F.max("z").alias("z_max"),
        )
        .orderBy("cloud_id")
    )


_L14_N = 3


def _laz14_catalog_root() -> str:
    """LAS 1.4 / LASzip v3 fixtures: files 0-1 are PDRF 6 (extended
    returns, scanner channels, 16-bit scan angles), file 2 is PDRF 8
    (+RGB+NIR) — all closed-form so decoded values are SQL-reproducible.
    chunk_size=900 exercises the multi-chunk layered stream."""
    import os

    from dronedb_spark.sources.laz14 import encode_laz14

    root = os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", "..", "tests", "fixtures", "laz14_cat_v1")
    )
    os.makedirs(root, exist_ok=True)
    for i in range(_L14_N):
        n = 2500 + 400 * i
        k = np.arange(n, dtype=np.int64)
        kw = {}
        if i == 2:
            kw["rgb"] = np.stack(
                [(k * 97 + i) % 65536, (k * 53) % 65536, (k * 29) % 65536], axis=1
            ).astype(np.uint16)
            kw["nir"] = ((k * 41) % 65536).astype(np.uint16)
        payload = encode_laz14(
            ((i * 17 + k * 5) % 90000).astype(np.float64) * 0.001,
            ((i * 13 + k * 9) % 90000).astype(np.float64) * 0.001,
            ((i * 23 + k * 3) % 45000).astype(np.float64) * 0.001,
            classification=(i + k) % 32,
            intensity=(k * 31) % 5000,
            gps_time=150000.0 + i * 1000 + k * 0.0005,
            return_number=k % 4 + 1,
            number_of_returns=np.full(n, 4),
            scanner_channel=(k + i) % 4,
            scan_angle=(k * 11 + i * 7) % 6001 - 3000,
            point_source=(k // 50 + i) % 20,
            chunk_size=900,
            **kw,
        )
        p = os.path.join(root, f"ext_{i}.laz")
        if not os.path.exists(p) or open(p, "rb").read() != payload:
            with open(p, "wb") as f:
                f.write(payload)
        os.utime(p, (1700000000, 1700000000))
    return root


@check(
    "pointcloud_laz14_stats",
    oracle=f"""
        WITH pts AS (
            SELECT 'ext_' || i.i || '.laz' AS cloud_id,
                   CAST((i.i * 17 + k.k * 5) % 90000 AS DOUBLE) * 0.001 AS x,
                   CAST((i.i * 23 + k.k * 3) % 45000 AS DOUBLE) * 0.001 AS z,
                   (i.i + k.k) % 32 AS cls, (k.k * 31) % 5000 AS inten,
                   (k.k * 11 + i.i * 7) % 6001 - 3000 AS angle,
                   k.k % 4 + 1 AS rn, (k.k + i.i) % 4 AS ch,
                   150000.0 + i.i * 1000 + k.k * 0.0005 AS gps,
                   CASE WHEN i.i = 2 THEN (k.k * 97 + i.i) % 65536 END AS r
            FROM (SELECT unnest(range(0, {_L14_N})) AS i) i,
                 (SELECT unnest(range(0, 2500 + 400 * {_L14_N - 1})) AS k) k
            WHERE k.k < 2500 + 400 * i.i)
        SELECT cloud_id, CAST(COUNT(1) AS BIGINT) AS n,
               MIN(x) AS x_min, MAX(x) AS x_max,
               MIN(z) AS z_min, MAX(z) AS z_max,
               CAST(SUM(cls) AS BIGINT) AS cls_sum,
               CAST(SUM(inten) AS BIGINT) AS inten_sum,
               CAST(SUM(angle) AS BIGINT) AS angle_sum,
               CAST(SUM(rn) AS BIGINT) AS rn_sum,
               CAST(SUM(CASE WHEN ch = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_ch1,
               MIN(gps) AS gps_min, MAX(gps) AS gps_max,
               CAST(COALESCE(SUM(r), -1) AS BIGINT) AS r_sum
        FROM pts GROUP BY cloud_id ORDER BY cloud_id""",
)
def q_laz14_catalog_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAS 1.4 / LASzip v3 catalog → distributed layered decode →
    per-cloud stats over the PDRF6 extended fields (4-bit returns,
    scanner channel, i16 scan angle) + RGB for the PDRF8 file.  Same
    scale layout as pointcloud_laz_stats: one file per task, decode
    before any shuffle.  r_sum COALESCEs to -1 for the colorless files
    (driver comparator sorts row tuples; NULL is unordered)."""
    files = scan_binaries(spark, _laz14_catalog_root(), "*.laz")
    points = las_point_table(spread(files))
    return (
        points.groupBy("cloud_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("x").alias("x_min"), F.max("x").alias("x_max"),
            F.min("z").alias("z_min"), F.max("z").alias("z_max"),
            F.sum("classification").alias("cls_sum"),
            F.sum("intensity").alias("inten_sum"),
            F.sum("scan_angle").alias("angle_sum"),
            F.sum("return_number").alias("rn_sum"),
            F.sum(F.when(F.col("scanner_channel") == 1, 1).otherwise(0)).alias("n_ch1"),
            F.min("gps_time").alias("gps_min"), F.max("gps_time").alias("gps_max"),
            F.coalesce(F.sum("red"), F.lit(-1)).cast("bigint").alias("r_sum"),
        )
        .orderBy("cloud_id")
    )
