"""Point-cloud table operators: COPC-style z-order clustering and
point-cloud web tiles (SURVEY K6, K8, R8).

The reference materializes COPC (cloud-optimized, spatially clustered
LAZ, pointcloud.cpp:661) and renders point clouds to raster web tiles
(pctiler.cpp).  On Spark the point cloud is a ``points`` table
(pid, x, y, z, intensity):

* COPC ≈ clustering the table by a Morton (z-order) key — the same
  interleaved-bits locality COPC pages give; at scale this is the
  bucketing/sort key for the Parquet layout (``write.bucketBy`` /
  ``sortWithinPartitions``).  The Morton key is pure integer arithmetic,
  generated once and shared verbatim with the DuckDB oracle.
* Tiles ≈ groupBy (tile, pixel) counts — the rasterization core: per
  256×256 web tile, the count/max-z per pixel cell.

The synthetic points table is derived deterministically from ``range``
(two gaussian-free clusters via modular arithmetic — no testdata point
fixture exists).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dronedb_spark.suite import check

N_POINTS = 20000
MORTON_BITS = 8  # 8 bits/axis → 65536 buckets

_POINTS_BODY = """
SELECT id AS pid,
       CAST(((id * 7919) % 100000) AS DOUBLE) / 100.0 AS x,
       CAST(((id * 104729) % 100000) AS DOUBLE) / 100.0 AS y,
       CAST(((id * 131) % 5000) AS DOUBLE) / 100.0 AS z,
       CAST((id * 37) % 256 AS INT) AS intensity
FROM {ids}
"""


def points_sql(dialect: str) -> str:
    ids = (
        f"range(0, {N_POINTS})"
        if dialect == "spark"
        else f"(SELECT range AS id FROM range({N_POINTS}))"
    )
    return _POINTS_BODY.format(ids=ids)


def points_df(spark: SparkSession) -> DataFrame:
    return spark.sql(points_sql("spark"))


def _norm_cell(coord: str, extent: float, cells: int) -> str:
    """0..cells-1 integer cell for a coordinate in [0, extent)."""
    return f"CAST(floor({coord} / {extent} * {cells}.0) AS BIGINT)"


def morton_sql(xcell: str, ycell: str, bits: int = MORTON_BITS) -> str:
    """Interleave the low `bits` of two cell indices — pure +,*,%,
    floor-div arithmetic so Spark and DuckDB produce identical keys."""
    terms = []
    for i in range(bits):
        p = 2**i
        terms.append(f"((({xcell}) - (({xcell}) % {2 * p})) / {p}) % 2 * {4**i}")
        terms.append(f"((({ycell}) - (({ycell}) % {2 * p})) / {p}) % 2 * {2 * 4**i}")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def copc_zorder(points: DataFrame, extent: float = 1000.0) -> DataFrame:
    """Morton bucket per point + per-bucket stats — the COPC clustering
    layout profile.  Writing the table sorted by this key gives COPC-like
    spatial locality in Parquet row groups."""
    xc = _norm_cell("x", extent, 2**MORTON_BITS)
    yc = _norm_cell("y", extent, 2**MORTON_BITS)
    with_key = points.withColumn("morton", F.expr(morton_sql(xc, yc)))
    return (
        with_key.groupBy((F.col("morton") - F.col("morton") % 256).alias("morton_page"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("z").alias("z_min"),
            F.max("z").alias("z_max"),
        )
        .orderBy("morton_page")
    )


def pointcloud_tile_raster(
    points: DataFrame, extent: float = 1000.0, zoom_cells: int = 4, px: int = 16
) -> DataFrame:
    """R8/K8 relational core: per (tile, pixel) point count + max z —
    exactly the aggregation the tile renderer colors circles from."""
    tx = F.expr(_norm_cell("x", extent, zoom_cells))
    ty = F.expr(_norm_cell("y", extent, zoom_cells))
    pxc = F.expr(_norm_cell(f"x % {extent / zoom_cells}", extent / zoom_cells, px))
    pyc = F.expr(_norm_cell(f"y % {extent / zoom_cells}", extent / zoom_cells, px))
    return (
        points.groupBy(
            tx.alias("tx"), ty.alias("ty"), pxc.alias("px"), pyc.alias("py")
        )
        .agg(F.count(F.lit(1)).alias("n"), F.max("z").alias("z_max"))
        .orderBy("tx", "ty", "px", "py")
    )


# ---------------------------------------------------------------- checks


@check(
    "copc_zorder_pages",
    oracle=f"""
        WITH points AS ({points_sql("duckdb")}),
        keyed AS (
            SELECT z, {morton_sql(_norm_cell("x", 1000.0, 256), _norm_cell("y", 1000.0, 256))} AS morton
            FROM points)
        SELECT morton - morton % 256 AS morton_page,
               CAST(COUNT(1) AS BIGINT) AS n,
               MIN(z) AS z_min, MAX(z) AS z_max
        FROM keyed GROUP BY morton - morton % 256 ORDER BY morton_page""",
)
def q_copc_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    return copc_zorder(points_df(spark))


@check(
    "pointcloud_tile_raster",
    oracle=f"""
        WITH points AS ({points_sql("duckdb")})
        SELECT {_norm_cell("x", 1000.0, 4)} AS tx,
               {_norm_cell("y", 1000.0, 4)} AS ty,
               {_norm_cell("x % 250.0", 250.0, 16)} AS px,
               {_norm_cell("y % 250.0", 250.0, 16)} AS py,
               CAST(COUNT(1) AS BIGINT) AS n, MAX(z) AS z_max
        FROM points GROUP BY 1, 2, 3, 4 ORDER BY tx, ty, px, py""",
)
def q_pc_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pointcloud_tile_raster(points_df(spark))
