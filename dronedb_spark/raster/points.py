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


# ------------------------------------------------- point-splat tile render

# drawCircle's disc (pctiler.cpp:327-351): offsets tx, ty ∈ [-r, r-1]
# with tx²+ty²≤r² — note the ASYMMETRIC range (the +r edge is excluded
# by `i < 4r²`), reproduced bug-for-bug.
def _disc_offsets(radius: int) -> list[tuple[int, int]]:
    rr = 2 * radius
    out = []
    for i in range(4 * radius * radius):
        tx, ty = (i % rr) - radius, (i // rr) - radius
        if tx * tx + ty * ty <= radius * radius:
            out.append((tx, ty))
    return out


def _zpack(zkey: str, pid: str, r: str, g: str, b: str, st: str = "STRING") -> str:
    """Fixed-width '<zkey:6><pid:8><r:3><g:3><b:3>' — MAX of this string
    is the (z, pid)-max winner carrying its colour, identical in Spark
    and DuckDB (the ivf.py packed-argmin discipline).  ``st`` is the
    dialect's string type name (Spark STRING, DuckDB VARCHAR)."""
    return (
        f"lpad(CAST({zkey} AS {st}), 6, '0') || lpad(CAST({pid} AS {st}), 8, '0')"
        f" || lpad(CAST({r} AS {st}), 3, '0') || lpad(CAST({g} AS {st}), 3, '0')"
        f" || lpad(CAST({b} AS {st}), 3, '0')"
    )


def splat_tile(
    points: DataFrame,
    minx: float, miny: float, maxx: float, maxy: float,
    tile_size: int = 256, radius: int = 2,
) -> DataFrame:
    """PointCloudTiler::tile's splat pass (pctiler.cpp:183-268) as two
    aggregations: (1) z-buffer at each point's centre pixel — winner =
    max (z, pid); (2) explode each winner's disc offsets and take the
    per-pixel max again.  The reference resolves overlapping DISCS by
    draw order (PDAL read order); the relational statement replaces
    that with the deterministic (z, pid) max — identical wherever discs
    don't overlap, order-free where they do.

    The centre mapping reproduces the reference's formulas exactly,
    including the x-side `- pointRadiusMeters` (pctiler.cpp:234 — the
    y-side uses `+`); std::round becomes floor(v + 0.5), identical for
    the non-negative in-bounds range.  16-bit colours collapse to 8-bit
    via >> 8 only when ANY point in view exceeds 255 (the normalize
    sweep, pctiler.cpp:209-223).

    → sparse (px, py, r, g, b) — unhit pixels are implicit alpha 0."""
    span_x, span_y = maxx - minx, maxy - miny
    r_m = radius * span_x / tile_size  # tileResolution * radius
    padded = tile_size + 2 * radius
    scale_w = padded / (span_x + 2.0 * r_m)
    scale_h = padded / (span_y + 2.0 * r_m)

    norm = points.agg(
        (F.greatest(F.max("red"), F.max("green"), F.max("blue")) > 255).alias("_norm")
    )
    p = points.crossJoin(F.broadcast(norm)).select(
        "pid", "z",
        F.expr(f"CAST(floor((x - {minx!r} - {r_m!r}) * {scale_w!r} + 0.5) AS INT)")
        .alias("cpx"),
        F.expr(f"CAST({padded} - 1 - floor((y - {miny!r} + {r_m!r}) * {scale_h!r} + 0.5) AS INT)")
        .alias("cpy"),
        F.expr("CASE WHEN _norm THEN CAST(floor(red / 256.0) AS INT) % 256 ELSE CAST(red AS INT) % 256 END").alias("r8"),
        F.expr("CASE WHEN _norm THEN CAST(floor(green / 256.0) AS INT) % 256 ELSE CAST(green AS INT) % 256 END").alias("g8"),
        F.expr("CASE WHEN _norm THEN CAST(floor(blue / 256.0) AS INT) % 256 ELSE CAST(blue AS INT) % 256 END").alias("b8"),
    ).filter(
        (F.col("cpx") >= 0) & (F.col("cpx") < padded)
        & (F.col("cpy") >= 0) & (F.col("cpy") < padded)
    )
    packed = _zpack("CAST(floor(z * 100.0 + 0.5) AS BIGINT)", "pid", "r8", "g8", "b8", "STRING")
    winners = p.groupBy("cpx", "cpy").agg(F.expr(f"MAX({packed})").alias("w"))

    offs = points.sparkSession.createDataFrame(
        _disc_offsets(radius), "tx int, ty int"
    )
    splat = winners.crossJoin(F.broadcast(offs)).select(
        (F.col("cpx") - radius + F.col("tx")).alias("px"),
        (F.col("cpy") - radius + F.col("ty")).alias("py"),
        "w",
    ).filter(
        (F.col("px") >= 0) & (F.col("px") < tile_size)
        & (F.col("py") >= 0) & (F.col("py") < tile_size)
    )
    win = F.max("w")
    return (
        splat.groupBy("px", "py")
        .agg(
            F.substring(win, 15, 3).cast("int").alias("r"),
            F.substring(win, 18, 3).cast("int").alias("g"),
            F.substring(win, 21, 3).cast("int").alias("b"),
        )
        .orderBy("py", "px")
    )


_SPLAT_COLORED = """
    SELECT pid, x, y, z,
           (pid * 53) % 60000 AS red,
           (pid * 101) % 60000 AS green,
           (pid * 197) % 60000 AS blue
    FROM points
"""


def _splat_oracle() -> str:
    radius, tile_size = 2, 64
    minx, miny, maxx, maxy = 0.0, 0.0, 250.0, 250.0
    r_m = radius * (maxx - minx) / tile_size
    padded = tile_size + 2 * radius
    scale_w = padded / (maxx - minx + 2.0 * r_m)
    offs = ", ".join(f"({tx}, {ty})" for tx, ty in _disc_offsets(radius))
    packed = _zpack("CAST(floor(z * 100.0 + 0.5) AS BIGINT)", "pid", "r8", "g8", "b8", "VARCHAR")
    return f"""
        WITH points AS ({points_sql('duckdb')}),
        colored AS ({_SPLAT_COLORED}),
        nrm AS (SELECT GREATEST(MAX(red), MAX(green), MAX(blue)) > 255 AS _norm FROM colored),
        centers AS (
            SELECT pid, z,
                   CAST(floor((x - {minx!r} - {r_m!r}) * {scale_w!r} + 0.5) AS INT) AS cpx,
                   CAST({padded} - 1 - floor((y - {miny!r} + {r_m!r}) * {scale_w!r} + 0.5) AS INT) AS cpy,
                   CASE WHEN _norm THEN CAST(floor(red / 256.0) AS INT) % 256 ELSE CAST(red AS INT) % 256 END AS r8,
                   CASE WHEN _norm THEN CAST(floor(green / 256.0) AS INT) % 256 ELSE CAST(green AS INT) % 256 END AS g8,
                   CASE WHEN _norm THEN CAST(floor(blue / 256.0) AS INT) % 256 ELSE CAST(blue AS INT) % 256 END AS b8
            FROM colored CROSS JOIN nrm
        ),
        winners AS (
            SELECT cpx, cpy, MAX({packed}) AS w
            FROM centers
            WHERE cpx >= 0 AND cpx < {padded} AND cpy >= 0 AND cpy < {padded}
            GROUP BY cpx, cpy
        ),
        offs(tx, ty) AS (VALUES {offs}),
        splat AS (
            SELECT cpx - {radius} + tx AS px, cpy - {radius} + ty AS py, w
            FROM winners CROSS JOIN offs
            WHERE cpx - {radius} + tx >= 0 AND cpx - {radius} + tx < {tile_size}
              AND cpy - {radius} + ty >= 0 AND cpy - {radius} + ty < {tile_size}
        )
        SELECT px, py,
               CAST(substr(MAX(w), 15, 3) AS INT) AS r,
               CAST(substr(MAX(w), 18, 3) AS INT) AS g,
               CAST(substr(MAX(w), 21, 3) AS INT) AS b
        FROM splat GROUP BY px, py ORDER BY py, px"""


@check("pointcloud_splat_tile", oracle=_splat_oracle())
def q_splat_tile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PointCloudTiler::tile splat render over the [0,250)² quarter of
    the synthetic cloud at 64px/r=2: centre mapping bug-for-bug (x-side
    −rMeters), centre z-buffer, disc explode, per-pixel (z,pid)-max
    winner, and the 16-bit→8-bit colour normalize sweep (the synthetic
    colours exceed 255, so the >>8 branch is the one exercised)."""
    pts = spark.sql(points_sql("spark")).createOrReplaceTempView("points")
    colored = spark.sql(_SPLAT_COLORED)
    return splat_tile(colored, 0.0, 0.0, 250.0, 250.0, tile_size=64, radius=2)
