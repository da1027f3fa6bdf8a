"""XYZ raster tile rendering — real 256×256 web tiles from a
georeferenced pixel table (reference: gdaltiler.cpp GDALTiler::tile,
tiler_test.cpp; tile math already gated by ``webmercator_tiles_z12``).

The reference renders a tile by intersecting the WebMercator tile
bounds with the raster's affine geotransform (geoQuery,
gdaltiler.cpp:236-320), resampling the window to the tile size, and
writing bands + an alpha band that is 0 wherever the raster has no
data (out of bounds or nodata).  Same here, relationally: the tile's
T×T pixel grid maps through the inverse geotransform to fractional
source coordinates, and the shared 4-corner bilinear blend
(``raster/region.py``) fetches + weights the source pixels.  A corner
outside the raster simply misses the equi-join and carries weight 0 —
partial-coverage tiles fade via renormalization exactly at the edge,
fully uncovered pixels go NULL → alpha 0, matching the reference's
blank-tile behaviour without any bounds special-casing.

Grayscale DEM-style rendering scales [vmin, vmax] linearly to u8 (the
tiler's byte-scaling for non-byte rasters); RGB imagery would pass its
three band columns through the same blend unchanged.

Scale: one broadcast T×T grid joined against a row/col-pruned pixel
scan — rendering any one tile from a 100 TB store touches only the
row-groups whose row/col min-max stats intersect the window; a z/x/y
batch of tiles is one union of grids, still shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dronedb_spark.raster.region import bilinear_blend
from dronedb_spark.suite import check

ORIGIN = 20037508.342789244  # WebMercator half-extent (GlobalMercator)
NODATA = -9999.0


def tile_bounds_3857(z: int, x: int, y: int) -> tuple[float, float, float, float]:
    """XYZ tile → (minx, miny, maxx, maxy) in EPSG:3857 meters
    (mercator.tileBounds, gdaltiler.cpp:236)."""
    span = (2.0 * ORIGIN) / (2 ** z)
    minx = -ORIGIN + x * span
    maxy = ORIGIN - y * span
    return (minx, maxy - span, minx + span, maxy)


def tile_grid(spark: SparkSession, gt: tuple[float, float, float, float],
              z: int, x: int, y: int, tile_size: int = 256) -> DataFrame:
    """The T×T target grid with fractional source pixel coords through
    the inverse north-up affine ``gt = (origin_x, px_w, origin_y,
    px_h)`` (px_h negative; rotation terms unsupported, like the
    tiler's geoQuery path)."""
    gt0, gt1, gt3, gt5 = gt
    minx, _, _, maxy = tile_bounds_3857(z, x, y)
    res = (2.0 * ORIGIN) / (2 ** z) / tile_size
    g = spark.range(tile_size * tile_size).select(
        (F.col("id") % tile_size).cast("int").alias("px"),
        (F.col("id") / tile_size).cast("int").alias("py"),
    )
    mx = F.lit(minx) + (F.col("px") + 0.5) * res
    my = F.lit(maxy) - (F.col("py") + 0.5) * res
    sx = (mx - gt0) / gt1 - 0.5
    sy = (my - gt3) / gt5 - 0.5
    x0 = F.floor(sx).cast("long")
    y0 = F.floor(sy).cast("long")
    return g.select(
        "px", "py",
        x0.alias("x0"), (x0 + 1).alias("x1"),
        y0.alias("y0"), (y0 + 1).alias("y1"),
        (sx - x0).alias("fx"), (sy - y0).alias("fy"),
    )


def render_tile_gray(pixels: DataFrame, gt: tuple[float, float, float, float],
                     z: int, x: int, y: int, vmin: float, vmax: float,
                     tile_size: int = 256) -> DataFrame:
    """→ (px, py, value, g, a): bilinear sample + linear u8 stretch,
    alpha 0 where the tile pixel has no raster coverage."""
    grid = tile_grid(pixels.sparkSession, gt, z, x, y, tile_size)
    sampled = bilinear_blend(pixels, ["value"], grid, NODATA)
    t = F.least(
        F.greatest((F.col("value") - vmin) / (vmax - vmin), F.lit(0.0)), F.lit(1.0)
    )
    return sampled.select(
        "px", "py", "value",
        F.when(F.col("value").isNull(), 0)
        .otherwise(F.floor(t * 255.0).cast("int")).alias("g"),
        F.when(F.col("value").isNull(), 0).otherwise(255).alias("a"),
    )


def render_tile_png(pixels: DataFrame, gt: tuple[float, float, float, float],
                    z: int, x: int, y: int, vmin: float, vmax: float,
                    tile_size: int = 256) -> bytes:
    """The binary tile: gray+alpha PNG via the repo encoder (the
    'png' CreateCopy branch, gdaltiler.cpp:357-380)."""
    import numpy as np

    from dronedb_spark.sources.png import encode_png

    rows = render_tile_gray(pixels, gt, z, x, y, vmin, vmax, tile_size).collect()
    arr = np.zeros((tile_size, tile_size, 2), dtype=np.uint8)
    for r in rows:
        arr[r["py"], r["px"]] = (r["g"], r["a"])
    return encode_png(arr)


# ------------------------------------------------------------------ check

# DEM top-left pinned to mercator (0, 0); pixel = 1/256 of the z=3 tile
# span, so the 128×128 DEM covers the top-left quarter of tile
# (3, 4, 4) — the check renders that tile at 64×64: covered quarter,
# nodata patch, edge renormalization, and transparent remainder all in
# one roster.
_TZ, _TX, _TY, _TS = 3, 4, 4, 64
_SPAN3 = (2.0 * ORIGIN) / 8.0
_GT = (0.0, _SPAN3 / 256.0, 0.0, -_SPAN3 / 256.0)


def _tile_oracle() -> str:
    from dronedb_spark.raster.synth import dem_sql

    res = repr((2.0 * ORIGIN) / (2 ** _TZ) / _TS)
    corners = {"00": ("y0", "x0"), "10": ("y0", "x1"),
               "01": ("y1", "x0"), "11": ("y1", "x1")}
    wexpr = {"00": "(1.0-fx)*(1.0-fy)", "10": "fx*(1.0-fy)",
             "01": "(1.0-fx)*fy", "11": "fx*fy"}
    valid = {c: f"(CASE WHEN v{c} IS NOT NULL AND v{c} <> -9999.0 THEN 1.0 ELSE 0.0 END)"
             for c in corners}
    wsum = (f"(({wexpr['00']}*{valid['00']} + {wexpr['10']}*{valid['10']})"
            f" + ({wexpr['01']}*{valid['01']} + {wexpr['11']}*{valid['11']}))")
    vsum = (f"(({wexpr['00']}*COALESCE(v00,0.0)*{valid['00']}"
            f" + {wexpr['10']}*COALESCE(v10,0.0)*{valid['10']})"
            f" + ({wexpr['01']}*COALESCE(v01,0.0)*{valid['01']}"
            f" + {wexpr['11']}*COALESCE(v11,0.0)*{valid['11']}))")
    joins = "\n".join(
        f"LEFT JOIN dem p{c} ON p{c}.row = g.{yc} AND p{c}.col = g.{xc}"
        for c, (yc, xc) in corners.items()
    )
    sel = ", ".join(f"p{c}.value AS v{c}" for c in corners)
    return f"""
        WITH dem AS ({dem_sql('duckdb')}),
        grid AS (
            SELECT CAST(id % {_TS} AS INT) AS px, CAST(id // {_TS} AS INT) AS py,
                   ({repr(tile_bounds_3857(_TZ, _TX, _TY)[0])}
                    + (CAST(id % {_TS} AS DOUBLE) + 0.5) * {res} - {_GT[0]!r}) / {_GT[1]!r} - 0.5 AS sx,
                   ({repr(tile_bounds_3857(_TZ, _TX, _TY)[3])}
                    - (CAST(id // {_TS} AS DOUBLE) + 0.5) * {res} - {_GT[2]!r}) / {_GT[3]!r} - 0.5 AS sy
            FROM (SELECT range AS id FROM range({_TS * _TS}))
        ),
        g2 AS (
            SELECT px, py,
                   CAST(FLOOR(sx) AS BIGINT) AS x0, CAST(FLOOR(sx) AS BIGINT) + 1 AS x1,
                   CAST(FLOOR(sy) AS BIGINT) AS y0, CAST(FLOOR(sy) AS BIGINT) + 1 AS y1,
                   sx - FLOOR(sx) AS fx, sy - FLOOR(sy) AS fy
            FROM grid
        ),
        joined AS (
            SELECT g.*, {sel}
            FROM g2 g
            {joins}
        ),
        sampled AS (
            SELECT px, py,
                   CASE WHEN {wsum} > 0.0 THEN {vsum} / {wsum} END AS value
            FROM joined
        )
        SELECT px, py, ROUND(value, 9) AS value,
               CAST(CASE WHEN value IS NULL THEN 0
                    ELSE CAST(FLOOR(LEAST(GREATEST((value - 190.0) / 120.0, 0.0), 1.0)
                                    * 255.0) AS INT) END AS INT) AS g,
               CAST(CASE WHEN value IS NULL THEN 0 ELSE 255 END AS INT) AS a
        FROM sampled ORDER BY py, px"""


@check("raster_tile_render", oracle=_tile_oracle())
def q_raster_tile_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GDALTiler::tile end to end: mercator tile bounds → inverse
    geotransform → bilinear blend → u8 gray + alpha.  The DEM covers
    the tile's top-left quarter, so one roster pins valid samples, the
    nodata patch, edge renormalization, AND the transparent remainder."""
    from dronedb_spark.raster.synth import dem_df

    df = render_tile_gray(dem_df(spark), _GT, _TZ, _TX, _TY, 190.0, 310.0, _TS)
    return df.select(
        "px", "py", F.round("value", 9).alias("value"), "g", "a"
    ).orderBy("py", "px")
