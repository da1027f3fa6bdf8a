"""Raster region rendering — bbox crop/resample + spectral-index RGBA
(reference: raster_region.cpp renderRasterRegion / renderRasterIndex,
raster_region_api_test.cpp).

The reference warps a GDAL dataset to the requested window & resolution
(gdalwarp ``-te … -ts W H -r bilinear``) and either exports the bands
(PNG with alpha, JPEG composited on white) or computes a spectral index
(NDVI/NDRE/NDWI/SAVI/EVI over the 1-based R,G,B,RE,NIR band convention,
raster_region.cpp:338-359) and colours it through a red→yellow→green
ramp with nodata rendered transparent (rampNdvi, :362-371).

Spark shape: the warp is RELATIONAL — the W×H target grid (tiny) maps
each pixel centre to fractional source coordinates, takes its four
neighbour pixels by four broadcast equi-joins against the pixels table,
and blends with bilinear weights.  Everything stays in JVM column
expressions; no UDF, no per-raster collect.  At 100 TB the pixels side
is the big table and the grid broadcast keeps the join shuffle-free;
the four joins share one scan under AQE reuse.

Nodata: weights renormalize over the VALID corners (GDAL's masked
bilinear behaviour); a sample with no valid corner is nodata → NULL →
transparent in the ramp.  The reference instead tests the warped value
per-pixel after the fact (raster_region.cpp:466-483); renormalizing is
the cleaner distributed statement of the same mask and agrees wherever
all four corners are valid.

Exactness: dyadic window/size ratios (e.g. 32×32 → 16×16) make every
bilinear weight a power of two, so Spark and the DuckDB oracle compute
bit-identical doubles regardless of expression order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dronedb_spark.raster.synth import ms_sql
from dronedb_spark.suite import check

NODATA = -9999.0

# index → (b1, b2, b3, kind, L); 1-based bands R=1 G=2 B=3 RE=4 NIR=5
# (resolveIndex, raster_region.cpp:349-359); our ms table columns are
# R, G, B, Re, N in that band order.
INDEXES: dict[str, tuple[str, str, str | None, int, float]] = {
    "NDVI": ("N", "R", None, 0, 0.0),
    "NDRE": ("N", "Re", None, 0, 0.0),
    "NDWI": ("G", "N", None, 0, 0.0),
    "SAVI": ("N", "R", None, 1, 0.5),
    "EVI": ("N", "R", "B", 2, 0.0),
}


def bilinear_blend(
    pixels: DataFrame,
    bands: list[str],
    grid: DataFrame,
    nodata: float = NODATA,
) -> DataFrame:
    """Core of the relational warp: ``grid`` carries (px, py, x0, x1,
    y0, y1, fx, fy); four broadcast equi-joins fetch the corner pixels
    and blend with weights renormalized over the VALID corners.  A
    corner that misses the table entirely (outside the raster) simply
    contributes weight 0 — so edge samples renormalize and fully
    outside samples go NULL, with no clamping logic anywhere."""
    src = pixels.select(
        F.col("row").alias("prow"), F.col("col").alias("pcol"),
        *[F.col(b).alias(f"v_{b}") for b in bands],
    )
    out = F.broadcast(grid)
    for corner, (yc, xc) in {"00": ("y0", "x0"), "10": ("y0", "x1"),
                             "01": ("y1", "x0"), "11": ("y1", "x1")}.items():
        sel = src.select(
            F.col("prow").alias(f"r{corner}"), F.col("pcol").alias(f"c{corner}"),
            *[F.col(f"v_{b}").alias(f"{b}_{corner}") for b in bands],
        )
        out = out.join(
            sel,
            (F.col(yc) == F.col(f"r{corner}")) & (F.col(xc) == F.col(f"c{corner}")),
            "left",
        )

    def w(corner: str) -> Column:
        fx, fy = F.col("fx"), F.col("fy")
        return {
            "00": (1.0 - fx) * (1.0 - fy), "10": fx * (1.0 - fy),
            "01": (1.0 - fx) * fy, "11": fx * fy,
        }[corner]

    cols = []
    for b in bands:
        def term(corner: str) -> tuple[Column, Column]:
            v = F.col(f"{b}_{corner}")
            ok = v.isNotNull() & (v != nodata)
            valid = F.when(ok, F.lit(1.0)).otherwise(F.lit(0.0))
            # gate the VALUE conditionally rather than multiplying by the
            # flag: an infinite nodata sentinel would otherwise inject
            # inf*0 = NaN into the sum; for finite values the two forms
            # are bit-identical (×1.0 exact, ×0 = 0)
            return w(corner) * valid, w(corner) * F.when(ok, v).otherwise(F.lit(0.0))

        ws, vs = zip(*(term(c) for c in ("00", "10", "01", "11")))
        wsum = (ws[0] + ws[1]) + (ws[2] + ws[3])  # fixed association order
        vsum = (vs[0] + vs[1]) + (vs[2] + vs[3])
        cols.append(F.when(wsum > 0.0, vsum / wsum).alias(b))
    return out.select("px", "py", *cols)


def bilinear_region(
    pixels: DataFrame,
    bands: list[str],
    r0: int, r1: int, c0: int, c1: int,
    width: int, height: int,
    nodata: float = NODATA,
) -> DataFrame:
    """Crop the inclusive pixel window [r0..r1]×[c0..c1] and resample to
    ``width``×``height`` with bilinear blending (the gdalwarp call of
    raster_region.cpp:122-139 as four equi-joins).  → (px, py, <bands>),
    NULL where a band has no valid corner."""
    spark = pixels.sparkSession
    grid = spark.range(width * height).select(
        (F.col("id") % width).cast("int").alias("px"),
        (F.col("id") / width).cast("int").alias("py"),
    )
    sxf = F.lit(float(c0)) + (F.col("px") + 0.5) * float(c1 - c0 + 1) / width - 0.5
    syf = F.lit(float(r0)) + (F.col("py") + 0.5) * float(r1 - r0 + 1) / height - 0.5
    sx = F.least(F.greatest(sxf, F.lit(float(c0))), F.lit(float(c1)))
    sy = F.least(F.greatest(syf, F.lit(float(r0))), F.lit(float(r1)))
    x0 = F.floor(sx).cast("int")
    y0 = F.floor(sy).cast("int")
    grid = grid.select(
        "px", "py",
        x0.alias("x0"), y0.alias("y0"),
        F.least(x0 + 1, F.lit(c1)).alias("x1"),
        F.least(y0 + 1, F.lit(r1)).alias("y1"),
        (sx - x0).alias("fx"), (sy - y0).alias("fy"),
    )
    return bilinear_blend(pixels, bands, grid, nodata)


def _ramp(v: Column) -> list[Column]:
    """rampNdvi (raster_region.cpp:362-371): NULL → transparent black;
    else t=(v+1)/2 clamped, red→yellow→green, u8 truncation = FLOOR."""
    t = F.least(F.greatest((v + 1.0) * 0.5, F.lit(0.0)), F.lit(1.0))
    r = F.when(v.isNull(), 0).when(t < 0.5, 255).otherwise(
        F.floor((1.0 - t) * 2.0 * 255.0).cast("int"))
    g = F.when(v.isNull(), 0).when(t < 0.5, F.floor(t * 2.0 * 255.0).cast("int")).otherwise(255)
    b = F.lit(0)
    a = F.when(v.isNull(), 0).otherwise(255)
    return [r.alias("r"), g.alias("g"), b.alias("b"), a.alias("a")]


def index_value(df: DataFrame, index: str) -> Column:
    """Sampled band columns → index value (raster_region.cpp:486-502);
    zero denominators and nodata samples → NULL."""
    b1n, b2n, b3n, kind, L = INDEXES[index.upper()]
    v1, v2 = F.col(b1n), F.col(b2n)
    if kind == 0:
        return (v1 - v2) / F.nullif(v1 + v2, F.lit(0.0))
    if kind == 1:
        return (v1 - v2) / F.nullif(v1 + v2 + L, F.lit(0.0)) * (1.0 + L)
    v3 = F.col(b3n)
    return 2.5 * (v1 - v2) / F.nullif(v1 + 6.0 * v2 - 7.5 * v3 + 1.0, F.lit(0.0))


def render_index_region(
    pixels: DataFrame, index: str,
    r0: int, r1: int, c0: int, c1: int, width: int, height: int,
) -> DataFrame:
    """renderRasterIndex: warp window → index → ramp.  → (px, py,
    value, r, g, b, a) with value NULL (and a=0) where nodata."""
    b1n, b2n, b3n, _, _ = INDEXES[index.upper()]
    bands = [b for b in (b1n, b2n, b3n) if b]
    sampled = bilinear_region(pixels, bands, r0, r1, c0, c1, width, height)
    v = index_value(sampled, index)
    return sampled.select("px", "py", v.alias("value"), *_ramp(v))


def composite_white(rgba: DataFrame) -> DataFrame:
    """JPEG-path compositing (raster_region.cpp:544-557): RGBA over an
    opaque white background, truncating u8 cast."""
    af = F.col("a") / 255.0

    def comp(c: str) -> Column:
        return F.floor(
            F.least(F.greatest(af * F.col(c) + (1.0 - af) * 255.0, F.lit(0.0)),
                    F.lit(255.0))
        ).cast("int").alias(c)

    return rgba.select(
        *[c for c in rgba.columns if c not in ("r", "g", "b", "a")],
        comp("r"), comp("g"), comp("b"),
    )


def render_index_png(
    pixels: DataFrame, index: str,
    r0: int, r1: int, c0: int, c1: int, width: int, height: int,
) -> bytes:
    """The real binary artifact: RGBA rows → PNG bytes via the repo's
    encoder (the 'image/png' branch of resolveFormat).  Collects W×H
    RGBA rows — the requested render size, not the raster size."""
    import numpy as np

    from dronedb_spark.sources.png import encode_png

    rows = (
        render_index_region(pixels, index, r0, r1, c0, c1, width, height)
        .orderBy("py", "px")
        .collect()
    )
    arr = np.zeros((height, width, 4), dtype=np.uint8)
    for row in rows:
        arr[row["py"], row["px"]] = (row["r"], row["g"], row["b"], row["a"])
    return encode_png(arr)


# ------------------------------------------------------------------ check

_RW = {"r0": 8, "r1": 39, "c0": 4, "c1": 35, "w": 16, "h": 16}  # dyadic 2×


def _region_oracle() -> str:
    """The same warp+index+ramp as one DuckDB statement over the shared
    synthetic MS raster — identical IEEE arithmetic (dyadic weights)."""
    r0, r1, c0, c1, w, h = (_RW[k] for k in ("r0", "r1", "c0", "c1", "w", "h"))
    return f"""
        WITH ms AS ({ms_sql('duckdb')}),
        grid AS (
            SELECT CAST(id % {w} AS INT) AS px, CAST(id // {w} AS INT) AS py,
                   LEAST(GREATEST({c0} + (CAST(id % {w} AS DOUBLE) + 0.5) * {(c1 - c0 + 1)}.0 / {w} - 0.5, {c0}.0), {c1}.0) AS sx,
                   LEAST(GREATEST({r0} + (CAST(id // {w} AS DOUBLE) + 0.5) * {(r1 - r0 + 1)}.0 / {h} - 0.5, {r0}.0), {r1}.0) AS sy
            FROM (SELECT range AS id FROM range({w * h}))
        ),
        g2 AS (
            SELECT px, py,
                   CAST(FLOOR(sx) AS INT) AS x0, CAST(FLOOR(sy) AS INT) AS y0,
                   LEAST(CAST(FLOOR(sx) AS INT) + 1, {c1}) AS x1,
                   LEAST(CAST(FLOOR(sy) AS INT) + 1, {r1}) AS y1,
                   sx - FLOOR(sx) AS fx, sy - FLOOR(sy) AS fy
            FROM grid
        ),
        joined AS (
            SELECT g2.*,
                   p00.N AS n00, p00.R AS rr00, p10.N AS n10, p10.R AS rr10,
                   p01.N AS n01, p01.R AS rr01, p11.N AS n11, p11.R AS rr11
            FROM g2
            LEFT JOIN ms p00 ON p00.row = g2.y0 AND p00.col = g2.x0
            LEFT JOIN ms p10 ON p10.row = g2.y0 AND p10.col = g2.x1
            LEFT JOIN ms p01 ON p01.row = g2.y1 AND p01.col = g2.x0
            LEFT JOIN ms p11 ON p11.row = g2.y1 AND p11.col = g2.x1
        ),
        sampled AS (
            SELECT px, py,
                   CASE WHEN (((1.0-fx)*(1.0-fy)*(CASE WHEN n00 IS NOT NULL AND n00 <> -9999.0 THEN 1.0 ELSE 0.0 END)
                             + fx*(1.0-fy)*(CASE WHEN n10 IS NOT NULL AND n10 <> -9999.0 THEN 1.0 ELSE 0.0 END))
                             + ((1.0-fx)*fy*(CASE WHEN n01 IS NOT NULL AND n01 <> -9999.0 THEN 1.0 ELSE 0.0 END)
                             + fx*fy*(CASE WHEN n11 IS NOT NULL AND n11 <> -9999.0 THEN 1.0 ELSE 0.0 END))) > 0.0
                   THEN (((1.0-fx)*(1.0-fy)*COALESCE(n00,0.0)*(CASE WHEN n00 IS NOT NULL AND n00 <> -9999.0 THEN 1.0 ELSE 0.0 END)
                        + fx*(1.0-fy)*COALESCE(n10,0.0)*(CASE WHEN n10 IS NOT NULL AND n10 <> -9999.0 THEN 1.0 ELSE 0.0 END))
                        + ((1.0-fx)*fy*COALESCE(n01,0.0)*(CASE WHEN n01 IS NOT NULL AND n01 <> -9999.0 THEN 1.0 ELSE 0.0 END)
                        + fx*fy*COALESCE(n11,0.0)*(CASE WHEN n11 IS NOT NULL AND n11 <> -9999.0 THEN 1.0 ELSE 0.0 END)))
                        / (((1.0-fx)*(1.0-fy)*(CASE WHEN n00 IS NOT NULL AND n00 <> -9999.0 THEN 1.0 ELSE 0.0 END)
                             + fx*(1.0-fy)*(CASE WHEN n10 IS NOT NULL AND n10 <> -9999.0 THEN 1.0 ELSE 0.0 END))
                             + ((1.0-fx)*fy*(CASE WHEN n01 IS NOT NULL AND n01 <> -9999.0 THEN 1.0 ELSE 0.0 END)
                             + fx*fy*(CASE WHEN n11 IS NOT NULL AND n11 <> -9999.0 THEN 1.0 ELSE 0.0 END)))
                   END AS nv,
                   CASE WHEN (((1.0-fx)*(1.0-fy)*(CASE WHEN rr00 IS NOT NULL AND rr00 <> -9999.0 THEN 1.0 ELSE 0.0 END)
                             + fx*(1.0-fy)*(CASE WHEN rr10 IS NOT NULL AND rr10 <> -9999.0 THEN 1.0 ELSE 0.0 END))
                             + ((1.0-fx)*fy*(CASE WHEN rr01 IS NOT NULL AND rr01 <> -9999.0 THEN 1.0 ELSE 0.0 END)
                             + fx*fy*(CASE WHEN rr11 IS NOT NULL AND rr11 <> -9999.0 THEN 1.0 ELSE 0.0 END))) > 0.0
                   THEN (((1.0-fx)*(1.0-fy)*COALESCE(rr00,0.0)*(CASE WHEN rr00 IS NOT NULL AND rr00 <> -9999.0 THEN 1.0 ELSE 0.0 END)
                        + fx*(1.0-fy)*COALESCE(rr10,0.0)*(CASE WHEN rr10 IS NOT NULL AND rr10 <> -9999.0 THEN 1.0 ELSE 0.0 END))
                        + ((1.0-fx)*fy*COALESCE(rr01,0.0)*(CASE WHEN rr01 IS NOT NULL AND rr01 <> -9999.0 THEN 1.0 ELSE 0.0 END)
                        + fx*fy*COALESCE(rr11,0.0)*(CASE WHEN rr11 IS NOT NULL AND rr11 <> -9999.0 THEN 1.0 ELSE 0.0 END)))
                        / (((1.0-fx)*(1.0-fy)*(CASE WHEN rr00 IS NOT NULL AND rr00 <> -9999.0 THEN 1.0 ELSE 0.0 END)
                             + fx*(1.0-fy)*(CASE WHEN rr10 IS NOT NULL AND rr10 <> -9999.0 THEN 1.0 ELSE 0.0 END))
                             + ((1.0-fx)*fy*(CASE WHEN rr01 IS NOT NULL AND rr01 <> -9999.0 THEN 1.0 ELSE 0.0 END)
                             + fx*fy*(CASE WHEN rr11 IS NOT NULL AND rr11 <> -9999.0 THEN 1.0 ELSE 0.0 END)))
                   END AS rv
            FROM joined
        ),
        idx AS (
            SELECT px, py, (nv - rv) / NULLIF(nv + rv, 0.0) AS v FROM sampled
        ),
        ramp AS (
            SELECT px, py, ROUND(v, 9) AS value,
                   LEAST(GREATEST((v + 1.0) * 0.5, 0.0), 1.0) AS t
            FROM idx
        )
        SELECT px, py, value,
               CAST(CASE WHEN value IS NULL THEN 0 WHEN t < 0.5 THEN 255
                    ELSE CAST(FLOOR((1.0 - t) * 2.0 * 255.0) AS INT) END AS INT) AS r,
               CAST(CASE WHEN value IS NULL THEN 0 WHEN t < 0.5
                    THEN CAST(FLOOR(t * 2.0 * 255.0) AS INT) ELSE 255 END AS INT) AS g,
               CAST(0 AS INT) AS b,
               CAST(CASE WHEN value IS NULL THEN 0 ELSE 255 END AS INT) AS a
        FROM ramp
        ORDER BY py, px"""


@check("render_index_region", oracle=_region_oracle())
def q_render_index_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """renderRasterIndex end to end (raster_region.cpp:373-560): bbox
    window bilinear warp (dyadic 32×32→16×16 so weights are exact),
    NDVI over the NIR/R bands with nodata-renormalizing blend, and the
    red→yellow→green u8 ramp — value + all four channels pinned."""
    from dronedb_spark.raster.synth import ms_df

    df = render_index_region(
        ms_df(spark), "NDVI",
        _RW["r0"], _RW["r1"], _RW["c0"], _RW["c1"], _RW["w"], _RW["h"],
    )
    return df.select(
        "px", "py", F.round("value", 9).alias("value"), "r", "g", "b", "a"
    ).orderBy("py", "px")
